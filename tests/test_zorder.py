"""Pins for the Morton/z-order key and the z-ordered write layout."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from maap_data_pipelines_spark.functions.zorder import zorder_key
from maap_data_pipelines_spark.sinks import write_zordered


def _zkey(spark, a, b) -> int:
    return (
        spark.range(1)
        .select(zorder_key(F.lit(a), F.lit(b)).alias("z"))
        .collect()[0]
        .z
    )


def test_zorder_key_known_values(spark):
    # bit i of a -> position 2i; bit i of b -> 2i+1
    assert _zkey(spark, 0, 0) == 0
    assert _zkey(spark, 1, 0) == 1
    assert _zkey(spark, 0, 1) == 2
    assert _zkey(spark, 3, 0) == 0b0101
    assert _zkey(spark, 0, 3) == 0b1010
    assert _zkey(spark, 0xFFFF, 0xFFFF) == (1 << 32) - 1


def test_zorder_key_quadrant_prefix(spark):
    # the top interleaved bits form the quadtree cell: all (a, b) in the
    # same 2^8-aligned block share the same key >> 16
    k1 = _zkey(spark, 0x1200, 0x3400)
    k2 = _zkey(spark, 0x12FF, 0x34FF)
    assert k1 >> 16 == k2 >> 16


def test_write_zordered_bounds_both_dims(spark, tmp_path):
    # 64x64 grid; z-ordered files must have bounded spans in BOTH dims,
    # while a y-sorted layout leaves x spanning the full width per file.
    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    zpath = str(tmp_path / "zord")
    write_zordered(grid, zpath, "x", "y", n_files=16)

    def spans(path):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .collect()
        )
        assert len(per_file) > 4
        return (
            max(r.sx for r in per_file),
            max(r.sy for r in per_file),
        )

    sx, sy = spans(zpath)
    # 16 files over a 64x64 z-curve -> each file is ~a 16x16-ish region
    assert sx <= n / 2 and sy <= n / 2, (sx, sy)

    ypath = str(tmp_path / "ysort")
    grid.repartitionByRange(16, "y").sortWithinPartitions("y").write.mode(
        "overwrite"
    ).parquet(ypath)
    sx_lin, _ = spans(ypath)
    assert sx_lin == n - 1  # single-column sort: x unbounded per file
