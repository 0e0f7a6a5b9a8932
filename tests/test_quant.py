"""Invariant pins for the SQ8 / binary-quantization ANN tier.

Oracle parity for every registered key runs in test_oracle_parity.py;
these tests pin the properties parity can't see: code-space bounds, the
measured recall ordering of the tiers, and that the re-rank pool recovers
what the bit sketch loses.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from maap_data_pipelines_spark.operators import quant
from maap_data_pipelines_spark.sources.catalog import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF_DIR, "embeddings")


def test_sq8_codes_bounded(spark, emb):
    codes = quant._dim_codes(quant._micro(emb), quant._SQ8_CODE)
    row = codes.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("n"),
    ).collect()[0]
    assert row.lo >= 0 and row.hi <= quant.SQ_LEVELS
    assert row.n == 64


def test_bq_words_pack_all_bits(spark, emb):
    words = quant._bq_words(emb)
    # both halves must be non-negative (packing never touches the sign bit)
    row = words.select(F.min("lo").alias("l"), F.min("hi").alias("h")).collect()[0]
    assert row.l >= 0 and row.h >= 0
    # hamming distance of a vector to itself is zero
    d = (
        words.alias("a")
        .join(words.alias("b"), F.col("a.vec_id") == F.col("b.vec_id"))
        .select(
            F.expr("bit_count(a.lo ^ b.lo) + bit_count(a.hi ^ b.hi)").alias("d")
        )
        .agg(F.max("d"))
        .collect()[0][0]
    )
    assert d == 0


def test_recall_ordering(spark, emb):
    """SQ8 (8 bits/dim, dequantized) must beat raw BQ (1 bit/dim), and the
    exact re-rank must recover recall over raw BQ."""
    sq8 = quant.ann_sq8_recall(emb).agg(F.avg("recall")).collect()[0][0]
    bq = quant.ann_bq_recall(emb).agg(F.avg("recall")).collect()[0][0]
    rr = quant.ann_bq_rerank_recall(emb).agg(F.avg("recall")).collect()[0][0]
    assert sq8 >= bq
    assert rr >= bq
    assert sq8 >= 0.8  # dequantized SQ8 is near-exact by construction


def test_topk_shapes(spark, emb):
    for fn in (quant.ann_sq8_topk, quant.ann_bq_topk, quant.ann_bq_rerank):
        df = fn(emb)
        per_q = df.groupBy("query_id").count().agg(F.max("count")).collect()[0][0]
        assert per_q <= quant.IVF_TOPK
