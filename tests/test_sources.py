"""CSV inventory + JSON granule source readers."""

from __future__ import annotations

import json


def test_read_csv_inventory(spark, tmp_path):
    from maap_data_pipelines_spark.sources.formats import read_csv_inventory

    p = tmp_path / "inv.csv"
    p.write_text(
        "s3_path,metadata_path,collection\n"
        "s3://b/x/granule_2020-01-01.tif,s3://b/x/granule_2020-01-01.xml,c1\n"
        "s3://b/y/other_20210203.nc,,c1\n"
        "s3://b/z/skipme.txt,,c1\n"
    )
    out = read_csv_inventory(
        spark, str(p), filename_regex=r".*\.(tif|nc)$"
    ).collect()
    by_url = {r.remote_fileurl: r for r in out}
    assert len(by_url) == 2  # .txt filtered out
    assert by_url["s3://b/x/granule_2020-01-01.tif"].product_id == "granule_2020-01-01"
    assert by_url["s3://b/y/other_20210203.nc"].metadata_fileurl is None


def test_read_json_granules(spark, tmp_path):
    from maap_data_pipelines_spark.sources.formats import read_json_granules

    p = tmp_path / "granules.json"
    rows = [
        {
            "id": "G1",
            "links": [
                {"rel": "http://esipfed.org/ns/fedsearch/1.1/metadata#", "href": "s3://b/a.xml"},
                {"rel": "http://esipfed.org/ns/fedsearch/1.1/s3#", "href": "s3://b/a.tif"},
            ],
        },
        {"id": "G2", "links": [{"rel": "http://x/s3#", "href": "s3://b/b.tif"}]},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    out = {r.granule_id: r for r in read_json_granules(spark, str(p)).collect()}
    assert out["G1"].data_url == "s3://b/a.tif"
    assert out["G1"].n_links == 2
    assert out["G2"].data_url == "s3://b/b.tif"


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """A lake ingests files whose schema grew a column; mergeSchema unifies.

    Old files surface the new column as NULL; at 100 TB the footer merge
    is the only extra cost (and can be pinned off once the catalog owns
    the canonical schema).
    """
    from pyspark.sql import functions as F

    base = str(tmp_path / "evolving")
    spark.range(3).select(
        F.col("id").alias("asset_id"), F.lit("c0").alias("collection")
    ).write.parquet(base + "/day=1")
    spark.range(3, 5).select(
        F.col("id").alias("asset_id"),
        F.lit("c1").alias("collection"),
        F.lit("tif").alias("ext"),  # new column added later
    ).write.parquet(base + "/day=2")

    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) >= {"asset_id", "collection", "ext"}
    rows = {r.asset_id: r.ext for r in df.collect()}
    assert rows[0] is None and rows[4] == "tif"
    assert df.count() == 5


def test_dir_discovery_datasource(spark, tmp_path):
    """Spark 4 Python DataSource: per-prefix partitions + filter-at-source."""
    from maap_data_pipelines_spark.sources.pyds import register

    root = tmp_path / "bucket"
    (root / "collA").mkdir(parents=True)
    (root / "collB" / "nested").mkdir(parents=True)
    (root / "collA" / "scene_20200101.tif").write_bytes(b"x" * 10)
    (root / "collA" / "scene_20200102.tif").write_bytes(b"y" * 20)
    (root / "collA" / "readme.txt").write_bytes(b"no")
    (root / "collB" / "nested" / "scene_20210301.tif").write_bytes(b"z" * 30)
    (root / "top_20220101.tif").write_bytes(b"t" * 5)

    register(spark)
    df = (
        spark.read.format("dir_discovery")
        .option("path", str(root))
        .option("filename_regex", r".*\.tif$")
        .load()
    )
    rows = {r.key: r for r in df.collect()}
    assert set(rows) == {
        "collA/scene_20200101.tif",
        "collA/scene_20200102.tif",
        "collB/nested/scene_20210301.tif",
        "top_20220101.tif",
    }  # regex filtered readme.txt at the source
    assert rows["collA/scene_20200102.tif"].size_bytes == 20
    assert all(r.mtime_us > 0 for r in rows.values())
    # one partition per top-level prefix + one for root files
    assert df.rdd.getNumPartitions() == 3


def test_read_binary_assets_glob_and_content(spark, tmp_path):
    from maap_data_pipelines_spark.sources.formats import read_binary_assets

    d = tmp_path / "assets"
    d.mkdir()
    (d / "a.bin").write_bytes(b"\x00\x01payload")
    (d / "b.bin").write_bytes(b"\xff" * 32)
    (d / "skip.txt").write_bytes(b"no")
    rows = {r.key.rsplit("/", 1)[-1]: r for r in read_binary_assets(
        spark, str(d), glob="*.bin"
    ).collect()}
    assert set(rows) == {"a.bin", "b.bin"}  # glob pruned at listing time
    assert bytes(rows["a.bin"].content) == b"\x00\x01payload"
    assert rows["b.bin"].size_bytes == 32
    assert all(r.mtime_us > 0 for r in rows.values())


def test_orc_round_trip_preserves_schema(spark, tmp_path):
    """Format breadth: ORC write/read round-trips types and values."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("k"), F.col("id")).alias("name"),
    )
    out = str(tmp_path / "orc_rt")
    df.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    # names+types round-trip (nullability legitimately widens on read)
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in df.schema
    ]
    assert sorted(r.v for r in back.collect()) == [2 * i for i in range(100)]


def test_read_json_quarantined_splits_good_and_bad(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from maap_data_pipelines_spark.sources.formats import read_json_quarantined

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"id": "g1", "size": 10}\n'
        '{"id": "g2", "size": 20}\n'
        "{not json at all\n"
        '{"id": "g3", "size": }\n'
    )
    schema = StructType(
        [StructField("id", StringType()), StructField("size", LongType())]
    )
    # default return is the original 2-tuple API
    good2, bad2 = read_json_quarantined(spark, str(p), schema)
    assert {r.id: r.size for r in good2.collect()} == {"g1": 10, "g2": 20}
    good, bad, source = read_json_quarantined(
        spark, str(p), schema, return_source=True
    )
    got = {r.id: r.size for r in good.collect()}
    assert got == {"g1": 10, "g2": 20}
    raws = [r.raw for r in bad.collect()]
    assert len(raws) == 2
    # quarantine preserves the raw line for replay after a parser fix
    assert any("not json" in r for r in raws)
    # schema of good side is exactly the declared schema (no corrupt col)
    assert [f.name for f in good.schema.fields] == ["id", "size"]
    # caller owns the cache lifetime: the returned parent is the cached
    # handle, and unpersisting it releases the only storage this reader
    # created (no session-lifetime leak across repeated calls)
    assert source.storageLevel.useMemory
    source.unpersist()
    assert not source.storageLevel.useMemory


def test_read_xml_metadata(spark, tmp_path):
    """Spark 4 native XML: one row per rowTag element, explicit schema
    single-pass read, attributes under the `_` prefix."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from maap_data_pipelines_spark.sources.formats import read_xml_metadata

    p = tmp_path / "meta"
    p.mkdir()
    (p / "granules.xml").write_text(
        "<granules>"
        "<granule status=\"ok\"><id>7</id><name>n7</name><cloud>12.5</cloud></granule>"
        "<granule status=\"bad\"><id>8</id><name>n8</name><cloud>93.0</cloud></granule>"
        "</granules>"
    )
    schema = StructType(
        [
            StructField("_status", StringType()),
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("cloud", DoubleType()),
        ]
    )
    df = read_xml_metadata(spark, str(p), "granule", schema)
    rows = {r.id: (r.name, r.cloud, r._status) for r in df.collect()}
    assert rows == {7: ("n7", 12.5, "ok"), 8: ("n8", 93.0, "bad")}
    # projection/filter push into the scan like any other source
    assert df.filter("cloud < 50").count() == 1


def test_read_tar_corpus_roundtrip_and_quarantine(spark, tmp_path):
    """Archive ingestion: plain tar AND tar.gz members round-trip with
    exact names/sizes/text; directories skipped; an oversized member is
    size-gated (ok=false, text NULL) without failing its archive; a
    corrupt blob yields one quarantine row instead of a task failure;
    non-UTF8 decodes lossily with the err flag."""
    import io
    import tarfile

    from maap_data_pipelines_spark.sources.formats import read_tar_corpus

    def make_tar(path, members, gz=False):
        mode = "w:gz" if gz else "w"
        with tarfile.open(path, mode) as tf:
            dirinfo = tarfile.TarInfo("docs/")  # dir entry: skipped
            dirinfo.type = tarfile.DIRTYPE
            tf.addfile(dirinfo)
            for name, payload in members:
                info = tarfile.TarInfo(name)
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))

    d = tmp_path / "archives"
    d.mkdir()
    make_tar(d / "a.tar", [
        ("docs/one.txt", b"hello world"),
        ("docs/two.txt", b"second file"),
        ("docs/big.bin", b"x" * 4096),
        ("docs/latin.txt", b"caf\xe9"),  # invalid utf-8
    ])
    make_tar(d / "b.tar.gz", [("z.txt", b"gzipped member")], gz=True)
    (d / "corrupt.tar").write_bytes(b"definitely not a tar archive")
    # corrupt DEFLATE body under a valid gzip header: tarfile's gzip
    # reader raises zlib.error (not TarError/OSError) mid-read — must
    # quarantine, not fail the task (ADVICE r10)
    good_gz = io.BytesIO()
    with tarfile.open(fileobj=good_gz, mode="w:gz") as tf:
        info = tarfile.TarInfo("deep.txt")
        payload = b"y" * 2048
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    gz_bytes = bytearray(good_gz.getvalue())
    for i in range(20, len(gz_bytes) - 8):
        gz_bytes[i] ^= 0xFF  # scramble the deflate stream, keep the header
    (d / "baddeflate.tar.gz").write_bytes(bytes(gz_bytes))

    rows = read_tar_corpus(
        spark, str(d), max_member_bytes=1024
    ).collect()
    by = {(r.archive.rsplit("/", 1)[-1], r.member): r for r in rows}

    one = by[("a.tar", "docs/one.txt")]
    assert one.ok and one.text == "hello world" and one.n_bytes == 11
    assert by[("a.tar", "docs/two.txt")].text == "second file"
    big = by[("a.tar", "docs/big.bin")]
    assert not big.ok and big.text is None and "max_member_bytes" in big.err
    latin = by[("a.tar", "docs/latin.txt")]
    assert latin.ok and latin.err == "lossy utf-8 decode" and "caf" in latin.text
    gz = by[("b.tar.gz", "z.txt")]
    assert gz.ok and gz.text == "gzipped member"
    quar = by[("corrupt.tar", None)]
    assert not quar.ok and quar.err
    bad_deflate = by[("baddeflate.tar.gz", None)]
    assert not bad_deflate.ok and bad_deflate.err
    # the dir entry produced no row
    assert ("a.tar", "docs/") not in by
    assert len(rows) == 7


def test_read_zip_corpus_roundtrip_and_quarantine(spark, tmp_path):
    """Zip ingestion under the tar reader's contract: members round-trip
    with exact names/sizes/text; directories skipped; oversized members
    size-gated from the HEADER (no inflation); corrupt archive AND
    corrupt-deflate member quarantine as single ok=false rows; non-UTF8
    decodes lossily with the err flag."""
    import zipfile

    from maap_data_pipelines_spark.sources.formats import read_zip_corpus

    d = tmp_path / "zips"
    d.mkdir()
    with zipfile.ZipFile(d / "a.zip", "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("docs/", "")  # dir entry: skipped
        zf.writestr("docs/one.txt", "hello world")
        zf.writestr("docs/big.bin", "x" * 4096)
        zf.writestr("docs/latin.txt", b"caf\xe9")
    with zipfile.ZipFile(d / "b.zip", "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("z.txt", "stored member")
    (d / "corrupt.zip").write_bytes(b"definitely not a zip archive")
    # valid central directory, scrambled deflate body: zipfile raises
    # BadZipFile (CRC) or zlib.error mid-read -> must quarantine
    good = bytearray((d / "a.zip").read_bytes())
    for i in range(60, 90):
        good[i] ^= 0xFF
    (d / "baddeflate.zip").write_bytes(bytes(good))

    rows = read_zip_corpus(spark, str(d), max_member_bytes=1024).collect()
    by = {(r.archive.rsplit("/", 1)[-1], r.member): r for r in rows}

    one = by[("a.zip", "docs/one.txt")]
    assert one.ok and one.text == "hello world" and one.n_bytes == 11
    big = by[("a.zip", "docs/big.bin")]
    assert not big.ok and big.text is None and "max_member_bytes" in big.err
    latin = by[("a.zip", "docs/latin.txt")]
    assert latin.ok and latin.err == "lossy utf-8 decode" and "caf" in latin.text
    assert by[("b.zip", "z.txt")].text == "stored member"
    quar = by[("corrupt.zip", None)]
    assert not quar.ok and quar.err
    bad = by[("baddeflate.zip", None)]
    assert not bad.ok and bad.err
    assert ("a.zip", "docs/") not in by


def test_fanout_base_count_invariant(spark, sf_dir):
    """ADVICE r11: corpus_rows over a fan_out frame must equal the plain
    count (COUNT is repartition-invariant; the gate reads the
    pre-repartition scan via _fanout_base), and the attribute is only a
    COUNT shortcut — transformations that drop it degrade to counting
    the transformed frame, never to a wrong value."""
    from pyspark.sql import functions as F

    from maap_data_pipelines_spark.functions.joins import corpus_rows
    from maap_data_pipelines_spark.sources.catalog import fan_out, read_table

    docs = read_table(spark, sf_dir, "documents")
    fanned = fan_out(docs)
    assert corpus_rows(fanned) == docs.count()
    # a transformation silently drops the attribute — value still right
    projected = fanned.select("doc_id")
    assert not hasattr(projected, "_fanout_base")
    assert corpus_rows(projected) == docs.count()
    # no-op path (already enough partitions): no attribute, same count
    wide = fanned.repartition(64)
    assert corpus_rows(fan_out(wide)) == docs.count()
