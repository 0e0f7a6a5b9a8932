"""VersionedTable: snapshot isolation, time travel, safe compaction."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from maap_data_pipelines_spark.table import VersionedTable


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    v0 = t.commit(spark.range(5).select(F.col("id")), mode="append")
    v1 = t.commit(spark.range(5, 8).select(F.col("id")), mode="append")
    assert (v0, v1) == (0, 1)
    assert t.read(spark).count() == 8
    assert t.read(spark, version=0).count() == 5  # time travel

    v2 = t.commit(spark.range(100, 102).select(F.col("id")), mode="overwrite")
    assert v2 == 2
    assert {r.id for r in t.read(spark).collect()} == {100, 101}
    # every older version still resolves
    assert t.read(spark, version=1).count() == 8


def test_compaction_under_a_live_reader(spark, tmp_path):
    """A reader's resolved snapshot survives a logical full rewrite."""
    t = VersionedTable(str(tmp_path / "t"))
    for lo in range(0, 12, 3):
        t.commit(spark.range(lo, lo + 3).select(F.col("id")))
    assert t.latest_version() == 3

    reader_df = t.read(spark, version=3)  # resolve BEFORE compaction
    v4 = t.compact(spark, n_files=1)
    assert v4 == 4
    # compaction rewrote layout, not content
    assert t.read(spark).count() == 12
    new_dirs = t._load(4)["dirs"]
    assert len(new_dirs) == 1
    # the pre-compaction reader still scans its own (old) files fine
    assert reader_df.count() == 12
    assert {r.id for r in reader_df.collect()} == set(range(12))
    # old version remains explicitly readable too
    assert t.read(spark, version=3).count() == 12


def test_manifest_is_the_only_publication_point(spark, tmp_path):
    """A data dir not yet in a manifest is invisible to readers."""
    t = VersionedTable(str(tmp_path / "t"))
    t.commit(spark.range(4).select(F.col("id")))
    # simulate a writer crash: data lands but no manifest publishes it
    orphan = os.path.join(t.base, "data", "c999999")
    spark.range(1000, 1010).write.parquet(orphan)
    assert t.read(spark).count() == 4  # orphan never observed

    with pytest.raises(ValueError, match="empty table"):
        VersionedTable(str(tmp_path / "empty")).read(spark)


def test_vacuum_removes_only_unreferenced(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    for lo in (0, 3, 6):
        t.commit(spark.range(lo, lo + 3).select(F.col("id")))
    t.compact(spark)  # v3 references only the compacted dir
    n_dirs_before = len(os.listdir(os.path.join(t.base, "data")))
    out = t.vacuum(keep_last=1)
    assert out["removed_versions"] == [0, 1, 2]
    # the three original commit dirs die; the compacted dir survives
    assert len(out["removed_dirs"]) == 3
    assert len(os.listdir(os.path.join(t.base, "data"))) == n_dirs_before - 3
    assert t.versions() == [3]
    assert t.read(spark).count() == 9

    # keep_last=2 retains a dir shared by a kept version
    t2 = VersionedTable(str(tmp_path / "t2"))
    t2.commit(spark.range(3).select(F.col("id")))
    t2.commit(spark.range(3, 6).select(F.col("id")))  # v1 references c0 AND c1
    out2 = t2.vacuum(keep_last=1)  # drops v0; c0 still referenced by v1
    assert out2["removed_versions"] == [0] and out2["removed_dirs"] == []
    assert t2.read(spark).count() == 6


def test_merge_upsert_and_delete(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    t.commit(base)
    updates = spark.createDataFrame(
        [(2, "B2", False), (4, "d", False), (3, None, True)],
        "k long, v string, _delete boolean",
    )
    v = t.merge_upsert(updates, key="k", delete_col="_delete")
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "B2", 4: "d"}  # 2 updated, 3 deleted, 4 added
    # prior snapshot untouched
    assert {r.k for r in t.read(spark, version=v - 1).collect()} == {1, 2, 3}

    # merge into an empty table = plain insert
    t2 = VersionedTable(str(tmp_path / "t2"))
    t2.merge_upsert(
        spark.createDataFrame([(9, "z")], "k long, v string"), key="k"
    )
    assert {r.k for r in t2.read(spark).collect()} == {9}


def test_changes_cdc_between_versions(spark, tmp_path):
    """Change feed: insert/delete/update pre+post images, Delta CDF shape."""
    t = VersionedTable(str(tmp_path / "t"))
    v0 = t.commit(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    )
    v1 = t.merge_upsert(
        spark.createDataFrame(
            [(2, "B2", False), (4, "d", False), (3, None, True)],
            "k long, v string, _delete boolean",
        ),
        key="k",
        delete_col="_delete",
    )
    ch = {
        (r.k, r._change_type): r.v
        for r in t.changes(spark, v0, v1, key="k").collect()
    }
    assert ch == {
        (4, "insert"): "d",
        (3, "delete"): "c",
        (2, "update_preimage"): "b",
        (2, "update_postimage"): "B2",
    }
    # unchanged key 1 emits nothing; self-diff is empty
    assert t.changes(spark, v1, v1, key="k").count() == 0


def test_merge_aggregate_incremental_rollup(spark, tmp_path):
    """Additive-rollup maintenance touches only the batch's keys."""
    t = VersionedTable(str(tmp_path / "r"))
    t.merge_aggregate(
        spark.createDataFrame(
            [("h1", 5, 100), ("h2", 3, 30)], "hour string, n long, amt long"
        ),
        keys=["hour"],
        sum_cols=["n", "amt"],
    )
    t.merge_aggregate(
        spark.createDataFrame(
            [("h2", 2, 20), ("h3", 1, 10)], "hour string, n long, amt long"
        ),
        keys=["hour"],
        sum_cols=["n", "amt"],
    )
    got = {r.hour: (r.n, r.amt) for r in t.read(spark).collect()}
    assert got == {"h1": (5, 100), "h2": (5, 50), "h3": (1, 10)}
    # the first snapshot is still readable pre-merge (time travel holds)
    assert {r.hour for r in t.read(spark, version=0).collect()} == {"h1", "h2"}


def test_stream_upsert_into_versioned_table(spark, tmp_path):
    """foreachBatch merge: continuous ingest publishes snapshots; replays safe."""
    from maap_data_pipelines_spark.sinks import start_stream_upsert

    land = tmp_path / "upsert_landing"
    land.mkdir()
    batch1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, v string, seq long"
    )
    batch1.coalesce(1).write.mode("append").parquet(str(land))

    t = VersionedTable(str(tmp_path / "vt"))
    stream = spark.readStream.schema(batch1.schema).parquet(str(land))
    q = start_stream_upsert(stream, t, key="k", checkpoint_dir=str(tmp_path / "cp"), order_col="seq")
    q.awaitTermination(120)
    assert {r.k: r.v for r in t.read(spark).collect()} == {1: "a", 2: "b"}

    # second wave: update k=2 twice in ONE batch (latest seq wins) + insert 3
    spark.createDataFrame(
        [(2, "B-old", 21), (2, "B-new", 22), (3, "c", 30)],
        "k long, v string, seq long",
    ).coalesce(1).write.mode("append").parquet(str(land))
    q2 = start_stream_upsert(stream, t, key="k", checkpoint_dir=str(tmp_path / "cp"), order_col="seq")
    q2.awaitTermination(120)
    got = {r.k: (r.v, r.seq) for r in t.read(spark).collect()}
    assert got == {1: ("a", 10), 2: ("B-new", 22), 3: ("c", 30)}

    # restart with the same checkpoint and no new files: no-op, same state
    v_before = t.latest_version()
    q3 = start_stream_upsert(stream, t, key="k", checkpoint_dir=str(tmp_path / "cp"), order_col="seq")
    q3.awaitTermination(120)
    assert t.latest_version() == v_before


def test_compact_preserves_meta(spark, tmp_path):
    """Compaction changes layout, not content — commit meta carries over."""
    t = VersionedTable(str(tmp_path / "m"))
    t.commit(spark.range(3), meta={"batch_id": 7})
    t.compact(spark)
    assert t.latest_meta() == {"batch_id": 7}
    assert t.read(spark).count() == 3


def test_commit_meta_none_deletes_key(spark, tmp_path):
    """A meta value of None is a tombstone: the only public-API way to
    clear a guard key (e.g. rollup_batch_id after a checkpoint rebuild)
    now that meta merges across commits."""
    t = VersionedTable(str(tmp_path / "tomb"))
    t.commit(spark.range(2), meta={"rollup_batch_id": 5, "owner": "mv"})
    t.commit(spark.range(2, 3), meta={"rollup_batch_id": None})
    assert t.latest_meta() == {"owner": "mv"}
    # older versions still show the key (manifests are immutable)
    assert t._load(0)["meta"]["rollup_batch_id"] == 5


def test_schema_evolution_read(spark, tmp_path):
    """Add-column evolution: a later commit may carry new columns; a
    merge_schema read NULL-fills them for older files, a version-pinned
    read keeps the old schema, and the default read is untouched."""
    from maap_data_pipelines_spark.table import VersionedTable

    t = VersionedTable(str(tmp_path / "evo"))
    t.commit(spark.range(3).selectExpr("id", "id * 2 AS a"))
    t.commit(
        spark.range(3, 5).selectExpr("id", "id * 2 AS a", "'x' AS b"),
        mode="append",
    )
    cur = t.read(spark, merge_schema=True)
    assert set(cur.columns) == {"id", "a", "b"}
    rows = {r.id: (r.a, r.b) for r in cur.collect()}
    assert rows[1] == (2, None)  # old file NULL-fills the grown column
    assert rows[4] == (8, "x")
    # old snapshot unaffected by evolution
    assert set(t.read(spark, version=0).columns) == {"id", "a"}


def test_reused_exchange_on_self_join(spark, sf_dir):
    """Plan pin: aggregating once and self-joining the result must REUSE
    the shuffle (ReusedExchange), not recompute the subtree — the
    multi-consumer cost model the engine's operators are designed
    around (see SURVEY perf lessons: minhash 4 scans -> 2)."""
    from pyspark.sql import functions as F

    from maap_data_pipelines_spark.sources.catalog import read_table

    agg = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    j = agg.alias("l").join(agg.alias("r"), "o_custkey")
    # a broadcast join rewrites one side's exchange into a
    # BroadcastExchange (no longer identical -> nothing to reuse), so
    # disable broadcast; and AQE performs the same reuse at runtime via
    # stage caching (invisible in the pre-execution plan string), so the
    # STATIC planner's ReuseExchange rule is what this pin can see
    prev_b = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_a = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_b)
        spark.conf.set("spark.sql.adaptive.enabled", prev_a)
    assert "ReusedExchange" in plan, plan[:1500]


def test_history_audit_log(spark, tmp_path):
    """history(): one row per retained version, added-dirs delta, meta
    as JSON; survives vacuum (drops pruned versions from the log)."""
    import json

    from maap_data_pipelines_spark.table import VersionedTable

    t = VersionedTable(str(tmp_path / "h"))
    t.commit(spark.range(3), meta={"who": "a"})
    t.commit(spark.range(3, 5), mode="append", meta={"who": "b"})
    t.commit(spark.range(9), mode="overwrite")
    h = {r.version: r for r in t.history(spark).collect()}
    assert sorted(h) == [0, 1, 2]
    assert h[0].n_dirs == 1 and h[0].n_added_dirs == 1
    assert h[1].n_dirs == 2 and h[1].n_added_dirs == 1  # append adds one
    assert h[2].n_dirs == 1 and h[2].n_added_dirs == 1  # overwrite: new dir
    assert json.loads(h[1].meta_json)["who"] == "b"  # meta merge carries
    t.vacuum(keep_last=1)
    assert [r.version for r in t.history(spark).collect()] == [2]
