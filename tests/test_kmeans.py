"""Behavioral pins for integer-exact k-means + SemDeDup on crafted vectors."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from maap_data_pipelines_spark.operators import kmeans

_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows], _SCHEMA
    )


def _blob(center: float, eps: float, dim: int = kmeans.EMBED_DIM):
    v = [center] * dim
    v[0] += eps
    return v


def test_kmeans_separates_two_blobs(spark):
    # seeds 0 (blob A) and 1 (blob B); members 2-4 near A, 5-7 near B
    rows = [
        (0, _blob(0.5, 0.0)),
        (1, _blob(-0.5, 0.0)),
        (2, _blob(0.5, 0.01)),
        (3, _blob(0.5, -0.01)),
        (4, _blob(0.5, 0.02)),
        (5, _blob(-0.5, 0.01)),
        (6, _blob(-0.5, -0.01)),
        (7, _blob(-0.5, 0.02)),
    ]
    af = {
        r.vec_id: r.cid
        for r in kmeans._final_assignment(_emb(spark, rows), k=2).collect()
    }
    assert {af[0], af[2], af[3], af[4]} == {af[0]}
    assert {af[1], af[5], af[6], af[7]} == {af[1]}
    assert af[0] != af[1]


def test_kmeans_summary_counts_and_nonneg_inertia(spark):
    rows = [(i, _blob(0.5 if i % 2 == 0 else -0.5, 0.001 * i)) for i in range(10)]
    out = kmeans.embedding_kmeans(_emb(spark, rows)).collect()
    assert sum(r.n_vecs for r in out) == 10
    assert all(r.inertia_k >= 0 for r in out)


def test_semantic_dedup_drops_higher_id_twin(spark):
    # vec 5 duplicates vec 2 (same direction, scaled) -> same cluster,
    # cosine 1.0 -> 5 dropped, 2 kept; distinct-direction rows all kept
    a = _blob(0.5, 0.0)
    b = _blob(-0.5, 0.0)
    dup = [x * 0.9 for x in a]
    rows = [(0, a), (1, b), (2, a), (3, b), (4, b), (5, dup)]
    out = {
        r.vec_id: (r.cluster_id, r.keep)
        for r in kmeans.semantic_dedup(_emb(spark, rows), k=2).collect()
    }
    assert len(out) == 6
    assert out[5][1] is False  # the higher-id twin drops
    assert out[0][1] is True
    # identical rows 0/2: min id survives, 2 drops too
    assert out[2][1] is False


def test_quantize_floor_semantics(spark):
    df = spark.createDataFrame(
        [(0, [0.5, -0.5] + [0.0] * 62, 0)], _SCHEMA
    ).select(kmeans.quantize_udf("embedding").alias("qv"))
    qv = df.collect()[0].qv
    assert qv[0] == 500_000
    assert qv[1] == -500_000
    assert all(x == 0 for x in qv[2:])


def test_cluster_topics_structure(spark, sf_dir):
    """Per-cluster keyword lists: contiguous ranks, the documented score
    formula, and cluster-discriminative IDF (a term in every cluster is
    down-weighted below a same-share exclusive term)."""
    from maap_data_pipelines_spark.operators.kmeans import TOPIC_TOPK, cluster_topics
    from maap_data_pipelines_spark.sources.catalog import read_table

    out = cluster_topics(
        read_table(spark, sf_dir, "embeddings"),
        read_table(spark, sf_dir, "documents"),
    ).collect()
    assert out
    by_c = {}
    for r in out:
        by_c.setdefault(r.cluster_id, []).append(r)
    k = len(by_c)
    assert 1 <= k <= 8
    for cid, rows in by_c.items():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= TOPIC_TOPK
        for r in rows:
            assert 1 <= r.n_clusters_with_term <= k
            share = (r.ctf * 1_000_000) // r.cluster_tokens
            assert r.score == share * ((k * 1000) // (r.n_clusters_with_term + 1))
        # scores non-increasing in rank
        assert all(a.score >= b.score for a, b in zip(rows, rows[1:]))


def test_centroid_drift_same_distribution_is_calm(spark, sf_dir):
    """Old/new halves are drawn from the SAME corpus, so the monitor must
    read calm: per-cluster share shift small, displacement bounded, and
    the share columns must each sum to ~1000 milli."""
    from maap_data_pipelines_spark import registry

    rows = registry.queries()["embedding_centroid_drift"](spark, sf_dir).collect()
    assert rows
    assert sum(r.n_old for r in rows) > 0 and sum(r.n_new for r in rows) > 0
    s_old = sum(r.share_old_milli for r in rows)
    s_new = sum(r.share_new_milli for r in rows)
    assert 1000 - len(rows) <= s_old <= 1000
    assert 1000 - len(rows) <= s_new <= 1000
    for r in rows:
        assert r.share_shift_milli == r.share_new_milli - r.share_old_milli
        assert abs(r.share_shift_milli) <= 300  # same distribution: calm
        assert r.displacement_k >= 0


def test_norm_health_bands_zero_and_scaled(spark):
    """Zero vectors land in band -1; a 2x-scaled clone population lands
    exactly two log2 bands above its source (norm² scales by 4)."""
    rows = []
    base = [0.5] * 64
    for i in range(10):
        rows.append((i, base))
    for i in range(10, 20):
        rows.append((i, [1.0] * 64))  # 2x scale -> norm2 4x -> +2 bands
    rows.append((99, [0.0] * 64))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    from maap_data_pipelines_spark.operators.kmeans import embedding_norm_health

    got = {r.band: r.n_vecs for r in embedding_norm_health(df).collect()}
    assert got.get(-1) == 1
    bands = sorted(b for b in got if b >= 0)
    assert len(bands) == 2 and bands[1] - bands[0] == 2


def test_lloyd_round_matches_unfused(spark, sf_dir):
    """r11 pin: the fused single-job Lloyd round (_lloyd_round: mapInPandas
    partials + driver merge) is value-identical to the unfused plan it
    replaced (_assign -> _update -> collect) — same argmin ties (lowest
    cid), same exact int64 partials, same floor(double/double) centroid."""
    from pyspark.sql import functions as F

    from maap_data_pipelines_spark.sources.catalog import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", kmeans.quantize_udf(F.col("embedding")).alias("qv")
    ).localCheckpoint()
    cents = sorted(
        (r.cid, list(r.cv))
        for r in q.filter(F.col("vec_id") < kmeans.KM_K)
        .select(F.col("vec_id").alias("cid"), F.col("qv").alias("cv"))
        .collect()
    )
    for _ in range(2):  # two rounds so round-2 inputs are themselves fused output
        unfused = sorted(
            (r.cid, list(r.cv))
            for r in kmeans._update(kmeans._assign(q, cents)).collect()
        )
        cents = kmeans._lloyd_round(q, cents)
        assert cents == unfused
