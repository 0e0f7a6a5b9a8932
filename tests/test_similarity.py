"""Behavioral pins for the ANN family on crafted embeddings."""

from __future__ import annotations

import math

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from maap_data_pipelines_spark.operators import ann

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


def _unit(i: int, dim: int = ann.EMBED_DIM):
    v = [0.0] * dim
    v[i] = 1.0
    return v


def test_topk_orders_by_cosine(spark):
    # query 0 == vec 11 exactly; vec 12 orthogonal-ish, vec 13 opposite
    rows = [
        (0, _unit(0)),
        (11, _unit(0)),
        (12, _unit(1)),
        (13, [-x for x in _unit(0)]),
    ]
    out = ann.ann_cosine_topk(_emb(spark, rows)).orderBy("rnk").collect()
    got = [(r.vec_id, r.cosine, r.rnk) for r in out if r.query_id == 0]
    assert got[0] == (11, 1.0, 1)
    assert got[1][0] == 12 and abs(got[1][1]) < 1e-9
    assert got[2] == (13, -1.0, 3)


def test_bucket_is_deterministic_and_16bit(spark):
    rows = [(i, [math.sin(i * 17 + d) for d in range(ann.EMBED_DIM)]) for i in range(20)]
    df = _emb(spark, rows)
    a = {r.vec_id: r.bucket for r in df.select("vec_id", ann.bucket_col("embedding").alias("bucket")).collect()}
    b = {r.vec_id: r.bucket for r in df.select("vec_id", ann.bucket_col("embedding").alias("bucket")).collect()}
    assert a == b
    assert all(0 <= v < (1 << ann.N_PLANES) for v in a.values())


def test_identical_vectors_share_bucket(spark):
    v = [math.cos(d * 0.7) for d in range(ann.EMBED_DIM)]
    df = _emb(spark, [(1, v), (2, v)])
    buckets = {r.bucket for r in df.select(ann.bucket_col("embedding").alias("bucket")).collect()}
    assert len(buckets) == 1


def test_embedding_dedup_finds_identical_pair(spark):
    v = [math.cos(d * 0.3) + 1.5 for d in range(ann.EMBED_DIM)]
    w = [math.sin(d * 1.1) for d in range(ann.EMBED_DIM)]
    out = ann.embedding_dedup(_emb(spark, [(1, v), (2, v), (3, w)])).collect()
    pairs = {(r.vec_a, r.vec_b): r.cosine for r in out}
    assert pairs[(1, 2)] == 1.0


def test_persisted_ivf_index_roundtrip_and_pruning(spark, tmp_path):
    """write_ivf_index -> search_ivf_index reproduces ann_ivf_topk exactly,
    reading ONLY the probed cells' files (partition pruning as the
    inverted-list structure)."""
    from pyspark.sql import functions as F

    from maap_data_pipelines_spark.operators import ann
    from maap_data_pipelines_spark.sources.catalog import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = str(tmp_path / "ivf")
    ann.write_ivf_index(emb, base)

    queries = emb.filter(F.col("vec_id") < ann.N_QUERIES)
    got = {
        (r.query_id, r.vec_id, r.cosine, r.rnk)
        for r in ann.search_ivf_index(spark, base, queries).collect()
    }
    want = {
        (r.query_id, r.vec_id, r.cosine, r.rnk)
        for r in ann.ann_ivf_topk(emb).collect()
    }
    assert got == want and got

    # pruning: the filtered read touches strictly fewer files than exist
    all_files = (
        spark.read.parquet(base + "/cells")
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    cents = spark.read.parquet(base + "/centroids")
    q = ann.ivf_assign(queries, cents).select("cell").distinct()
    probed = [r.cell for r in q.collect()]
    touched = (
        spark.read.parquet(base + "/cells")
        .withColumn("cell", F.col("cell").cast("long"))
        .filter(F.col("cell").isin(probed))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert len(probed) < ann.IVF_K  # 10 queries land in < 16 cells
    assert touched < all_files, (touched, all_files)


def test_semantic_decontaminate_flags_paraphrase_twin(spark):
    """A corpus vector colinear with an eval vector is flagged; an
    orthogonal one is not (bucket blocking + cosine verify)."""
    # eval slice = vec_id < DECON_EVAL_N; craft ids around the boundary
    ev = _unit(0)
    twin = [x * 0.7 for x in _unit(0)]  # cosine 1.0 with ev
    ortho = _unit(1)
    rows = [(0, ev), (ann.DECON_EVAL_N + 1, twin), (ann.DECON_EVAL_N + 2, ortho)]
    out = {
        r.vec_id: (r.n_eval_matches, r.max_cosine)
        for r in ann.semantic_decontaminate(
            _emb(spark, rows)
        ).collect()
    }
    assert out.get(ann.DECON_EVAL_N + 1, (0,))[0] >= 1
    assert (ann.DECON_EVAL_N + 2) not in out


def test_matryoshka_recall_measures_truncation_cost(spark, sf_dir):
    """Truncated-32-dim search must be a real approximation: per-query
    recall in [0, 1], nonzero on average (prefix halves correlate), and
    the rollup exposes the dial's measured cost."""
    from maap_data_pipelines_spark import registry

    rows = registry.queries()["ann_matryoshka_recall"](spark, sf_dir).collect()
    assert len(rows) == 10  # one row per query
    recalls = [r.recall for r in rows]
    assert all(0.0 <= r <= 1.0 for r in recalls)
    assert sum(recalls) / len(recalls) > 0.0
    for r in rows:
        assert r.recall == round(r.n_hits / 5, 6)


def test_matryoshka_topk_is_exact_over_prefix(spark, sf_dir):
    """The truncated search is EXACT over the 32-dim prefix: recompute one
    query's cosines in numpy and pin the ordering."""
    import numpy as np

    from maap_data_pipelines_spark import registry
    from maap_data_pipelines_spark.sources.catalog import read_table

    got = [
        (r.vec_id, r.cosine32)
        for r in sorted(
            registry.queries()["ann_matryoshka_topk"](spark, sf_dir)
            .filter("query_id = 0")
            .collect(),
            key=lambda r: r.rnk,
        )
    ]
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)[:32]
        for r in read_table(spark, sf_dir, "embeddings").collect()
    }
    q = emb[0]
    scored = sorted(
        (
            (
                -round(
                    float(v @ q / (np.sqrt(v @ v) * np.sqrt(q @ q))), 6
                ),
                vid,
            )
            for vid, v in emb.items()
            if vid != 0
        ),
    )[:5]
    assert [(vid, -c) for c, vid in scored] == got


def test_label_centroids_shape_and_exactness(spark, sf_dir):
    """K labels x 64 dims, each centroid_micro = floor(mean) recomputed in
    numpy int arithmetic."""
    import numpy as np

    from maap_data_pipelines_spark import registry
    from maap_data_pipelines_spark.sources.catalog import read_table

    rows = registry.queries()["embedding_label_centroids"](spark, sf_dir).collect()
    emb = read_table(spark, sf_dir, "embeddings").collect()
    by_label: dict = {}
    for r in emb:
        q = np.floor(np.array(r.embedding, dtype=np.float64) * 1_000_000).astype(
            np.int64
        )
        by_label.setdefault(r.label, []).append(q)
    labels = sorted(by_label)
    assert len(rows) == len(labels) * 64
    got = {(r.label, r.dim): (r.centroid_micro, r.n_vectors) for r in rows}
    for lbl in labels:
        V = np.stack(by_label[lbl])
        for d in range(64):
            want = int(V[:, d].sum()) // len(V)  # python floor division
            assert got[(lbl, d + 1)] == (want, len(V))


def test_label_confusion_conserves_and_beats_chance(spark, sf_dir):
    from maap_data_pipelines_spark import registry
    from maap_data_pipelines_spark.sources.catalog import read_table

    rows = registry.queries()["embedding_label_confusion"](spark, sf_dir).collect()
    n_vecs = read_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_vecs  # every vector classified once
    diag = sum(r.n_vecs for r in rows if r.true_label == r.pred_label)
    n_labels = len({r.true_label for r in rows})
    # nearest-centroid must beat 2x chance on labeled synthetic data
    assert diag / n_vecs > 2.0 / n_labels


def test_collapsed_dedup_matches_direct_listing_on_cloned_corpus(spark, sf_dir):
    """The duplicate-heavy scale path's defining identity: clone every
    embedding c=3 times; embedding_dedup_collapsed's rep pairs then
    stand for EXACTLY the direct banded listing's cross-clique pairs
    (n_expanded_pairs = 3x3 per rep pair, cosine identical), while the
    C(3,2)-per-vector clique-internal pairs are deliberately excluded
    (bit-identical vectors are dedup_exact's domain, not near-dup's)."""
    from pyspark.sql import functions as F

    from maap_data_pipelines_spark.sources.catalog import read_table

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    c = 3
    cloned = emb
    for i in range(1, c):
        cloned = cloned.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        )
    out = ann.embedding_dedup_collapsed(cloned).collect()
    assert out, "crafted corpus must contain near-dup structure"
    # every clone group has exactly c members; reps are the original ids
    assert all(r.clones_a == c and r.clones_b == c for r in out)
    assert all(r.n_expanded_pairs == c * c for r in out)
    rep_pairs = {(r.vec_a, r.vec_b): r.cosine for r in out}
    assert all(a < 10_000_000 and b < 10_000_000 for a, b in rep_pairs)
    # direct listing on the cloned corpus: cross-clique pairs group to the
    # rep pairs with multiplicity c*c; clique-internal pairs (cosine 1.0
    # between clones of ONE vector) are the quadratic echo collapsed away
    direct = ann.embedding_dedup_banded(cloned).collect()
    base = lambda v: v % 10_000_000
    cross = {}
    n_clique = 0
    for r in direct:
        a, b = base(r.vec_a), base(r.vec_b)
        if a == b:
            n_clique += 1
            continue
        k = (min(a, b), max(a, b))
        cross[k] = cross.get(k, 0) + 1
    assert set(cross) == set(rep_pairs)
    assert all(v == c * c for v in cross.values())
    # each vector's clone clique is fully banded (identical signatures):
    # the direct listing carries n * C(c,2) echo pairs the collapse removes
    assert n_clique == n * c * (c - 1) // 2
