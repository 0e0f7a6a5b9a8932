"""PQ behavioral pins: code determinism, twin retrieval through rerank."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from maap_data_pipelines_spark.operators import pq

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


def _v(base: float, wiggle: float, dim: int = 64):
    out = [base] * dim
    out[0] += wiggle
    return out


def test_pq_codes_identical_for_identical_vectors(spark):
    rows = [(i, _v(0.3 if i % 2 == 0 else -0.3, 0.0)) for i in range(20)]
    _, cb, enc = pq._encoded(_emb(spark, rows))
    codes = {r.vec_id: list(r.codes) for r in enc.collect()}
    assert codes[0] == codes[2] == codes[18]
    assert codes[1] == codes[3] == codes[19]
    assert all(len(c) == pq.PQ_S for c in codes.values())


def test_pq_rerank_finds_exact_twin(spark):
    # query 0's exact twin is vec 30 (identical); rerank must rank it #1
    rows = [(i, _v(0.2 + 0.001 * i, 0.01 * i)) for i in range(1, 30)]
    rows = [(0, _v(0.2, 0.0))] + rows + [(30, _v(0.2, 0.0))]
    out = {
        (r.query_id, r.rnk): r.vec_id
        for r in pq.ann_pq_rerank(_emb(spark, rows)).collect()
    }
    assert out[(0, 1)] == 30  # zero exact distance wins after rerank


def test_pq_recall_bounds(spark, sf_dir):
    from maap_data_pipelines_spark.sources.catalog import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    rows = pq.ann_pq_rerank_recall(emb).collect()
    assert all(0.0 <= r.recall <= 1.0 for r in rows)
    # rerank can only help: pool ⊇ final top-5 of the compressed ranking
    base = {r.query_id: r.recall for r in pq.ann_pq_recall(emb).collect()}
    rer = {r.query_id: r.recall for r in rows}
    assert sum(rer.values()) >= sum(base.values())
