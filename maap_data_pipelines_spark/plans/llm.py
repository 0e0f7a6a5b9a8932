"""Registered LLM-data-pipeline plans: dedup + similarity search.

Thin ``(spark, sf_dir)`` adapters over operators/dedup.py (documents) and
operators/ann.py (embeddings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import ann, dedup
from ..sources.catalog import read_table


def _doc_plan(op):
    def plan(spark: SparkSession, sf_dir: str) -> DataFrame:
        return op(read_table(spark, sf_dir, "documents"))

    plan.__name__ = op.__name__
    plan.__doc__ = op.__doc__
    return plan


def _emb_plan(op):
    def plan(spark: SparkSession, sf_dir: str) -> DataFrame:
        return op(read_table(spark, sf_dir, "embeddings"))

    plan.__name__ = op.__name__
    plan.__doc__ = op.__doc__
    return plan


QUERIES = {
    "dedup_exact": _doc_plan(dedup.dedup_exact),
    "dedup_incremental": _doc_plan(dedup.dedup_incremental),
    "dedup_minhash_lsh": _doc_plan(dedup.dedup_minhash_lsh),
    "dedup_simhash": _doc_plan(dedup.dedup_simhash),
    "ngram_jaccard": _doc_plan(dedup.ngram_jaccard),
    "dedup_clusters": _doc_plan(dedup.dedup_clusters),
    "ann_cosine_topk": _emb_plan(ann.ann_cosine_topk),
    "ann_lsh_buckets": _emb_plan(ann.ann_lsh_buckets),
    "embedding_dedup": _emb_plan(ann.embedding_dedup),
    "embedding_dedup_lsh": _emb_plan(ann.embedding_dedup_lsh),
    "ann_ivf_topk": _emb_plan(ann.ann_ivf_topk),
    "ann_ivf_topk2": _emb_plan(ann.ann_ivf_topk2),
    "ann_ivf_recall": _emb_plan(ann.ann_ivf_recall),
    "ann_ivf_recall2": _emb_plan(ann.ann_ivf_recall2),
}

ORACLES = {**dedup.QUERY_SQL, **ann.QUERY_SQL}
