"""Registered LLM-data-pipeline plans: dedup + similarity search.

Thin ``(spark, sf_dir)`` adapters over operators/dedup.py (documents) and
operators/ann.py (embeddings), plus ``corpus_curation`` — the end-to-end
keep/reject decision that composes quality filtering with exact and
near-duplicate removal into the pipeline's final artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ann, dedup, kmeans, pq, quant, text
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


CURATION_NEAR_DUP_JACCARD = 0.5


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's final artifact: per-doc keep flag + first-fail reason.

    Rejection cascade (deterministic order, so the reason histogram is a
    monitorable table):
      1. quality   — fails the C4/Gopher hard rules (quality_filter);
      2. exact_dup — not the min-doc_id survivor of its text hash;
      3. near_dup  — appears as the HIGHER id in a MinHash candidate
                     pair with est_jaccard >= 0.5 (min-id canonical
                     survives, its near-copies drop);
      4. ok        — kept.
    Composes three existing operators via two hash-key joins; every
    building block keeps its own oracle, and the composition has one.
    """
    docs = read_table(spark, sf_dir, "documents")
    quality = text.quality_filter(docs).select(
        "doc_id", F.col("keep").alias("q_ok")
    )
    exact_survivor = dedup.dedup_exact(docs).select(
        F.col("canonical_doc_id").alias("doc_id"), F.lit(True).alias("is_survivor")
    )
    near_rejects = (
        dedup.dedup_minhash_lsh(docs)
        .filter(F.col("est_jaccard") >= CURATION_NEAR_DUP_JACCARD)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("near_dup", F.lit(True))
    )
    reason = (
        F.when(~F.col("q_ok"), "quality")
        .when(F.col("is_survivor").isNull(), "exact_dup")
        .when(F.col("near_dup").isNotNull(), "near_dup")
        .otherwise("ok")
    )
    return (
        docs.select("doc_id")
        .join(quality, "doc_id")
        .join(exact_survivor, "doc_id", "left")
        .join(near_rejects, "doc_id", "left")
        .select("doc_id", reason.alias("reason"))
        .withColumn("keep", F.col("reason") == "ok")
    )


CORPUS_CURATION_SQL = f"""
WITH quality AS (
  SELECT doc_id, keep AS q_ok FROM ({text.QUALITY_FILTER_SQL})
),
surv AS (
  SELECT canonical_doc_id AS doc_id, TRUE AS is_survivor
  FROM ({dedup.DEDUP_EXACT_SQL})
),
near AS (
  SELECT DISTINCT doc_b AS doc_id, TRUE AS near_dup
  FROM ({dedup.DEDUP_MINHASH_SQL})
  WHERE est_jaccard >= {CURATION_NEAR_DUP_JACCARD}
)
SELECT d.doc_id,
       CASE WHEN NOT q.q_ok THEN 'quality'
            WHEN s.is_survivor IS NULL THEN 'exact_dup'
            WHEN n.near_dup IS NOT NULL THEN 'near_dup'
            ELSE 'ok' END AS reason,
       (CASE WHEN NOT q.q_ok THEN 'quality'
             WHEN s.is_survivor IS NULL THEN 'exact_dup'
             WHEN n.near_dup IS NOT NULL THEN 'near_dup'
             ELSE 'ok' END) = 'ok' AS keep
FROM documents d
JOIN quality q USING (doc_id)
LEFT JOIN surv s USING (doc_id)
LEFT JOIN near n USING (doc_id)
"""


QUERIES = {
    "corpus_curation": corpus_curation,
    "dedup_exact": _doc_plan(dedup.dedup_exact),
    "dedup_incremental": _doc_plan(dedup.dedup_incremental),
    "dedup_minhash_lsh": _doc_plan(dedup.dedup_minhash_lsh),
    "dedup_simhash": _doc_plan(dedup.dedup_simhash),
    "ngram_jaccard": _doc_plan(dedup.ngram_jaccard),
    "dedup_clusters": _doc_plan(dedup.dedup_clusters),
    "dedup_pagerank": _doc_plan(dedup.dedup_pagerank),
    "similar_docs_topk": _doc_plan(dedup.similar_docs_topk),
    "dedup_cluster_sizes": _doc_plan(dedup.dedup_cluster_sizes),
    "dedup_triangles": _doc_plan(dedup.dedup_triangles),
    "minhash_calibration": _doc_plan(dedup.minhash_calibration),
    "ann_cosine_topk": _emb_plan(ann.ann_cosine_topk),
    "ann_lsh_buckets": _emb_plan(ann.ann_lsh_buckets),
    "semantic_decontaminate": _emb_plan(ann.semantic_decontaminate),
    "embedding_dedup": _emb_plan(ann.embedding_dedup),
    "embedding_dedup_lsh": _emb_plan(ann.embedding_dedup_lsh),
    "embedding_dedup_mp": _emb_plan(ann.embedding_dedup_mp),
    "embedding_dedup_banded": _emb_plan(ann.embedding_dedup_banded),
    "embedding_dedup_recall": _emb_plan(ann.embedding_dedup_recall),
    "ann_ivf_topk": _emb_plan(ann.ann_ivf_topk),
    "ann_ivf_topk2": _emb_plan(ann.ann_ivf_topk2),
    "ann_ivf_recall": _emb_plan(ann.ann_ivf_recall),
    "ann_ivf_recall2": _emb_plan(ann.ann_ivf_recall2),
    "embedding_kmeans": _emb_plan(kmeans.embedding_kmeans),
    "semantic_dedup": _emb_plan(kmeans.semantic_dedup),
    "ann_ivf_kmeans_topk": _emb_plan(kmeans.ann_ivf_kmeans_topk),
    "ann_ivf_kmeans_recall": _emb_plan(kmeans.ann_ivf_kmeans_recall),
    "ann_l2_topk": _emb_plan(pq.ann_l2_topk),
    "ann_pq_topk": _emb_plan(pq.ann_pq_topk),
    "ann_pq_recall": _emb_plan(pq.ann_pq_recall),
    "ann_pq_rerank": _emb_plan(pq.ann_pq_rerank),
    "ann_pq_rerank_recall": _emb_plan(pq.ann_pq_rerank_recall),
    # r4: matryoshka truncation dial + its recall meter (appended — llm
    # sits after the r04 driver window in registry ordering)
    "ann_matryoshka_topk": _emb_plan(ann.ann_matryoshka_topk),
    "ann_matryoshka_recall": _emb_plan(ann.ann_matryoshka_recall),
    "embedding_label_centroids": _emb_plan(kmeans.embedding_label_centroids),
    "embedding_label_confusion": _emb_plan(kmeans.embedding_label_confusion),
    "ann_ivfpq_topk": _emb_plan(pq.ann_ivfpq_topk),
    "ann_ivfpq_recall": _emb_plan(pq.ann_ivfpq_recall),
    "dedup_minhash_incremental": _doc_plan(dedup.dedup_minhash_incremental),
    "dedup_kcore": _doc_plan(dedup.dedup_kcore),
    "embedding_knn_accuracy": _emb_plan(kmeans.embedding_knn_accuracy),
    "embedding_fisher_ratio": _emb_plan(kmeans.embedding_fisher_ratio),
    "embedding_triplets": _emb_plan(kmeans.embedding_triplets),
    "embedding_pca_top": _emb_plan(kmeans.embedding_pca_top),
    "ann_sq8_topk": _emb_plan(quant.ann_sq8_topk),
    "ann_sq8_recall": _emb_plan(quant.ann_sq8_recall),
    "ann_bq_topk": _emb_plan(quant.ann_bq_topk),
    "ann_bq_recall": _emb_plan(quant.ann_bq_recall),
    "ann_bq_rerank": _emb_plan(quant.ann_bq_rerank),
    "ann_bq_rerank_recall": _emb_plan(quant.ann_bq_rerank_recall),
}

ORACLES = {
    **dedup.QUERY_SQL,
    **ann.QUERY_SQL,
    **kmeans.QUERY_SQL,
    **pq.QUERY_SQL,
    **quant.QUERY_SQL,
    "corpus_curation": CORPUS_CURATION_SQL,
}
