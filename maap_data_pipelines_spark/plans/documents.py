"""Registered document-analysis plans.

Thin ``(spark, sf_dir)`` adapters over the pure ``DataFrame -> DataFrame``
operators in :mod:`maap_data_pipelines_spark.operators.text`, reading the
``documents`` table. Oracle SQL comes from the operators module (kept next
to the Spark expressions so the two renderings evolve together).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import bpe, curation, dedup, sketch, text
from ..operators.profile import profile_columns, profile_sql
from ..sources.catalog import fan_out, read_table

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_columns(read_table(spark, sf_dir, "documents"), DOC_COLS)


# fan= per-key, A/B-measured at sf0.1 (tools/ab_fanout_docs.py, r11):
# ON only where heavy pre-shuffle map work won the A/B (shingle/regex
# explosion: containment 4.5->3.9s, dup_span_removal 3.3->2.6,
# dup_ngram_mass 3.0->2.0, pii_scan 0.5->0.4); every other measured key
# was neutral or LOST to the extra exchange (dsir_importance 1.2->3.7,
# tfidf 0.9->1.5, rrf_fusion 2.4->3.9) and stays direct. No-op at real
# scale either way (fan_out partition-count gate).
def _wrap(op, fan: bool = False):
    def plan(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = read_table(spark, sf_dir, "documents")
        return op(fan_out(docs) if fan else docs)

    plan.__name__ = op.__name__
    plan.__doc__ = op.__doc__
    return plan


QUERIES = {
    "token_stats": _wrap(text.token_stats),
    "text_quality": _wrap(text.text_quality),
    "lang_id": _wrap(text.lang_id),
    "doc_fingerprint": _wrap(text.doc_fingerprint),
    "quality_filter": _wrap(text.quality_filter),
    "term_topk": _wrap(text.term_topk),
    "bigram_topk": _wrap(text.bigram_topk),
    "tfidf_top_terms": _wrap(text.tfidf_top_terms),
    "bm25_topk": _wrap(text.bm25_topk),
    "bm25_proximity_rerank": _wrap(text.bm25_proximity_rerank),
    "term_cooccurrence": _wrap(text.term_cooccurrence),
    "doc_keyphrase_rake": _wrap(text.doc_keyphrase_rake),
    "dedup_containment": _wrap(dedup.dedup_containment, fan=True),
    "doc_cosine_topk": _wrap(text.doc_cosine_topk),
    "bpe_token_stats": _wrap(bpe.bpe_token_stats_gate),
    "bpe_train_merges": _wrap(bpe.bpe_train_gate),
    "vocab_diff": _wrap(text.vocab_diff),
    "vocab_overlap": _wrap(text.vocab_overlap),
    "fuzzy_word_pairs": _wrap(text.fuzzy_word_pairs),
    "documents_profile": documents_profile,
    "decontaminate": _wrap(curation.decontaminate),
    "repetition_stats": _wrap(curation.repetition_stats),
    "pii_scan": _wrap(curation.pii_scan, fan=True),
    "domain_mixture": _wrap(curation.domain_mixture),
    "dup_ngram_mass": _wrap(curation.dup_ngram_mass, fan=True),
    "doc_pack_assign": _wrap(curation.doc_pack_assign),
    "doc_length_histogram": _wrap(curation.doc_length_histogram),
    "domain_rebalance": _wrap(curation.domain_rebalance),
    "doc_chunks": _wrap(curation.doc_chunks),
    "text_normalize": _wrap(text.text_normalize),
    "heavy_hitters": _wrap(sketch.heavy_hitters),
    "source_lang_drift": _wrap(curation.source_lang_drift),
    "doc_perplexity": _wrap(text.doc_perplexity),
    "split_leakage": _wrap(curation.split_leakage),
    "dup_span_removal": _wrap(curation.dup_span_removal, fan=True),
    # r4 additions are APPENDED: documents keys ahead of these fill the
    # in-flight driver window (registry ordering), appended keys rotate in
    # next round
    "doc_length_outliers": _wrap(text.doc_length_outliers),
    "doc_curriculum": _wrap(text.doc_curriculum),
    "retrieval_rrf_fusion": _wrap(text.retrieval_rrf_fusion),
    "retrieval_mmr_topk": _wrap(text.retrieval_mmr_topk),
    "retrieval_ndcg": _wrap(text.retrieval_ndcg),
    "dsir_importance": _wrap(curation.dsir_importance),
    "dsir_auc": _wrap(curation.dsir_auc),
    "doc_ngram_novelty": _wrap(curation.doc_ngram_novelty),
    "packing_efficiency": _wrap(curation.packing_efficiency),
    "vocab_growth": _wrap(text.vocab_growth),
    "doc_zipf_fit": _wrap(text.doc_zipf_fit),
    "doc_neyman_allocation": _wrap(curation.doc_neyman_allocation),
    "quality_nb_classifier": _wrap(curation.quality_nb_classifier),
    "quality_nb_calibration": _wrap(curation.quality_nb_calibration),
    "quality_isotonic_calibration": _wrap(curation.quality_isotonic_calibration),
    "quality_platt_scaling": _wrap(curation.quality_platt_scaling),
    "quality_cohen_kappa": _wrap(curation.quality_cohen_kappa),
    "doc_length_anova": _wrap(text.doc_length_anova),
    "doc_length_kruskal": _wrap(text.doc_length_kruskal),
    "doc_burstiness": _wrap(text.doc_burstiness),
    "source_js_matrix": _wrap(text.source_js_matrix),
    "documents_ks_drift": _wrap(text.documents_ks_drift),
    "documents_chi2_independence": _wrap(text.documents_chi2_independence),
    "vocab_entropy": _wrap(text.vocab_entropy),
    "corpus_bigram_entropy": _wrap(text.corpus_bigram_entropy),
    "retrieval_map": _wrap(text.retrieval_map),
}

ORACLES = dict(text.QUERY_SQL)
ORACLES.update(curation.QUERY_SQL)
ORACLES.update(sketch.QUERY_SQL)
ORACLES["dedup_containment"] = dedup.CONTAINMENT_SQL
ORACLES["documents_profile"] = profile_sql("documents", DOC_COLS)
# bpe keys: full oracles via invariant verdicts (exact SQL-replicable
# columns + literal-TRUE invariants of a correct tokenizer/trainer — the
# sketch-monitor trick; exact sequences stay pinned in tests/test_bpe.py)
ORACLES["bpe_token_stats"] = bpe.BPE_TOKEN_STATS_SQL
ORACLES["bpe_train_merges"] = bpe.BPE_TRAIN_SQL
