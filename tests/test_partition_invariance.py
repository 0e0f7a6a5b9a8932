"""Partitioning-independence: THE distributed-correctness property.

A query whose RESULT depends on the shuffle width, AQE replanning, or
input split layout is wrong at any scale — per-partition tie-breaks,
first()-style nondeterminism, and unstable float association orders all
surface as cross-run drift long before they surface as wrong answers on
a single layout. This sweep re-executes a deliberately intricate sample
of registered queries under different runtime partitioning regimes and
pins bit-identical results (every operator keeps exact integer /
deterministic-tie discipline precisely so this holds).
"""

from __future__ import annotations

import pytest

from maap_data_pipelines_spark import registry

# window functions over ties, salting, iterative graph/centroid rounds,
# sketch pruning, greedy selection — the shapes partitioning breaks first
KEYS = [
    "top_customers_window",
    "events_salted_rollup",
    "doc_surrogate_keys",
    "heavy_hitters",
    "dedup_clusters",
    "orders_running_revenue",
    "bm25_topk",
    "events_sessionize",
    "events_cms_topk",
    "retrieval_mmr_topk",
    "embedding_kmeans",
    "cluster_topics",
    # r6 second-half additions: bucketed prefix-max (THE
    # partitioning-sensitive shape), sequential folds, window+rank picks
    "customer_pareto_frontier",
    "events_forecast_holt",
    "events_changepoint",
    "doc_weighted_sample_exact_k",
    "referential_integrity_census",
    "dedup_pair_diffstats",
    # r6 third-wave additions: per-user segment windows feeding joins,
    # an unpartitioned monthly MA window, a year self-join with integer
    # unit-price quantization, and a lag()-paired dup detector
    "events_multitouch_attribution",
    "orders_seasonal_decompose",
    "lineitem_price_index",
    "orders_duplicate_payments",
    # r6 final-wave additions: rare-first prefix ranking, synchronous LP
    # label ties, KMV top-K selection, NB cross-multiplied argmax, the
    # 6-hop integer chain fold, in-plan Lloyd rounds, window-min
    # fingerprint selection, and the one-step-ahead backtest lags
    "dedup_prefix_filter",
    "dedup_label_propagation",
    "events_theta_overlap",
    "quality_nb_classifier",
    "events_markov_attribution_removal",
    "customer_rfm_segments",
    "doc_winnowing_matches",
    "events_forecast_backtest",
    # closing-wave keys: policy election windows, the strategy audit's
    # truth semi-flags, RLE grouping, integer ANOVA/entropy folds, the
    # weighted chain, and the bridge identity
    "dedup_canonical_election",
    "dedup_strategy_comparison",
    "dedup_local_bridges",
    "media_silence_runs",
    "doc_length_anova",
    "events_user_entropy",
    "nation_trade_pagerank",
    "lineitem_revenue_bridge",
    # r7 wave: contingency-table pair counting over two CCs, min_by
    # survivor rides, stratified window sampling + dual top-k ranking,
    # trailing-window sigma test with rank pick, RAKE's order-carried
    # phrase assembly, mapInPandas frame deltas + rank, and the
    # triple-recurrence seasonal fold
    "dedup_rand_index",
    "dedup_token_savings",
    "ann_recall_by_label",
    "orders_shewhart_control",
    "doc_keyphrase_rake",
    "media_scene_cuts",
    "events_holt_winters",
    "events_mde_curve",
    "orders_backlog_aging",
    "ann_centroid_balance",
    "events_cuped",
    "quality_isotonic_calibration",
    # r8 extension: the five-stage cascade composition and its yield
    # rollup, the four-method attribution grid, the decile
    # cross-multiplication bucketing, TakeOrdered-fed OLS, and pioneer
    # (min doc_id) attribution
    "corpus_curation_extended",
    "curation_yield_report",
    "events_attribution_comparison",
    "quality_nb_calibration",
    "doc_zipf_fit",
    "vocab_growth",
    # r9 wave: per-stratum sufficient-statistic folds (digit-count
    # bucketing + the per-stratum double trees), the quantized
    # weighted-logit OLS + dual-fit lattice join, and the exact-collapse
    # (min-id election over embedding-bytes groups) -> banded LSH path
    "events_cuped_stratified",
    "quality_platt_scaling",
    "embedding_dedup_collapsed",
    "events_ab_sequential",
    # r10 wave: the collapse-first fold inside the banded LISTING (clique
    # expansion via per-group self-joins — id interleaving across
    # partitions is exactly what could break the least/greatest ordering),
    # the doubled-rank cumulative windows (MW + KS argmax tie-break), the
    # per-nation rank·value fold, and the DiD double trees
    "embedding_dedup_banded",
    "orders_mann_whitney",
    "documents_ks_drift",
    "supplier_gini_by_nation",
    "events_diff_in_diff",
    # r10 second wave: grid left-join with coalesced empty cells feeding
    # per-cell floor quantization, and the per-term quantized entropy fold
    "documents_chi2_independence",
    "vocab_entropy",
    # r10 third wave: the shared-sort rank windows (Spearman), the
    # per-supplier nano-quantized ln fold (Theil), and the value-grid
    # doubled ranks crossed through two 1-row aggregates (KW)
    "orders_spearman_corr",
    "supplier_theil_decomposition",
    "doc_length_kruskal",
    # the lag-window day series (DW), the per-node triangle credit joins
    # (clustering coefficient), and the confusion-count kappa fold
    "orders_durbin_watson",
    "dedup_clustering_coefficient",
    "quality_cohen_kappa",
    # the (doc,term) dispersion fold and the ntile migration matrix
    "doc_burstiness",
    "customer_rfm_transition",
    # the shared+exclusive JS identity over the pair spine, and the
    # top-k boundary rank (Hill): both tie-break-sensitive
    "source_js_matrix",
    "orders_hill_tail_index",
    # the median-pick + sign-flip lag fold, and the per-user gap
    # histogram with the exp-CDF argmax tie-break
    "orders_runs_test",
    "events_interarrival_exponentiality",
    # the per-rank quantized gain folds over BOTH ranking windows
    "retrieval_ndcg",
    # r11 wave: running-hit precision folds over the ranking window, the
    # bounded contingency dominance join, the doubled count-distribution
    # median/MAD picks, vocab-grain c·ln c folds, and the bucketed top-k
    # in-degree histogram (per-source rank tie-breaks)
    "retrieval_map",
    "orders_kendall_tau",
    "lineitem_mad_outliers",
    "corpus_bigram_entropy",
    "embedding_hubness",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("key", KEYS)
def test_result_invariant_under_partitioning(spark, sf_dir, key):
    fn = registry.queries()[key]
    conf = spark.conf
    base_parts = conf.get("spark.sql.shuffle.partitions")
    base_aqe = conf.get("spark.sql.adaptive.enabled")
    base_split = conf.get("spark.sql.files.maxPartitionBytes")
    try:
        conf.set("spark.sql.shuffle.partitions", "32")
        conf.set("spark.sql.adaptive.enabled", "true")
        a = _canon(fn(spark, sf_dir))
        conf.set("spark.sql.shuffle.partitions", "5")
        conf.set("spark.sql.adaptive.enabled", "false")
        b = _canon(fn(spark, sf_dir))
        # third regime: shred the SCAN into many tiny input splits (the
        # "different file layout / executor count" stand-in)
        conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        c = _canon(fn(spark, sf_dir))
    finally:
        conf.set("spark.sql.shuffle.partitions", base_parts)
        conf.set("spark.sql.adaptive.enabled", base_aqe)
        conf.set("spark.sql.files.maxPartitionBytes", base_split)
    assert a == b and a, key
    assert a == c, f"{key}: result depends on input split layout"
