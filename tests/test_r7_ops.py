"""Behavioral pins for the r7 operator wave (crafted inputs + plan-level
sanity), complementing the DuckDB value-hash oracles each op carries."""

from __future__ import annotations

from pyspark.sql import functions as F

from maap_data_pipelines_spark.operators import dedup, multimodal, text
from maap_data_pipelines_spark.registry import queries


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_rand_index_identical_clusterings_score_one(spark):
    # docs 1/2 byte-identical (minhash AND simhash both pair them),
    # 3 unrelated -> both clusterings agree exactly: RI = ARI = 1.0
    t = "the quick brown fox jumps over the lazy dog again and again"
    df = _docs(spark, [(1, t), (2, t), (3, "completely unrelated words " * 3)])
    r = dedup.dedup_rand_index(df).collect()[0]
    assert r.n_docs == 3 and r.n_pairs == 3
    assert r.sum_both == r.sum_minhash == r.sum_simhash == 1
    assert r.rand_ppm == 1_000_000
    assert r.ari_ppm == 1_000_000


def test_token_savings_counts_non_survivor_tokens(spark):
    # three identical 12-token docs -> one size-3 cluster, survivor=min id,
    # savings = 2 docs * 12 tokens; the unique doc forms no cluster
    t = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    df = _docs(
        spark, [(1, t), (2, t), (3, t), (9, "completely unrelated words " * 4)]
    )
    rows = {r.cluster_size: r for r in dedup.dedup_token_savings(df).collect()}
    assert set(rows) == {3}
    r = rows[3]
    assert r.n_clusters == 1 and r.docs_removed == 2
    assert r.tokens_removed == 24
    assert r.chars_removed == 2 * len(t)


def test_rake_segments_on_stopwords_and_scores_degree_over_freq(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta the gamma", "s1")], ["doc_id", "text", "source"]
    )
    rows = {r.phrase: r for r in text.doc_keyphrase_rake(df).collect()}
    # "the" delimits: phrases are "alpha beta" (deg 2 each word -> 4000)
    # and "gamma" (deg 1 -> 1000)
    assert set(rows) == {"alpha beta", "gamma"}
    assert rows["alpha beta"].score_milli == 4000
    assert rows["alpha beta"].n_words == 2
    assert rows["gamma"].score_milli == 1000
    assert rows["alpha beta"].rnk == 1


def test_scene_cuts_flags_the_hard_cut(spark):
    # doc_id=2 -> video/mp4; three 64-byte frames: aa|aa|pp -- the only
    # non-zero delta is at frame 2 ('a'=0x61 bucket 6, 'p'=0x70 bucket 7,
    # all 64 bytes move bucket -> L1 = 128)
    payload = "a" * 64 + "a" * 64 + "p" * 64
    docs = spark.createDataFrame([(2, payload)], ["doc_id", "text"])
    media = multimodal.make_media_df(
        docs.withColumn("text", F.col("text"))
    )
    rows = multimodal.media_scene_cuts(media).collect()
    assert [(r.frame_idx, r.l1_dist, r.rnk) for r in rows] == [
        (2, 128, 1),
        (1, 0, 2),
    ]


def test_scene_cuts_skips_partial_tail_and_non_video(spark):
    # doc 0 is image/png (filtered); doc 2's 100-byte payload has only
    # one FULL frame -> no deltas at all
    docs = spark.createDataFrame(
        [(0, "a" * 200), (2, "a" * 100)], ["doc_id", "text"]
    )
    assert multimodal.media_scene_cuts(multimodal.make_media_df(docs)).count() == 0


def test_mde_curve_required_n_monotone_decreasing(spark, sf_dir):
    rows = queries()["events_mde_curve"](spark, sf_dir).collect()
    assert len(rows) == 10
    req = [r.n_required_per_arm for r in rows]
    assert req == sorted(req, reverse=True)
    assert all(r.n_users > 0 and 0 <= r.feasible_now <= 1 for r in rows)
    # feasibility is monotone once reached (smaller n required)
    feas = [r.feasible_now for r in rows]
    assert feas == sorted(feas)


def test_shewhart_output_shape_and_ranking(spark, sf_dir):
    rows = queries()["orders_shewhart_control"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    devs = [r.dev_ratio_ppm for r in rows if r.dev_ratio_ppm is not None]
    assert devs == sorted(devs, reverse=True)
    for r in rows:
        assert r.breach in (0, 1)
        # dev_ratio_ppm = num div (den div 1e6) floor-quantizes the
        # DENOMINATOR, so it only ever overshoots num/den: the sound
        # implication is breach => ratio >= 1e6 (num > den => num
        # divided by something <= den/1e6 clears a million). The
        # forward direction (ratio > 1e6 => breach) is NOT a theorem —
        # a near-breach day can overshoot past 1e6 purely from the
        # quantization — so it is deliberately not asserted.
        if r.breach == 1:
            assert r.dev_ratio_ppm is not None
            assert r.dev_ratio_ppm >= 1_000_000


def test_recall_by_label_covers_every_label(spark, sf_dir):
    from maap_data_pipelines_spark.sources.catalog import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    n_labels = emb.select("label").distinct().count()
    rows = queries()["ann_recall_by_label"](spark, sf_dir).collect()
    assert len(rows) == n_labels
    for r in rows:
        assert r.n_queries == 3
        assert 0 <= r.recall_ppm <= 1_000_000
        assert r.n_hits <= r.n_queries * 5


def test_holt_winters_warmup_and_forecast_identity(spark, sf_dir):
    from pyspark.sql.window import Window

    df = queries()["events_holt_winters"](spark, sf_dir)
    rows = df.collect()
    assert rows
    # warmup contract: first 7 days per type fit exactly, no trend/season
    w = Window.partitionBy("event_type").orderBy("day_us")
    first7 = (
        df.withColumn("rn", F.row_number().over(w)).filter("rn <= 7").collect()
    )
    for r in first7:
        assert (r.level, r.trend, r.seasonal) == (r.n_events, 0, 0)
    # the seasonal component must actually engage after warmup
    assert any(r.seasonal != 0 for r in rows)
    # forecast identity: level + trend + seasonal-lag-6 (default 0)
    lagged = (
        df.withColumn("sl", F.lag("seasonal", 6, 0).over(w)).collect()
    )
    for r in lagged:
        assert r.forecast_next == r.level + r.trend + r.sl


def test_nb_calibration_deciles_consistent_with_argmax(spark, sf_dir):
    from maap_data_pipelines_spark.sources.catalog import read_table

    n_docs = read_table(spark, sf_dir, "documents").count()
    rows = queries()["quality_nb_calibration"](spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.conf_decile <= 9
        assert 0 <= r.observed_keep_ppm <= 1_000_000
        # decile >= 6 implies lhs > rhs (pred 1); decile <= 4 implies
        # rhs > lhs (pred 0) -- a theorem of the product bucketing
        if r.conf_decile >= 6:
            assert r.n_pred_keep == r.n_docs
        if r.conf_decile <= 4:
            assert r.n_pred_keep == 0


def test_backlog_aging_shares_and_anchor(spark, sf_dir):
    rows = queries()["orders_backlog_aging"](spark, sf_dir).collect()
    assert rows
    assert all(0 <= r.age_bucket <= 12 for r in rows)
    # shares sum to ~1e6: floor division loses up to n_buckets ppm low,
    # and the quantized denominator (total div 1e6) overshoots by up to
    # ~1e6/total relative -- a few hundred ppm at the smallest SF
    s = sum(r.value_share_ppm for r in rows)
    assert 1_000_000 - len(rows) <= s <= 1_000_000 + 512
    assert all(r.n_orders > 0 and r.value_cents > 0 for r in rows)


def test_centroid_balance_covers_corpus(spark, sf_dir):
    from maap_data_pipelines_spark.sources.catalog import read_table

    n = read_table(spark, sf_dir, "embeddings").count()
    rows = queries()["ann_centroid_balance"](spark, sf_dir).collect()
    assert sum(r.n_vecs for r in rows) == n
    for r in rows:
        assert 0 <= r.cell <= 15
        # hot flag consistency with the cross-multiplication rule
        assert r.hot == (1 if r.n_vecs * 16 > 2 * n else 0)
