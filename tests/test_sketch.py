"""Misra-Gries heavy hitters: exactness and partitioning-independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from maap_data_pipelines_spark import registry
from maap_data_pipelines_spark.operators.sketch import HH_K, heavy_hitters


def _exact(spark, docs):
    terms = docs.select(F.explode(F.split(F.lower("text"), " ")).alias("term"))
    total = terms.count()
    return {
        (r.term, r.n_occurrences, total)
        for r in terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") * HH_K > total)
        .collect()
    }


def test_heavy_hitters_exact_and_partition_independent(spark):
    # skewed corpus: 'hot' dominates, 'warm' sits just above threshold,
    # long tail of unique terms fills the MG counters with noise
    rows = []
    for i in range(400):
        rows.append((i, "hot hot warm tail%d tail%d" % (2 * i, 2 * i + 1)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    expected = _exact(spark, docs)
    assert expected  # non-degenerate: 'hot' (800/2000) and 'warm' (400/2000)
    terms = {t for t, _, _ in expected}
    assert {"hot", "warm"} <= terms

    for nparts in (1, 3, 16):
        got = {
            (r.term, r.n_occurrences, r.total)
            for r in heavy_hitters(docs.repartition(nparts)).collect()
        }
        assert got == expected, f"partitioning changed the result at {nparts}"


def test_heavy_hitters_share_and_registry(spark, sf_dir):
    rows = registry.queries()["heavy_hitters"](spark, sf_dir).collect()
    assert rows  # the synthetic corpus has common words above 1/200
    for r in rows:
        assert r.n_occurrences * HH_K > r.total
        assert abs(r.share - round(r.n_occurrences / r.total, 6)) < 1e-9


def test_bloom_filter_no_false_negatives(spark, sf_dir):
    r = registry.queries()["bloom_customer_filter"](spark, sf_dir).collect()[0]
    assert r.n_probed > 0
    assert r.n_false_negative == 0  # Bloom's hard guarantee
    assert r.n_maybe == r.n_true + r.n_false_positive
    assert r.n_true <= r.n_maybe <= r.n_probed
    # 131072 bits / 3 hashes: fp rate should be tiny at sf test sizes
    assert r.n_false_positive <= max(1, r.n_probed // 20)


def test_bloom_membership_synthetic_accuracy(spark):
    from maap_data_pipelines_spark.operators.sketch import bloom_membership

    build = spark.createDataFrame([(i,) for i in range(500)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(250, 1000)], "k long")
    r = bloom_membership(build, "k", probe, "k").collect()[0]
    assert r.n_probed == 750
    assert r.n_true == 250
    assert r.n_false_negative == 0
    assert r.n_maybe >= 250  # every true member flagged maybe


def test_cms_one_sided_guarantee_and_exactness(spark, sf_dir):
    """CMS point estimates: never under-count (collisions only add), and
    at test cardinalities (~thousands of keys into 4x1024 cells) the min
    across 4 rows should usually land on an uncollided cell."""
    rows = registry.queries()["events_cms_topk"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.overcount >= 0  # the deterministic CMS guarantee
        assert r.cms_estimate == r.exact_count + r.overcount
    # the top keys by exact count are heavy; estimates stay proportional
    assert all(r.cms_estimate <= 2 * r.exact_count + 200 for r in rows)


def test_cms_synthetic_counts(spark):
    """Skewed synthetic stream: the heavy key's estimate is exact unless
    a (deterministic) collision adds mass — and the report ranks by
    exact count with deterministic ties."""
    from maap_data_pipelines_spark.operators.sketch import cms_frequency

    rows = [(1,)] * 100 + [(2,)] * 50 + [(k,) for k in range(3, 33)]
    df = spark.createDataFrame(rows, "user_id long")
    got = {r.user_id: r for r in cms_frequency(df, "user_id", topk=5).collect()}
    assert got[1].exact_count == 100 and got[1].overcount >= 0
    assert got[2].exact_count == 50
    assert len(got) == 5


def test_theta_overlap_exact_regime_and_inclusion_exclusion(spark):
    """Crafted segments below K: the KMV sketch holds every member, so
    every estimate must equal the exact count; inclusion-exclusion must
    recover the intersection exactly."""
    import pyspark.sql.functions as F

    from maap_data_pipelines_spark.operators.sketch import (
        THETA_MIN_EVENTS,
        theta_overlap,
    )

    # users 1-30 in segment A only, 21-50 in B: overlap = 10 users.
    rows = []
    for u in range(1, 31):
        rows += [(u, "a")] * THETA_MIN_EVENTS
    for u in range(21, 51):
        rows += [(u, "b")] * THETA_MIN_EVENTS
    # user 99 has too few events of either type -> member of none
    rows += [(99, "a")] * (THETA_MIN_EVENTS - 1)
    ev = spark.createDataFrame(rows, ["user_id", "event_type"])
    out = theta_overlap(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.type_a, r.type_b) == ("a", "b")
    assert (r.exact_a, r.exact_b, r.exact_inter, r.exact_union) == (30, 30, 10, 50)
    # below-K regime: estimates ARE the exact counts
    assert (r.est_a, r.est_b, r.est_union, r.est_inter) == (30, 30, 50, 10)
    assert r.union_within_15pct and r.inter_within_20pct_of_union


def test_theta_overlap_estimation_regime_bounds(spark, sf_dir):
    """On real data the flags are the enforcement surface: every pair's
    union estimate within 15% and intersection within 20% of the union
    (exactly what the oracle pins as literal TRUE)."""
    from maap_data_pipelines_spark import registry

    rows = registry.queries()["events_theta_overlap"](spark, sf_dir).collect()
    assert rows
    assert all(r.union_within_15pct for r in rows)
    assert all(r.inter_within_20pct_of_union for r in rows)
