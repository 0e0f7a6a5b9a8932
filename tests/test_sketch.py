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
