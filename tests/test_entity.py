"""Entity resolution: blocking completeness, clustering, canonical pick."""

from pyspark.sql import functions as F

from maap_data_pipelines_spark.operators.entity import (
    er_dirty_records,
    er_match_pairs,
    resolve_entities,
)
from maap_data_pipelines_spark.plans.etl import customer_entity_resolution
from maap_data_pipelines_spark.sources.catalog import read_table


def test_blocking_complete_for_every_deletion_position(spark, sf_dir):
    """Every twin must be matched to its base, for ALL deletion positions.

    custkey % 16 cycles through all 16 positions at any SF >= a few
    hundred customers, so this exercises both the prefix-key and
    suffix-key rescue paths of the two-key blocking scheme.
    """
    cust = read_table(spark, sf_dir, "customer")
    recs = er_dirty_records(cust)
    pairs = er_match_pairs(recs)
    n_twins = cust.filter(F.col("c_custkey") % 3 == 0).count()
    # positions covered: ensure both p<=4 (suffix rescue) and p>4 occur
    pos = {
        r[0]
        for r in cust.filter(F.col("c_custkey") % 3 == 0)
        .select((F.col("c_custkey") % 16).cast("int"))
        .distinct()
        .collect()
    }
    assert any(p <= 3 for p in pos) and any(p > 3 for p in pos)
    got = {(r.rec_a, r.rec_b) for r in pairs.collect()}
    want = {
        (k * 2, k * 2 + 1)
        for (k,) in cust.filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey")
        .collect()
    }
    # exactly the base<->twin pairs: complete (no missed twin) and exact
    # (unique case-folded names admit no false positives)
    assert got == want
    assert len(got) == n_twins


def test_resolution_clusters_and_canonical(spark, sf_dir):
    out = customer_entity_resolution(spark, sf_dir).cache()
    cust = read_table(spark, sf_dir, "customer")
    n_cust = cust.count()
    n_twins = cust.filter(F.col("c_custkey") % 3 == 0).count()
    assert out.count() == n_cust + n_twins
    # every twin resolves into its base's entity (size 2, canonical=base)
    two = out.filter(F.col("n_records") == 2)
    assert two.count() == 2 * n_twins
    bad = two.filter(
        (F.col("entity_id") % 2 != 0)
        | (F.col("is_canonical") != (F.col("rec_id") == F.col("entity_id")))
    )
    assert bad.count() == 0
    # untouched customers stay singletons and self-canonical
    ones = out.filter(F.col("n_records") == 1)
    assert ones.count() == n_cust - n_twins
    assert ones.filter(~F.col("is_canonical")).count() == 0
    # exactly one canonical per entity
    per = out.groupBy("entity_id").agg(
        F.sum(F.col("is_canonical").cast("long")).alias("n_canon")
    )
    assert per.filter(F.col("n_canon") != 1).count() == 0
    out.unpersist()


def test_no_cartesian_in_er_plan(spark, sf_dir):
    plan = customer_entity_resolution(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
