"""End-to-end runs of the two pipeline products (tmp-dir sinks)."""

from __future__ import annotations

from maap_data_pipelines_spark.pipelines import (
    run_curation_pipeline,
    run_stac_pipeline,
)


def test_stac_pipeline_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "stac_out")
    m = run_stac_pipeline(spark, sf_dir, out)
    assert m["n_items"] > 0
    assert m["n_submitted"] == m["n_items"]  # every item gets a receipt
    assert m["n_failed"] == 0
    assert m["n_transfers"] > 0
    # idempotent: rerun overwrites to the identical state
    m2 = run_stac_pipeline(spark, sf_dir, out)
    assert m2 == m


def test_curation_pipeline_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "cur_out")
    m = run_curation_pipeline(spark, sf_dir, out)
    assert m["n_in"] == m["n_kept"] + m["n_rejected"]
    assert 0 < m["n_kept"] < m["n_in"]  # cascade rejects some, not all
    # histogram reasons partition the corpus
    hist = {
        r.reason: r.n_docs
        for r in spark.read.parquet(out + "/rejections").collect()
    }
    assert sum(hist.values()) == m["n_in"]
    assert hist.get("ok", 0) == m["n_kept"]
    m2 = run_curation_pipeline(spark, sf_dir, out)
    assert m2 == m
