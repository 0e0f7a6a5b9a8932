"""Behavioral pins for the round-2 analytics additions."""

from __future__ import annotations

from maap_data_pipelines_spark import registry


def test_asof_attribution_picks_last_prior_click(spark, sf_dir):
    rows = registry.queries()["events_asof_attribution"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.last_click_us is not None:
            assert r.last_click_us < r.purchase_us
            assert r.latency_us == r.purchase_us - r.last_click_us


def test_multigrain_totals_consistent(spark, sf_dir):
    rows = registry.queries()["events_rollup_multigrain"](spark, sf_dir).collect()
    total = [r for r in rows if r.grain == 3]
    finest = [r for r in rows if r.grain == 0]
    assert len(total) == 1
    assert total[0].n_events == sum(r.n_events for r in finest)
    assert total[0].value_cents == sum(r.value_cents for r in finest)


def test_ivf_subset_of_cell_and_ranked(spark, sf_dir):
    out = registry.queries()["ann_ivf_topk"](spark, sf_dir).collect()
    assert out
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_running_revenue_monotone_per_customer(spark, sf_dir):
    rows = registry.queries()["orders_running_revenue"](spark, sf_dir).collect()
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    some = 0
    for rs in by_cust.values():
        rs.sort(key=lambda r: (r.order_date, r.o_orderkey))
        run = 0
        for r in rs:
            run += r.price_cents
            assert r.running_cents == run
        some += 1
    assert some > 0


def test_events_dau_wau_window(spark, sf_dir):
    # WAU on day D counts users active in [D-6, D]; stickiness = dau/wau
    from maap_data_pipelines_spark.plans.events import events_dau_wau

    rows = {r.day: r for r in events_dau_wau(spark, sf_dir).collect()}
    assert rows  # non-degenerate
    for r in rows.values():
        assert 0 < r.dau <= r.wau
        assert abs(r.stickiness - round(r.dau / r.wau, 6)) < 1e-9
