"""Declarative stage orchestration: retry/catch parity with the reference
state machine (deploy/cdk/step_function_stack.py add_retry semantics)."""

from __future__ import annotations

import pytest

from maap_data_pipelines_spark.pipelines import Stage, run_stages


class Flaky:
    """Raises the given errors in order, then succeeds returning updates."""

    def __init__(self, errors, result=None):
        self.errors = list(errors)
        self.result = result or {}
        self.calls = 0

    def __call__(self, ctx):
        self.calls += 1
        if self.errors:
            raise self.errors.pop(0)
        return self.result


def test_retry_succeeds_with_exponential_backoff():
    slept = []
    fn = Flaky([IOError("t1"), IOError("t2")], {"out": 42})
    ctx, receipts = run_stages(
        [Stage("discover", fn, max_attempts=5, interval_seconds=2.0)],
        sleep=slept.append,
    )
    assert ctx == {"out": 42}
    assert fn.calls == 3
    # reference add_retry(interval=2s) with default backoff_rate 2.0
    assert slept == [2.0, 4.0]
    assert [(r["status"], r["attempt"]) for r in receipts] == [
        ("retried", 1), ("retried", 2), ("ok", 3),
    ]


def test_error_type_filter_skips_retry():
    """add_retry(errors=[...]) parity: only matching errors retry."""
    fn = Flaky([ValueError("not transient")])
    with pytest.raises(ValueError):
        run_stages(
            [Stage("build", fn, max_attempts=5, retry_on=(IOError,))],
            sleep=lambda s: None,
        )
    assert fn.calls == 1  # no retry for a non-matching error


def test_exhausted_fail_raises_and_records():
    fn = Flaky([IOError("a"), IOError("b")])
    receipts_seen = []
    with pytest.raises(IOError):
        run_stages(
            [Stage("submit", fn, max_attempts=2)],
            sleep=lambda s: None,
        )
    assert fn.calls == 2


def test_exhausted_skip_routes_and_continues():
    """The Catch-route analogue: failure becomes a receipt, DAG continues."""
    bad = Flaky([IOError("down")] * 3)
    good = Flaky([], {"done": True})
    ctx, receipts = run_stages(
        [
            Stage("transfer", bad, max_attempts=3, on_exhausted="skip"),
            Stage("report", good),
        ],
        sleep=lambda s: None,
    )
    assert ctx == {"done": True}
    statuses = [(r["stage"], r["status"]) for r in receipts]
    assert statuses == [
        ("transfer", "retried"), ("transfer", "retried"),
        ("transfer", "failed"), ("report", "ok"),
    ]
    assert receipts[2]["error"] and "down" in receipts[2]["error"]


def test_ctx_threads_through_stages():
    ctx, _ = run_stages(
        [
            Stage("a", lambda c: {"x": 1}),
            Stage("b", lambda c: {"y": c["x"] + 1}),
            Stage("c", lambda c: None),  # stages may return nothing
        ]
    )
    assert ctx == {"x": 1, "y": 2}


def test_receipts_land_as_dataframe(spark):
    """Receipts are plain rows — the orchestration history is data."""
    _, receipts = run_stages(
        [Stage("only", lambda c: {})], sleep=lambda s: None
    )
    df = spark.createDataFrame(
        receipts, "stage string, attempt long, status string, error string"
    )
    assert df.count() == 1
    assert set(df.columns) >= {"stage", "attempt", "status"}
