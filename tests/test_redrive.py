"""Failed-submission retry queue (the DLQ / re-drive analogue).

Reference semantics mirrored: deploy/cdk/queue_stack.py:25-55 —
dead-letter queues with max_receive_count, and
report_batch_item_failures=True (per-item failure reporting so one bad
item doesn't force a whole-batch retry).
"""

import pytest

from maap_data_pipelines_spark.redrive import redrive, submit_with_retry_queue
from maap_data_pipelines_spark.sinks import submit_items
from maap_data_pipelines_spark.table import VersionedTable


def _items(spark, n=5):
    rows = [(f"it{i}", f'{{"id": "it{i}"}}' if i % 2 == 0 else f'{{"id": "it{i}", "poison": true}}') for i in range(n)]
    return spark.createDataFrame(rows, "item_id string, item_json string")


# Transports are built by factories so each test closes over a fresh
# function object: cloudpickle serializes closures BY VALUE, while a
# test-module-level function would pickle by reference and fail to
# import on executors (test files are not on the worker PYTHONPATH).
def _per_item_poison_transport():
    # per-item statuses: the report_batch_item_failures shape
    return lambda payload, endpoint: [
        500 if "poison" in doc else 200 for doc in payload
    ]


def _all_ok_transport():
    return lambda payload, endpoint: 200


def _all_fail_transport():
    return lambda payload, endpoint: 503


def test_submit_items_per_item_statuses(spark):
    receipts = submit_items(
        _items(spark),
        "https://ingest.example/items",
        transport=_per_item_poison_transport(),
    )
    got = {r.item_id: r.status for r in receipts.collect()}
    assert got == {"it0": 200, "it1": 500, "it2": 200, "it3": 500, "it4": 200}


def test_submit_items_per_item_length_mismatch_raises(spark):
    def bad(payload, endpoint):
        return [200]  # wrong arity

    with pytest.raises(Exception, match="statuses"):
        submit_items(
            _items(spark), "e", transport=bad, batch_size=100
        ).collect()


def test_redrive_submits_exactly_the_failures(spark, tmp_path):
    """Transport fails N items once; re-drive submits exactly those N and
    the receipts reconcile (queue drains, nothing else re-sent)."""
    queue = VersionedTable(str(tmp_path / "retry_queue"))
    dlq = VersionedTable(str(tmp_path / "dlq"))
    items = _items(spark)  # 5 items, 2 poison

    receipts = submit_with_retry_queue(
        items, "e", queue, transport=_per_item_poison_transport()
    )
    assert receipts.count() == 5
    queued = {r.item_id: r.attempts for r in queue.read(spark).collect()}
    assert queued == {"it1": 1, "it3": 1}

    # enqueue is idempotent by receipt identity: same submission again
    submit_with_retry_queue(items, "e", queue, transport=_per_item_poison_transport())
    assert queue.read(spark).count() == 2

    # re-drive with a healthy transport: exactly the 2 failures re-sent
    rd = redrive(spark, queue, "e", dlq, transport=_all_ok_transport())
    got = {r.item_id: r.status for r in rd.collect()}
    assert got == {"it1": 200, "it3": 200}
    assert queue.read(spark).isEmpty()
    assert dlq.latest_version() is None  # nothing exhausted

    # a further re-drive on the drained queue touches nothing
    assert redrive(spark, queue, "e", dlq, transport=_all_fail_transport()).isEmpty()


def test_redrive_exhaustion_moves_to_dead_letter(spark, tmp_path):
    queue = VersionedTable(str(tmp_path / "q"))
    dlq = VersionedTable(str(tmp_path / "d"))
    items = spark.createDataFrame(
        [("a", "{}"), ("b", "{}")], "item_id string, item_json string"
    )
    submit_with_retry_queue(items, "e", queue, transport=_all_fail_transport())
    # max_receive_count=3: attempt 1 recorded at enqueue; two failing
    # re-drives reach 3 -> DLQ hop
    redrive(spark, queue, "e", dlq, max_receive_count=3, transport=_all_fail_transport())
    assert {r.attempts for r in queue.read(spark).collect()} == {2}
    redrive(spark, queue, "e", dlq, max_receive_count=3, transport=_all_fail_transport())
    assert queue.read(spark).isEmpty()
    dead = {r.item_id: r.attempts for r in dlq.read(spark).collect()}
    assert dead == {"a": 3, "b": 3}

    # DLQ upsert is idempotent by item_id: a fresh failure cycle for the
    # same item never duplicates its dead-letter row
    submit_with_retry_queue(items, "e", queue, transport=_all_fail_transport())
    redrive(spark, queue, "e", dlq, max_receive_count=2, transport=_all_fail_transport())
    assert dlq.read(spark).count() == 2


def test_redrive_partial_then_recovers(spark, tmp_path):
    """Mixed outcome on re-drive: recovered rows leave, still-failing rows
    stay with bumped attempts."""
    queue = VersionedTable(str(tmp_path / "q"))
    dlq = VersionedTable(str(tmp_path / "d"))
    items = _items(spark)
    submit_with_retry_queue(items, "e", queue, transport=_per_item_poison_transport())

    def heal_it1(payload, endpoint):
        return [200 if '"it1"' in doc else 500 for doc in payload]

    rd = redrive(spark, queue, "e", dlq, max_receive_count=5, transport=heal_it1)
    got = {r.item_id: r.status for r in rd.collect()}
    assert set(got) == {"it1", "it3"}
    left = {r.item_id: r.attempts for r in queue.read(spark).collect()}
    assert left == {"it3": 2}
    assert dlq.latest_version() is None


def test_dry_run_never_enqueues(spark, tmp_path):
    """Status 0 (planned, not sent) is not a failure: audit mode leaves
    the retry queue untouched."""
    queue = VersionedTable(str(tmp_path / "q"))
    receipts = submit_with_retry_queue(
        _items(spark), "e", queue, transport=_all_fail_transport(), dry_run=True
    )
    assert {r.status for r in receipts.collect()} == {0}
    assert queue.latest_version() is None or queue.read(spark).isEmpty()


def _logging_transport(log_path, poison_status=500):
    # appends each submitted doc to a file: executor-side evidence of how
    # many times the transport actually ran (local[...] shares the FS)
    def t(payload, endpoint):
        with open(log_path, "a") as f:
            f.writelines(doc + "\n" for doc in payload)
        return [poison_status if "poison" in doc else 200 for doc in payload]

    return t


def test_transport_runs_exactly_once_per_item(spark, tmp_path):
    """The receipts plan embeds a side-effecting transport; it must be
    materialized exactly once. Both submit paths take multiple actions on
    receipt-derived frames (failure join, queue/DLQ commits) AND return
    the frame to the caller — without the eager checkpoint each action
    re-submits every pending item (duplicate deliveries, and a transition
    based on different statuses than the caller sees)."""
    queue = VersionedTable(str(tmp_path / "q"))
    dlq = VersionedTable(str(tmp_path / "d"))
    items = _items(spark)  # 5 items, 2 poison

    log1 = tmp_path / "sent_submit.log"
    receipts = submit_with_retry_queue(
        items, "e", queue, transport=_logging_transport(str(log1))
    )
    receipts.count()
    receipts.collect()  # caller consumes the returned frame repeatedly
    sent = log1.read_text().splitlines()
    assert len(sent) == 5 and len(set(sent)) == 5

    log2 = tmp_path / "sent_redrive.log"
    rd = redrive(
        spark, queue, "e", dlq, transport=_logging_transport(str(log2), 200)
    )
    rd.count()
    assert {r.item_id: r.status for r in rd.collect()} == {"it1": 200, "it3": 200}
    resent = log2.read_text().splitlines()
    assert len(resent) == 2 and len(set(resent)) == 2
