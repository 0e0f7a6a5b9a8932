"""CMR HTTP paging client: multi-page stub-transport sessions.

Parity target: lambdas/cmr-query/handler.py:104-151 (endpoint shape,
CMR-Hits paging decision, feed.entry extraction).
"""

from __future__ import annotations

import json

import pytest

from maap_data_pipelines_spark.sources import cmr

S3REL = "http://esipfed.org/ns/fedsearch/1.1/s3#"
N_GRANULES = 25
PAGE = 10


def _granule(i: int) -> dict:
    return {
        "id": f"G{i:03d}",
        "links": [{"rel": S3REL, "href": f"s3://store/coll/g{i:03d}.tif"}],
    }


class StubTransport:
    """Serves N_GRANULES granules in PAGE-sized pages; logs every URL."""

    def __init__(self, n=N_GRANULES, fail_page=None):
        self.n = n
        self.fail_page = fail_page
        self.calls = []

    def __call__(self, url: str):
        self.calls.append(url)
        qs = dict(p.split("=") for p in url.split("?")[1].split("&"))
        page, limit = int(qs["page_num"]), int(qs["page_size"])
        if self.fail_page == page:
            return 503, {}, "upstream sad"
        lo, hi = (page - 1) * limit, min(page * limit, self.n)
        body = json.dumps(
            {"feed": {"entry": [_granule(i) for i in range(lo, hi)]}}
        )
        return 200, {"CMR-Hits": str(self.n)}, body


EVENT = {"collection": "DemoColl", "version": "2", "limit": PAGE}


def test_search_url_matches_reference_shape():
    url = cmr.granules_search_url(
        {**EVENT, "temporal": ["2016-02-25T00:00:00Z", "2016-03-08T00:00:00Z"]},
        page=3,
        limit=50,
    )
    assert url == (
        "https://cmr.maap-project.org/search/granules.json"
        "?short_name=DemoColl&version=2"
        "&temporal[]=2016-02-25T00:00:00Z,2016-03-08T00:00:00Z"
        "&page_size=50&page_num=3"
    )


def test_serial_page_loop_fetches_all_pages():
    t = StubTransport()
    entries = cmr.fetch_granules(EVENT, t)
    assert [e["id"] for e in entries] == [f"G{i:03d}" for i in range(N_GRANULES)]
    assert len(t.calls) == 3  # 25 granules / 10 per page
    assert "page_num=3" in t.calls[-1]


def test_start_after_resumes_midway():
    t = StubTransport()
    entries = cmr.fetch_granules({**EVENT, "start_after": 3}, t)
    # page 3 holds the tail; hits (25) <= limit*page (30) stops the loop
    assert [e["id"] for e in entries] == ["G020", "G021", "G022", "G023", "G024"]
    assert len(t.calls) == 1


def test_non_200_raises():
    with pytest.raises(RuntimeError, match="503"):
        cmr.fetch_granules(EVENT, StubTransport(fail_page=2))


def test_distributed_fetch_matches_serial(spark):
    """The scale path must return the same granules as the Lambda-parity
    serial loop — and only page 1 may cross the driver (pages 2..N are
    fetched executor-side and land straight in spark.read.json's RDD)."""
    serial = cmr.read_cmr_granules(spark, EVENT, StubTransport())

    # self-contained closure: executors can't import the test module, and
    # cloudpickle serializes closures (with captured locals) by value
    n, s3rel = N_GRANULES, S3REL

    def transport(url: str):
        import json as _j

        qs = dict(p.split("=") for p in url.split("?")[1].split("&"))
        page, limit = int(qs["page_num"]), int(qs["page_size"])
        lo, hi = (page - 1) * limit, min(page * limit, n)
        entries = [
            {
                "id": f"G{i:03d}",
                "links": [
                    {"rel": s3rel, "href": f"s3://store/coll/g{i:03d}.tif"}
                ],
            }
            for i in range(lo, hi)
        ]
        return 200, {"CMR-Hits": str(n)}, _j.dumps({"feed": {"entry": entries}})

    dist = cmr.read_cmr_granules(spark, EVENT, transport, distributed=True)
    # page order is not preserved distributed — compare as sets of rows
    assert sorted(dist.toJSON().collect()) == sorted(serial.toJSON().collect())


def test_distributed_path_has_no_driver_collect():
    """Scale pin: the distributed branch must never materialize granule
    JSON on the driver — read_cmr_granules feeds spark.read.json an RDD."""
    import inspect

    src = inspect.getsource(cmr)
    assert ".collect()" not in src


def test_http_discovery_feeds_cmr_event_adapter(spark):
    """2+ pages through the stub transport into the file_obj frame."""
    t = StubTransport()
    rows = cmr.cmr_http_discovery(spark, EVENT, t).collect()
    assert len(t.calls) == 3
    assert len(rows) == N_GRANULES
    byid = {r.granule_id: r for r in rows}
    assert byid["G007"].remote_fileurl == "s3://store/coll/g007.tif"
    assert byid["G007"].collection == "DemoColl"
    # same frame shape as the fixture-driven path: last-link-wins picker
    # and asset passthrough both apply downstream
    assert rows[0].id == rows[0].granule_id


def test_empty_feed_returns_empty_frame(spark):
    df = cmr.read_cmr_granules(spark, EVENT, StubTransport(n=0))
    assert df.count() == 0
