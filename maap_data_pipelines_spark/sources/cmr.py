"""CMR granule-search client: HTTP page loop with injectable transport.

Parity: `lambdas/cmr-query/handler.py:104-151` — endpoint construction
(``get_cmr_granules_endpoint``: event['cmr_api_url'] > CMR_API_URL env >
default host, then ``/search/granules.json`` with short_name, version,
temporal[], page_size, page_num) and the paging decision (continue while
the page returned granules AND ``CMR-Hits`` exceeds ``page_size * page``).

What changes Spark-side: the reference fetches ONE page per Lambda
invocation and re-enters itself via ``start_after`` through Step
Functions; here the page loop runs to completion in-process, and the
scale path fetches the remaining pages as one distributed map over page
numbers (page 1 reveals ``CMR-Hits``, which fixes the page count — every
later page is independent, so a 10^6-granule collection pages across
executors instead of through a serial re-invocation chain).

Transport is injectable exactly like ``sinks.submit_items``: a callable
``(url) -> (status_code, headers, body_text)``. Tests drive multi-page
sessions through a stub; production wires urllib/requests in one line.
No network code runs at import or plan-build time.
"""

from __future__ import annotations

import json
import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

DEFAULT_CMR_API_URL = "https://cmr.maap-project.org"
DEFAULT_TEMPORAL = ("1000-01-01T00:00:00Z", "3000-01-01T23:59:59Z")
DEFAULT_PAGE_SIZE = 100

Transport = Callable[[str], tuple[int, dict, str]]


def granules_search_url(event: dict, page: int, limit: int) -> str:
    """The reference's exact search URL for one page (handler.py:104-130)."""
    api = event.get("cmr_api_url", DEFAULT_CMR_API_URL)
    temporal = event.get("temporal", list(DEFAULT_TEMPORAL))
    return (
        f"{api}/search/granules.json?short_name={event['collection']}"
        f"&version={event['version']}"
        f"&temporal[]={temporal[0]},{temporal[1]}"
        f"&page_size={limit}&page_num={page}"
    )


def _page_entries(status: int, body: str, url: str) -> list[dict]:
    if status != 200:
        # the reference logs and returns None (dropping the run); failing
        # loudly mid-loop is the batch-engine equivalent
        raise RuntimeError(f"CMR returned {status} for {url}")
    return json.loads(body)["feed"]["entry"]


def fetch_granules(event: dict, transport: Transport) -> list[dict]:
    """Serial page loop (the reference-parity twin): every granule entry,
    in page order, on the driver.

    ``start_after``/``limit`` keep their reference meanings (first page,
    page size). For large collections use
    ``read_cmr_granules(distributed=True)`` — granule JSON never
    round-trips through the driver there.
    """
    first_page = event.get("start_after", 1)
    limit = event.get("limit", DEFAULT_PAGE_SIZE)

    url = granules_search_url(event, first_page, limit)
    status, headers, body = transport(url)
    entries = _page_entries(status, body, url)
    hits = int(headers.get("CMR-Hits", len(entries)))
    if not entries or hits <= limit * first_page:
        return entries

    last_page = math.ceil(hits / limit)
    out = list(entries)
    for p in range(first_page + 1, last_page + 1):
        u = granules_search_url(event, p, limit)
        s, _, b = transport(u)
        got = _page_entries(s, b, u)
        if not got:  # reference stop condition: an empty page ends it
            break
        out.extend(got)
    return out


def read_cmr_granules(
    spark: SparkSession,
    event: dict,
    transport: Transport,
    distributed: bool = False,
) -> DataFrame:
    """Fetch all pages and land ``feed.entry`` as a DataFrame.

    Schema-inferred exactly like ``spark.read.json`` over a granule dump,
    so the result drops into ``pipelines.discover_from_cmr_event``
    unchanged — the fixture-driven path and the HTTP path converge on the
    same frame.

    ``distributed=True`` is the scale path: only page 1 crosses the
    driver (its ``CMR-Hits`` header fixes the page count); pages 2..N are
    fetched executor-side and stay there as an RDD of JSON lines that
    ``spark.read.json`` consumes directly — at millions of granules no
    granule JSON ever aggregates in driver memory. Page order is not
    preserved (irrelevant downstream; the serial twin keeps it).
    """
    sc = spark.sparkContext
    if not distributed:
        lines = [json.dumps(e) for e in fetch_granules(event, transport)]
        if not lines:
            # empty feed -> empty frame with a null row filtered
            return spark.read.json(sc.parallelize(["{}"])).limit(0)
        return spark.read.json(sc.parallelize(lines))

    first_page = event.get("start_after", 1)
    limit = event.get("limit", DEFAULT_PAGE_SIZE)
    url = granules_search_url(event, first_page, limit)
    status, headers, body = transport(url)
    entries = _page_entries(status, body, url)
    hits = int(headers.get("CMR-Hits", len(entries)))
    page1 = [json.dumps(e) for e in entries]
    if not entries:
        return spark.read.json(sc.parallelize(["{}"])).limit(0)
    if hits <= limit * first_page:
        return spark.read.json(sc.parallelize(page1))

    last_page = math.ceil(hits / limit)
    pages = list(range(first_page + 1, last_page + 1))
    ev = dict(event)

    def _fetch(p: int) -> list[str]:
        u = granules_search_url(ev, p, limit)
        s, _, b = transport(u)
        return [json.dumps(e) for e in _page_entries(s, b, u)]

    rest = sc.parallelize(pages, min(len(pages), 256)).flatMap(_fetch)
    return spark.read.json(sc.parallelize(page1, 1).union(rest))


def cmr_http_discovery(
    spark: SparkSession,
    event: dict,
    transport: Transport,
    distributed: bool = False,
) -> DataFrame:
    """End-to-end reference cmr-query job: page loop -> file_obj frame."""
    from ..pipelines import discover_from_cmr_event

    granules = read_cmr_granules(spark, event, transport, distributed)
    return discover_from_cmr_event(spark, event, granules)
