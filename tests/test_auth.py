"""OAuth2 client-credentials token seam: stub-transport protocol pins.

Parity target: lambdas/submit-stac/handler.py:40-76 (Cognito
client-credentials token fetch + bearer-authed submission) and
scripts/api.py:67-82 — re-expressed as pure RFC 6749 semantics with
injectable HTTP. No network anywhere in these tests.
"""

from __future__ import annotations

import base64
import json
import urllib.parse

import pytest

from maap_data_pipelines_spark import sinks
from maap_data_pipelines_spark.auth import (
    ClientCredentialsTokenProvider,
    make_authed_crud_transport,
    make_authed_submit_transport,
)

TOKEN_URL = "https://auth.example.com/oauth2/token"


class StubHttp:
    """Records every request; serves tokens and API responses."""

    def __init__(self, api_status=200):
        self.calls = []
        self.api_status = api_status
        self.tokens_issued = 0
        self.expired = set()  # tokens that now 401

    def __call__(self, method, url, headers, body):
        self.calls.append((method, url, dict(headers), body))
        if url == TOKEN_URL:
            self.tokens_issued += 1
            return 200, json.dumps(
                {
                    "access_token": f"tok{self.tokens_issued}",
                    "expires_in": 3600,
                    "token_type": "Bearer",
                }
            )
        auth = headers.get("Authorization", "")
        if auth.split(" ")[-1] in self.expired:
            return 401, "expired"
        return self.api_status, "{}"


def _provider(http, **kw):
    return ClientCredentialsTokenProvider(
        TOKEN_URL, "client-abc", "s3cret", "ingest/write", http, **kw
    )


def test_token_request_matches_reference_protocol():
    http = StubHttp()
    p = _provider(http)
    assert p.token() == "tok1"
    method, url, headers, body = http.calls[0]
    assert (method, url) == ("POST", TOKEN_URL)
    # HTTP Basic client auth, exactly the reference's auth=(id, secret)
    expect = base64.b64encode(b"client-abc:s3cret").decode()
    assert headers["Authorization"] == f"Basic {expect}"
    assert headers["Content-Type"] == "application/x-www-form-urlencoded"
    parsed = dict(urllib.parse.parse_qsl(body))
    assert parsed == {
        "grant_type": "client_credentials",
        "scope": "ingest/write",
    }


def test_token_cached_until_expiry_then_refetched():
    now = [1000.0]
    http = StubHttp()
    p = _provider(http, clock=lambda: now[0], skew_seconds=60)
    assert p.token() == "tok1"
    assert p.token() == "tok1"  # cached — no second fetch
    assert http.tokens_issued == 1
    now[0] += 3600 - 59  # inside the skew margin -> treated as expired
    assert p.token() == "tok2"
    assert http.tokens_issued == 2


def test_token_endpoint_failure_raises():
    def http(method, url, headers, body):
        return 503, "down"

    with pytest.raises(RuntimeError, match="503"):
        _provider(http).token()


def test_crud_transport_sends_bearer_and_refreshes_on_401():
    http = StubHttp()
    p = _provider(http)
    t = make_authed_crud_transport(p, "", http)
    assert t("POST", "https://api/items", "{}") == 200
    assert http.calls[-1][2]["Authorization"] == "bearer tok1"
    # expire tok1 server-side: next call 401s, transport must fetch tok2
    # and retry ONCE, surfacing the retried status
    http.expired.add("tok1")
    assert t("PUT", "https://api/items/x", "{}") == 200
    assert http.calls[-1][2]["Authorization"] == "bearer tok2"
    assert http.tokens_issued == 2
    # a 401 that persists after refresh is returned, not retried forever
    http.expired.update({"tok2", "tok3"})
    assert t("DELETE", "https://api/items/x", None) == 401
    assert http.tokens_issued == 3


def test_submit_transport_batches_as_json_array():
    http = StubHttp()
    p = _provider(http)
    t = make_authed_submit_transport(p, http)
    assert t(['{"id":"a"}', '{"id":"b"}'], "https://api/ingestions") == 200
    method, url, headers, body = http.calls[-1]
    assert (method, url) == ("POST", "https://api/ingestions")
    assert headers["Authorization"] == "bearer tok1"
    assert json.loads(body) == [{"id": "a"}, {"id": "b"}]


def test_submit_items_through_authed_transport(spark):
    """End-to-end: executor-side token fetch + authed batch submit.

    The provider and stub are picklable closures — each executor
    partition fetches its own token (documented seam behavior) and every
    batch POST carries it.
    """

    def http(method, url, headers, body):
        if url == TOKEN_URL:
            return 200, json.dumps({"access_token": "tokX", "expires_in": 60})
        return (200 if headers.get("Authorization") == "bearer tokX" else 403), ""

    p = _provider(http)
    items = spark.createDataFrame(
        [(f"i{n}", json.dumps({"id": f"i{n}"})) for n in range(7)],
        "item_id string, item_json string",
    )
    receipts = sinks.submit_items(
        items,
        endpoint="https://api/ingestions",
        batch_size=3,
        transport=make_authed_submit_transport(p, http),
    )
    rows = receipts.collect()
    assert len(rows) == 7
    assert {r.status for r in rows} == {200}  # every batch was authed
