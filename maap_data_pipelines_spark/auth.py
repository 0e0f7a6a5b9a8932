"""OAuth2 client-credentials token seam for authed submission sinks.

Parity: ``lambdas/submit-stac/handler.py:40-76`` — the reference fetches
service credentials, POSTs ``{auth_domain}/oauth2/token`` with HTTP Basic
client auth and ``grant_type=client_credentials&scope=...``, then sends
``Authorization: bearer <access_token>`` on every ingestion request
(``scripts/api.py:67-82`` is the same shape against a local API). This
module re-expresses that as pure RFC 6749 §4.4 semantics with an
injectable HTTP transport, so:

- no secrets-manager / vendor dependency: the caller supplies
  ``client_id``/``client_secret`` (from whatever secret store they use);
- no network at import, plan-build, or test time: tests drive a stub
  transport; production wires urllib/requests in one line;
- the provider is a plain picklable object, so the authed transports
  below work inside ``mapInPandas`` executors — each executor fetches
  (and caches) its own token, refreshing on expiry or on a 401.

HTTP transport contract (one callable for everything):

    http(method: str, url: str, headers: dict, body: str | None)
        -> (status_code: int, body_text: str)
"""

from __future__ import annotations

import base64
import json
import time
import urllib.parse
from collections.abc import Callable

HttpTransport = Callable[[str, str, dict, "str | None"], tuple[int, str]]


class ClientCredentialsTokenProvider:
    """RFC 6749 §4.4 client-credentials flow with caching + refresh.

    ``token()`` returns a cached access token until ``expires_in`` (minus
    ``skew`` seconds) passes, then re-fetches; ``invalidate()`` drops the
    cache so the next call re-fetches — the 401-refresh hook the authed
    transports use. The token request matches the reference byte-for-byte
    in the parts that are protocol: HTTP Basic ``client_id:client_secret``,
    form-encoded ``grant_type=client_credentials`` + ``scope``.
    """

    def __init__(
        self,
        token_url: str,
        client_id: str,
        client_secret: str,
        scope: str,
        http: HttpTransport,
        skew_seconds: int = 60,
        clock: Callable[[], float] = time.time,
    ) -> None:
        self.token_url = token_url
        self.client_id = client_id
        self.client_secret = client_secret
        self.scope = scope
        self.http = http
        self.skew_seconds = skew_seconds
        self.clock = clock
        self._token: str | None = None
        self._expires_at: float = 0.0

    # -- protocol ----------------------------------------------------------

    def _fetch(self) -> None:
        basic = base64.b64encode(
            f"{self.client_id}:{self.client_secret}".encode()
        ).decode()
        status, body = self.http(
            "POST",
            self.token_url,
            {
                "Content-Type": "application/x-www-form-urlencoded",
                "Authorization": f"Basic {basic}",
            },
            urllib.parse.urlencode(
                {"grant_type": "client_credentials", "scope": self.scope}
            ),
        )
        if status != 200:
            raise RuntimeError(
                f"token endpoint returned {status} for {self.token_url}"
            )
        creds = json.loads(body)
        self._token = creds["access_token"]
        self._expires_at = self.clock() + float(
            creds.get("expires_in", 3600)
        ) - self.skew_seconds

    def token(self) -> str:
        if self._token is None or self.clock() >= self._expires_at:
            self._fetch()
        assert self._token is not None
        return self._token

    def invalidate(self) -> None:
        self._token = None
        self._expires_at = 0.0

    def auth_header(self) -> dict:
        # lowercase "bearer" matches the reference's header exactly
        return {"Authorization": f"bearer {self.token()}"}


def make_authed_crud_transport(
    provider: ClientCredentialsTokenProvider,
    base_url: str,
    http: HttpTransport,
) -> Callable[[str, str, "str | None"], int]:
    """Wrap an HTTP transport into ``apply_item_changes``'s contract.

    Adds the bearer header to every request; on a 401 the token is
    invalidated and the request retried ONCE with a fresh token (expired
    token mid-run — the long-job case a per-invocation Lambda never
    hits). ``path`` arriving from the sink is already endpoint-joined, so
    ``base_url`` here is usually "" — it exists for callers that pass
    bare paths.
    """

    def transport(method: str, path: str, payload: str | None) -> int:
        url = base_url.rstrip("/") + path if base_url else path
        headers = {"Content-Type": "application/json", **provider.auth_header()}
        status, _ = http(method, url, headers, payload)
        if status == 401:
            provider.invalidate()
            headers = {
                "Content-Type": "application/json",
                **provider.auth_header(),
            }
            status, _ = http(method, url, headers, payload)
        return status

    return transport


def make_authed_submit_transport(
    provider: ClientCredentialsTokenProvider,
    http: HttpTransport,
) -> Callable[[list, str], int]:
    """Wrap an HTTP transport into ``submit_items``'s batch contract.

    POSTs the batch as a JSON array body with the bearer header
    (reference: one POST per item to ``/ingestions``; batching is the
    engine's amortization — set batch_size=1 for request-level parity).
    Same 401-invalidate-retry-once behavior as the CRUD transport.
    """

    def transport(docs: list, endpoint: str) -> int:
        body = "[" + ",".join(docs) + "]"
        headers = {"Content-Type": "application/json", **provider.auth_header()}
        status, _ = http("POST", endpoint, headers, body)
        if status == 401:
            provider.invalidate()
            headers = {
                "Content-Type": "application/json",
                **provider.auth_header(),
            }
            status, _ = http("POST", endpoint, headers, body)
        return status

    return transport
