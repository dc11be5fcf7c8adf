"""O3 — auth / token source: OAuth2 client-credentials flow.

The reference acquires a bearer token up front via MSAL's
ConfidentialClientApplication (NB:33-48) and sends it on every Graph call
(NB:53-59). This module is the engine's generalization as a CONNECTOR
concern (SURVEY §2.1 O3): a picklable token provider that each executor
worker can carry, with

- POST ``grant_type=client_credentials`` to the token endpoint
  (form-encoded, standard RFC 6749 §4.4 — MSAL does the same under the
  hood),
- per-interpreter caching until ``expires_in`` minus a safety margin
  (the reference fetches once per run; a long-running executor must
  refresh),
- explicit ``invalidate()`` so fetch paths can force a refresh after a
  401 (token revoked server-side before its stated expiry).

Only stdlib urllib is used: token calls are rare (one per worker per
expiry window), so connection pooling buys nothing here.
"""

from __future__ import annotations

import json
import time
from urllib.parse import urlencode
from urllib.request import Request, urlopen


class TokenError(Exception):
    """Token endpoint rejected the request (bad credentials / bad scope)."""


class ClientCredentialsTokenProvider:
    """Picklable OAuth2 client-credentials token source.

    Lazy per-interpreter state: the cached token is NOT pickled, so every
    executor worker fetches (and then caches) its own token — the
    driver-side token never has to be serialized or broadcast.
    """

    def __init__(
        self,
        token_url: str,
        client_id: str,
        client_secret: str,
        scope: str | None = None,
        refresh_margin_s: float = 30.0,
    ):
        self.token_url = token_url
        self.client_id = client_id
        self.client_secret = client_secret
        self.scope = scope
        self.refresh_margin_s = refresh_margin_s
        self._token: str | None = None
        self._expires_at: float = 0.0

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_token"], state["_expires_at"] = None, 0.0  # never ship tokens
        return state

    def token(self) -> str:
        if self._token is None or time.time() >= self._expires_at:
            self._fetch()
        assert self._token is not None
        return self._token

    def invalidate(self) -> None:
        """Drop the cached token (e.g. after a 401 mid-expiry)."""
        self._token, self._expires_at = None, 0.0

    def auth_headers(self) -> dict[str, str]:
        return {"Authorization": f"Bearer {self.token()}"}

    def _fetch(self) -> None:
        form = {
            "grant_type": "client_credentials",
            "client_id": self.client_id,
            "client_secret": self.client_secret,
        }
        if self.scope:
            form["scope"] = self.scope
        req = Request(
            self.token_url,
            data=urlencode(form).encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        try:
            with urlopen(req, timeout=30) as r:
                body = json.load(r)
        except Exception as exc:  # noqa: BLE001 — wrap for a clear auth error
            raise TokenError(f"token request failed: {exc}") from exc
        if "access_token" not in body:
            raise TokenError(f"no access_token in response: {body}")
        self._token = body["access_token"]
        self._expires_at = (
            time.time() + float(body.get("expires_in", 3600)) - self.refresh_margin_s
        )
