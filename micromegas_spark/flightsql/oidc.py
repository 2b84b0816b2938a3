"""OIDC connect flow for the FlightSQL client — parity with the reference's
corporate-auth path (reference python/micromegas/micromegas/auth/oidc.py
``OidcAuthProvider`` and oidc_connection.py ``load_or_login``/``connect``;
CHANGELOG #1408 routes CLI auth through issuer config, #1403 adds
per-profile token caches at ``tokens-<profile>.json``).

Everything network-shaped is injectable so the whole flow is testable in a
no-network container (tests/test_oidc.py drives discovery → browser login →
code exchange → token-cache write → refresh → bearer header on a live
loopback Flight call, with the issuer mocked):

- ``transport`` — two methods, ``get_json(url)`` and ``post_form(url,
  fields)``; the default uses stdlib urllib (no authlib/requests
  dependency; those wheels can't install here, and the protocol surface
  needed — discovery GET + two token-endpoint POSTs — is small).
- ``open_browser`` — called with the authorization URL; the default is
  ``webbrowser.open``. Tests substitute a function that plays the IdP:
  it GETs the loopback redirect URI with ``code``+``state`` itself.

Security posture mirrors the reference client: PKCE (S256) on every login
(desktop AND web clients), CSRF ``state`` checked before the code is
accepted, ``alg=none`` id-tokens rejected, token cache written 0600 inside
a 0700 dir WITHOUT the client_secret, and full signature validation
remains the server's job (the analytics service validates against the
issuer's JWKS; the client checks structure + expiry, exactly like the
reference's ``_validate_id_token``/``_get_id_token_expiration``).
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import secrets
import threading
import time
from pathlib import Path

DEFAULT_SCOPE = "openid email profile offline_access"
REFRESH_BUFFER_SECONDS = 300  # refresh when the id token has <5 min left


# ---------------------------------------------------------------- transport


class UrllibTransport:
    """Default HTTP transport: stdlib urllib, 10 s timeout (the reference
    uses requests with the same timeout). Kept tiny on purpose — the OIDC
    client surface is one JSON GET and form-encoded POSTs.

    Every URL must be https — these requests carry client secrets,
    authorization codes and refresh tokens, which an http:// issuer (from
    a profile config or a discovery document's token_endpoint) would send
    in cleartext. Loopback hosts are exempt so local test IdPs work."""

    timeout = 10.0

    @staticmethod
    def _check_url(url: str) -> None:
        from urllib.parse import urlsplit

        parts = urlsplit(url)
        if parts.scheme == "https":
            return
        host = (parts.hostname or "").lower()
        if parts.scheme == "http":
            if host == "localhost":
                return
            import ipaddress

            try:
                if ipaddress.ip_address(host).is_loopback:
                    return
            except ValueError:
                pass  # not an IP literal (e.g. 127.evil.example.com)
        raise ValueError(
            f"refusing non-https OIDC endpoint {url!r}: credentials would "
            "travel in cleartext (http is allowed for loopback hosts only)"
        )

    def get_json(self, url: str) -> dict:
        import urllib.request

        self._check_url(url)
        with urllib.request.urlopen(url, timeout=self.timeout) as resp:  # noqa: S310
            return json.loads(resp.read().decode("utf-8"))

    def post_form(self, url: str, fields: dict) -> dict:
        import urllib.parse
        import urllib.request

        self._check_url(url)
        data = urllib.parse.urlencode(fields).encode("ascii")
        req = urllib.request.Request(  # noqa: S310
            url, data=data,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:  # noqa: S310
            return json.loads(resp.read().decode("utf-8"))


# ---------------------------------------------------------------- jwt bits


def _b64url_decode(part: str) -> bytes:
    pad = -len(part) % 4
    return base64.urlsafe_b64decode(part + "=" * pad)


def _jwt_payload(id_token: str) -> dict:
    parts = id_token.split(".")
    if len(parts) != 3:
        raise ValueError("not a JWT (expected three dot-separated parts)")
    return json.loads(_b64url_decode(parts[1]))


def id_token_expiration(id_token: str) -> int:
    """The ``exp`` claim (epoch seconds) — reference
    ``_get_id_token_expiration`` (auth/oidc.py:367-398)."""
    exp = _jwt_payload(id_token).get("exp")
    if not exp:
        raise ValueError("ID token has no exp claim")
    return int(exp)


def reject_unsigned(id_token: str) -> None:
    """Refuse ``alg=none`` tokens; non-JWT opaque tokens pass through (the
    reference allows them for tests) — auth/oidc.py:330-365."""
    parts = id_token.split(".")
    if len(parts) != 3:
        return
    try:
        header = json.loads(_b64url_decode(parts[0]))
    except (ValueError, json.JSONDecodeError):
        return
    if str(header.get("alg", "")).lower() == "none":
        raise PermissionError(
            "unsigned JWT (alg=none) rejected — re-authenticate for a "
            "properly signed token"
        )


# ---------------------------------------------------------------- provider


class OidcAuthProvider:
    """Issuer-discovered OIDC auth with cached, auto-refreshing tokens.

    ``get_token()`` is what the FlightSQL client calls before every
    request: it returns the id token, transparently refreshing through the
    issuer's token endpoint when less than REFRESH_BUFFER_SECONDS of
    validity remain (thread-safe — concurrent queries share one refresh).
    """

    def __init__(
        self,
        issuer: str,
        client_id: str,
        client_secret: str | None = None,
        token_file: str | None = None,
        token: dict | None = None,
        audience: str | None = None,
        scope: str | None = None,
        transport=None,
    ):
        self.issuer = issuer
        self.client_id = client_id
        self.client_secret = client_secret
        self.token_file = token_file or default_token_file()
        self.audience = audience
        self.scope = scope or DEFAULT_SCOPE
        self.transport = transport or UrllibTransport()
        self.token = dict(token) if token else None
        self._lock = threading.Lock()
        # issuer discovery (auth/oidc.py:92-105): one GET, cached for the
        # provider's lifetime
        self.metadata = self.transport.get_json(
            issuer.rstrip("/") + "/.well-known/openid-configuration"
        )

    # -- the per-call entry point -------------------------------------

    def get_token(self) -> str:
        with self._lock:
            if not self.token:
                raise PermissionError("no tokens available — call login() first")
            id_token = self.token.get("id_token")
            if not id_token:
                raise PermissionError("no ID token available — re-authenticate")
            try:
                fresh = id_token_expiration(id_token) > time.time() + REFRESH_BUFFER_SECONDS
            except ValueError:
                fresh = False  # unparseable exp: assume expired, refresh
            if fresh:
                reject_unsigned(id_token)
                return id_token
            if not self.token.get("refresh_token"):
                raise PermissionError("token expired and no refresh token — re-authenticate")
            self._refresh()
            id_token = self.token["id_token"]
            reject_unsigned(id_token)
            return id_token

    def _refresh(self) -> None:
        fields = {
            "grant_type": "refresh_token",
            "refresh_token": self.token["refresh_token"],
            "client_id": self.client_id,
            "scope": self.scope,
        }
        if self.client_secret:
            fields["client_secret"] = self.client_secret
        new = self.transport.post_form(self.metadata["token_endpoint"], fields)
        if "id_token" not in new:
            raise PermissionError(
                "refresh response carried no id_token — re-authenticate"
            )
        # a provider may omit the refresh token on refresh: keep the old one
        merged = dict(self.token)
        merged.update(new)
        self.token = merged
        if self.token_file:
            self.save()

    # -- persistence (#1403 token cache) --------------------------------

    def save(self) -> None:
        """Write the token cache: 0700 dir, 0600 file, client_secret NEVER
        persisted (auth/oidc.py:474-508). The directory is chmod'd 0700
        only when it is OUR default token dir or this call just created
        it — a caller-supplied token_file in a shared location (a project
        dir, $HOME itself) must not have its directory permissions
        silently stripped on every save."""
        parent = Path(self.token_file).parent
        default_dir = Path(os.path.expanduser("~")) / ".micromegas_spark"
        created = not parent.exists()
        parent.mkdir(mode=0o700, parents=True, exist_ok=True)
        if created or parent == default_dir:
            parent.chmod(0o700)
        data = {
            "issuer": self.issuer,
            "client_id": self.client_id,
            "token": self.token,
        }
        if self.audience:
            data["audience"] = self.audience
        fd = os.open(self.token_file, os.O_CREAT | os.O_WRONLY | os.O_TRUNC, 0o600)
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(data, f, indent=2)

    @classmethod
    def from_file(
        cls, token_file: str, client_secret: str | None = None, transport=None
    ) -> "OidcAuthProvider":
        path = str(Path(token_file).expanduser())
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        return cls(
            issuer=data["issuer"],
            client_id=data["client_id"],
            client_secret=client_secret,
            token_file=path,
            token=data["token"],
            audience=data.get("audience"),
            transport=transport,
        )

    # -- browser login (PKCE authorization-code flow) -------------------

    @classmethod
    def login(
        cls,
        issuer: str,
        client_id: str,
        client_secret: str | None = None,
        token_file: str | None = None,
        audience: str | None = None,
        scope: str | None = None,
        transport=None,
        open_browser=None,
        callback_host: str = "127.0.0.1",
        callback_port: int = 0,
        timeout: float = 300.0,
    ) -> "OidcAuthProvider":
        """Authorization-code + PKCE (S256) against the discovered
        endpoints, code received on a loopback HTTP callback
        (auth/oidc.py:191-328). ``callback_port=0`` picks a free port —
        safer than the reference's fixed :48080 and equally accepted by
        IdPs that allow loopback redirect with any port. ``open_browser``
        receives the authorization URL; tests substitute the IdP side."""
        import http.server

        transport = transport or UrllibTransport()
        metadata = transport.get_json(
            issuer.rstrip("/") + "/.well-known/openid-configuration"
        )
        request_scope = scope or DEFAULT_SCOPE

        verifier = secrets.token_urlsafe(48)
        challenge = (
            base64.urlsafe_b64encode(hashlib.sha256(verifier.encode()).digest())
            .rstrip(b"=")
            .decode()
        )
        state = secrets.token_urlsafe(24)
        result: dict = {}
        done = threading.Event()

        class _Callback(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib handler contract)
                from urllib.parse import parse_qs, urlsplit

                q = parse_qs(urlsplit(self.path).query)
                # CSRF: the state must match BEFORE the code is looked at
                if q.get("state", [None])[0] != state:
                    self.send_response(400)
                    self.end_headers()
                    self.wfile.write(b"state mismatch")
                    return
                # RFC 6749 §4.1.2.1 error redirect: surface the IdP's
                # actual reason (access_denied etc.) instead of letting
                # it decay into a generic no-code timeout
                if q.get("error"):
                    result["error"] = q["error"][0]
                    result["error_description"] = q.get(
                        "error_description", [""]
                    )[0]
                result["code"] = q.get("code", [None])[0]
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; charset=utf-8")
                self.end_headers()
                self.wfile.write(
                    b"authentication complete - you can close this window"
                )
                done.set()

            def log_message(self, *args):  # quiet
                pass

        server = http.server.ThreadingHTTPServer((callback_host, callback_port), _Callback)
        try:
            port = server.server_address[1]
            redirect_uri = f"http://{callback_host}:{port}/callback"
            from urllib.parse import urlencode

            params = {
                "response_type": "code",
                "client_id": client_id,
                "redirect_uri": redirect_uri,
                "scope": request_scope,
                "state": state,
                "code_challenge": challenge,
                "code_challenge_method": "S256",
            }
            if audience:
                params["audience"] = audience
            auth_url = metadata["authorization_endpoint"] + "?" + urlencode(params)
            worker = threading.Thread(target=server.serve_forever, daemon=True)
            worker.start()
            if open_browser is None:
                import webbrowser

                open_browser = webbrowser.open
            open_browser(auth_url)
            if not done.wait(timeout) or not result.get("code"):
                if result.get("error"):
                    detail = result.get("error_description") or ""
                    raise PermissionError(
                        f"authentication failed — identity provider "
                        f"returned {result['error']!r}"
                        + (f": {detail}" if detail else "")
                    )
                raise TimeoutError(
                    "authentication failed — no authorization code received"
                )
            fields = {
                "grant_type": "authorization_code",
                "code": result["code"],
                "redirect_uri": redirect_uri,
                "client_id": client_id,
                "code_verifier": verifier,
            }
            if client_secret:
                fields["client_secret"] = client_secret
            token = transport.post_form(metadata["token_endpoint"], fields)
        finally:
            server.shutdown()
            server.server_close()

        provider = cls(
            issuer,
            client_id,
            client_secret,
            token_file,
            token=token,
            audience=audience,
            scope=request_scope,
            transport=transport,
        )
        if token_file:
            provider.save()
        return provider


class OidcClientCredentialsProvider:
    """OAuth 2.0 client-credentials auth for service accounts (reference
    auth/oidc.py:552-741) — batch jobs and daemons that authenticate with
    client_id + client_secret, no user interaction. Access tokens are
    cached until expiry (5-minute buffer, like the reference) and
    refetched lazily inside the same thread-safe get_token() contract the
    FlightSQL client calls before every request."""

    def __init__(
        self,
        issuer: str,
        client_id: str,
        client_secret: str,
        audience: str | None = None,
        transport=None,
    ):
        self.issuer = issuer
        self.client_id = client_id
        self.client_secret = client_secret
        self.audience = audience
        self.transport = transport or UrllibTransport()
        self._lock = threading.Lock()
        self._cached: dict | None = None  # {"access_token", "expires_at"}
        self.metadata = self.transport.get_json(
            issuer.rstrip("/") + "/.well-known/openid-configuration"
        )

    @classmethod
    def from_env(cls, transport=None) -> "OidcClientCredentialsProvider":
        """MICROMEGAS_OIDC_ISSUER / _CLIENT_ID / _CLIENT_SECRET
        (+ optional _AUDIENCE), each required ones raising a clear
        ValueError when unset — the service-account spelling of the
        #1408 env surface."""
        vals = {}
        for key in ("ISSUER", "CLIENT_ID", "CLIENT_SECRET"):
            v = os.environ.get(f"MICROMEGAS_OIDC_{key}")
            if not v:
                raise ValueError(
                    f"MICROMEGAS_OIDC_{key} environment variable not set"
                )
            vals[key.lower()] = v
        return cls(
            issuer=vals["issuer"],
            client_id=vals["client_id"],
            client_secret=vals["client_secret"],
            audience=os.environ.get("MICROMEGAS_OIDC_AUDIENCE"),
            transport=transport,
        )

    def _fetch(self) -> dict:
        fields = {
            "grant_type": "client_credentials",
            "client_id": self.client_id,
            "client_secret": self.client_secret,
        }
        if self.audience:
            fields["audience"] = self.audience
        resp = self.transport.post_form(self.metadata["token_endpoint"], fields)
        expires_in = resp.get("expires_in", 3600)
        if expires_in > REFRESH_BUFFER_SECONDS:
            expires_in -= REFRESH_BUFFER_SECONDS
        return {
            "access_token": resp["access_token"],
            "expires_at": time.time() + expires_in,
        }

    def get_token(self) -> str:
        with self._lock:
            if self._cached and self._cached["expires_at"] > time.time():
                return self._cached["access_token"]
            self._cached = self._fetch()
            return self._cached["access_token"]


# ------------------------------------------------------- config (#1403/#1408)


def default_token_file(profile: str | None = None) -> str:
    """Per-profile token cache path (#1403: ``tokens-<profile>.json``; the
    profile name is validated as a safe path segment so a crafted profile
    can't escape the token dir — reference cli/config.py:24-45)."""
    base = Path(os.path.expanduser("~")) / ".micromegas_spark"
    if profile is None:
        return str(base / "tokens.json")
    validate_profile_name(profile)
    return str(base / f"tokens-{profile}.json")


def validate_profile_name(name: str) -> None:
    import re

    if (
        not name
        or not re.fullmatch(r"[A-Za-z0-9._-]+", name)
        or name in (".", "..")
    ):
        raise ValueError(
            f"invalid profile name {name!r}: letters, digits, '.', '_', '-' "
            "only, and not '.' or '..'"
        )


def resolve_oidc_settings(profile_cfg: dict | None = None) -> dict:
    """Merge env over profile config into the OIDC connection settings —
    env precedence per #1408 (MICROMEGAS_OIDC_* beats config.json's
    ``issuers`` list; only the first issuer entry is consulted, like the
    reference's resolve_connection)."""
    cfg = profile_cfg or {}
    issuers = cfg.get("issuers") or []
    first = issuers[0] if issuers else {}

    def pick(env_key: str, *fallbacks):
        return os.environ.get(env_key) or next((v for v in fallbacks if v), None)

    return {
        "issuer": pick("MICROMEGAS_OIDC_ISSUER", first.get("issuer")),
        "client_id": pick("MICROMEGAS_OIDC_CLIENT_ID", cfg.get("client_id")),
        "client_secret": pick("MICROMEGAS_OIDC_CLIENT_SECRET"),
        "audience": pick("MICROMEGAS_OIDC_AUDIENCE", first.get("audience")),
        "scope": pick("MICROMEGAS_OIDC_SCOPE"),
    }


def load_or_login(
    issuer: str,
    client_id: str,
    client_secret: str | None = None,
    token_file: str | None = None,
    audience: str | None = None,
    scope: str | None = None,
    transport=None,
    open_browser=None,
) -> OidcAuthProvider:
    """Reference oidc_connection.py:14-89: reuse the cached tokens when the
    file exists (refresh happens lazily in get_token), else run the
    browser login and cache."""
    token_file = token_file or default_token_file()
    if Path(token_file).exists():
        try:
            return OidcAuthProvider.from_file(
                token_file, client_secret=client_secret, transport=transport
            )
        except Exception as e:  # cache unusable: fall through to login
            print(f"Token cache unusable ({e}); re-authenticating...")
    return OidcAuthProvider.login(
        issuer=issuer,
        client_id=client_id,
        client_secret=client_secret,
        token_file=token_file,
        audience=audience,
        scope=scope,
        transport=transport,
        open_browser=open_browser,
    )


def connect(
    uri: str,
    issuer: str,
    client_id: str,
    client_secret: str | None = None,
    token_file: str | None = None,
    preserve_dictionary: bool = False,
    audience: str | None = None,
    scope: str | None = None,
    transport=None,
    open_browser=None,
):
    """OIDC-authenticated FlightSQL client in one call (reference
    oidc_connection.py:92-165): load_or_login, then a client whose every
    call re-reads get_token() so refreshed tokens take effect mid-session."""
    from micromegas_spark.flightsql.client import FlightSQLClient

    auth = load_or_login(
        issuer,
        client_id,
        client_secret=client_secret,
        token_file=token_file,
        audience=audience,
        scope=scope,
        transport=transport,
        open_browser=open_browser,
    )
    return FlightSQLClient(
        uri, preserve_dictionary=preserve_dictionary, auth_provider=auth
    )
