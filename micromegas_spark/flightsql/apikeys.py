"""DB-backed API key store analogue (reference unreleased changelog #1383,
data-lake schema v5 `analytics_api_keys`; `micromegas_auth`
DbApiKeyAuthProvider behind a short-TTL moka cache).

The reference stores ONLY a SHA-256 hash of each key plus a
created_at/created_by/last_used_at/revoked_at/revoked_by audit trail in
Postgres, validates through a short-TTL cache, and — critically — makes a
key-store OUTAGE surface as a RETRYABLE failure (HTTP 503 /
gRPC UNAVAILABLE), not a rejected credential (401/UNAUTHENTICATED), so a
database blip doesn't tell every client its key was revoked.

This rebuild keeps the same contract over a JSON file + advisory flock
(the repo's catalog-manifest pattern, materialize/batch.py):

- ``create_key`` returns the plaintext ONCE; only ``sha256(key)`` lands on
  disk, with the full audit trail.
- ``validate`` checks hash + not-revoked, stamps ``last_used_at``
  (best-effort — a failed stamp never fails validation), and caches
  positive results for ``cache_ttl_sec`` so the hot path doesn't hit the
  file per call (moka-cache parity). Within the TTL, a transient store
  outage keeps serving cached-valid keys.
- an unreadable/corrupt store raises ``StoreUnavailable``; the server maps
  it to ``FlightUnavailableError`` (UNAVAILABLE — retryable), while a
  wrong/revoked/unknown key stays ``FlightUnauthenticatedError``.
"""

from __future__ import annotations

from micromegas_spark.flightsql.errors import InvalidArgument

import fcntl
import hashlib
import json
import os
import secrets
import threading
import time


class StoreUnavailable(RuntimeError):
    """The key store backend cannot be read — a retryable INFRASTRUCTURE
    failure, distinct from an invalid credential (#1383: ProviderUnavailable
    → 503/UNAVAILABLE, never 401)."""


def _hash(key: str) -> str:
    return hashlib.sha256(key.encode("utf-8")).hexdigest()


class ApiKeyStore:
    def __init__(self, path: str, cache_ttl_sec: float = 30.0):
        self.path = path
        self.cache_ttl_sec = cache_ttl_sec
        self._cache: dict[str, float] = {}  # hash -> expiry monotonic ts
        self._lock = threading.Lock()

    # -- storage ------------------------------------------------------------

    def _load(self) -> dict:
        try:
            if not os.path.exists(self.path):
                return {"keys": {}}
            with open(self.path, encoding="utf-8") as f:
                return json.load(f)
        except (OSError, ValueError) as e:
            raise StoreUnavailable(f"api key store unreadable: {e}") from e

    def _save(self, data: dict) -> None:
        tmp = f"{self.path}.tmp{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    def _locked(self):
        """Advisory flock for read-modify-write (multi-process safety, the
        catalog-manifest pattern)."""

        class _Ctx:
            def __init__(ctx):
                ctx.fd = None

            def __enter__(ctx):
                lock_path = self.path + ".lock"
                try:
                    ctx.fd = open(lock_path, "a+")
                    fcntl.flock(ctx.fd, fcntl.LOCK_EX)
                except OSError as e:
                    raise StoreUnavailable(f"api key store lock: {e}") from e
                return ctx

            def __exit__(ctx, *exc):
                if ctx.fd is not None:
                    fcntl.flock(ctx.fd, fcntl.LOCK_UN)
                    ctx.fd.close()

        return _Ctx()

    # -- admin surface (reference: admin-gated HTTP routes) ------------------

    def create_key(self, name: str, created_by: str = "") -> str:
        """Mint a key; the PLAINTEXT is returned once and never stored."""
        plaintext = secrets.token_urlsafe(32)
        with self._locked():
            data = self._load()
            if name in data["keys"]:
                raise InvalidArgument(f"api key {name!r} already exists")
            data["keys"][name] = {
                "hash": _hash(plaintext),
                "created_at": time.time(),
                "created_by": created_by,
                "last_used_at": None,
                "revoked_at": None,
                "revoked_by": None,
            }
            self._save(data)
        return plaintext

    def revoke(self, name: str, revoked_by: str = "") -> None:
        with self._locked():
            data = self._load()
            if name not in data["keys"]:
                raise InvalidArgument(f"unknown api key {name!r}")
            data["keys"][name]["revoked_at"] = time.time()
            data["keys"][name]["revoked_by"] = revoked_by
            self._save(data)
        with self._lock:
            self._cache.pop(data["keys"][name]["hash"], None)

    def list_keys(self) -> list[dict]:
        """Audit listing — names + trail, never hashes-to-plaintext."""
        data = self._load()
        return [
            {"name": n, **{k: v for k, v in rec.items() if k != "hash"}}
            for n, rec in sorted(data["keys"].items())
        ]

    # -- validation (the hot path) -------------------------------------------

    def validate(self, key: str) -> bool:
        """True iff the key exists and is not revoked. Raises
        StoreUnavailable when the backend is unreadable AND the key is not
        in the positive cache — an outage must not look like a bad key."""
        h = _hash(key)
        now = time.monotonic()
        with self._lock:
            exp = self._cache.get(h)
            if exp is not None and exp > now:
                return True
        try:
            data = self._load()
        except StoreUnavailable:
            raise
        for name, rec in data["keys"].items():
            if rec["hash"] == h:
                if rec["revoked_at"] is not None:
                    return False
                with self._lock:
                    self._cache[h] = now + self.cache_ttl_sec
                # best-effort last_used_at stamp — never fails validation
                try:
                    with self._locked():
                        d2 = self._load()
                        if name in d2["keys"]:
                            d2["keys"][name]["last_used_at"] = time.time()
                            self._save(d2)
                except (StoreUnavailable, OSError):
                    pass
                return True
        return False
