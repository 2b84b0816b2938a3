"""API key store (reference unreleased changelog #1383: data-lake schema v5
`analytics_api_keys`, DbApiKeyAuthProvider + moka TTL cache,
ProviderUnavailable → 503/UNAVAILABLE): hashes-only at rest with a full
audit trail, revocation, TTL-cached validation, and — the behavioral
centerpiece — a key-store OUTAGE surfacing as a RETRYABLE failure, never a
rejected credential."""

from __future__ import annotations

import json

import pytest

from micromegas_spark.flightsql.apikeys import ApiKeyStore, StoreUnavailable, _hash


def test_create_validate_revoke_lifecycle(tmp_path):
    store = ApiKeyStore(str(tmp_path / "keys.json"))
    plaintext = store.create_key("ci-bot", created_by="admin")
    assert store.validate(plaintext) is True
    assert store.validate("not-a-key") is False
    # audit trail: last_used stamped by validation, plaintext nowhere
    (rec,) = store.list_keys()
    assert rec["name"] == "ci-bot" and rec["created_by"] == "admin"
    assert rec["last_used_at"] is not None and rec["revoked_at"] is None
    assert "hash" not in rec
    store.revoke("ci-bot", revoked_by="secops")
    assert store.validate(plaintext) is False
    (rec,) = store.list_keys()
    assert rec["revoked_at"] is not None and rec["revoked_by"] == "secops"


def test_only_hashes_at_rest(tmp_path):
    path = tmp_path / "keys.json"
    store = ApiKeyStore(str(path))
    plaintext = store.create_key("k1")
    raw = path.read_text()
    assert plaintext not in raw
    assert _hash(plaintext) in raw


def test_duplicate_name_rejected(tmp_path):
    store = ApiKeyStore(str(tmp_path / "keys.json"))
    store.create_key("k")
    with pytest.raises(ValueError):
        store.create_key("k")


def test_outage_raises_store_unavailable_not_false(tmp_path):
    path = tmp_path / "keys.json"
    store = ApiKeyStore(str(path), cache_ttl_sec=0.0)  # no positive cache
    plaintext = store.create_key("k")
    path.write_text("{not json")  # corrupt backend = outage
    with pytest.raises(StoreUnavailable):
        store.validate(plaintext)


def test_ttl_cache_survives_transient_outage(tmp_path):
    path = tmp_path / "keys.json"
    store = ApiKeyStore(str(path), cache_ttl_sec=60.0)
    plaintext = store.create_key("k")
    assert store.validate(plaintext) is True  # populates the cache
    path.write_text("{not json")  # backend goes away...
    assert store.validate(plaintext) is True  # ...cached-valid keeps working
    # a DIFFERENT key (not cached) still surfaces the outage
    with pytest.raises(StoreUnavailable):
        store.validate("some-other-key")


def test_revoke_clears_cache(tmp_path):
    store = ApiKeyStore(str(tmp_path / "keys.json"), cache_ttl_sec=60.0)
    plaintext = store.create_key("k")
    assert store.validate(plaintext) is True
    store.revoke("k")
    assert store.validate(plaintext) is False  # cache does not mask revocation


# -------------------------------------------------------------- live wire


def test_key_store_gate_over_wire(spark, tmp_path):
    """Valid key passes; bad key → UNAUTHENTICATED; store outage →
    UNAVAILABLE (retryable), exactly the #1383 distinction."""
    flight = pytest.importorskip("pyarrow.flight")
    from micromegas_spark.engine import Engine
    from micromegas_spark.flightsql.client import FlightSQLClient
    from micromegas_spark.flightsql.server import FlightSQLServer
    from tests.conftest import SF_SMOKE

    path = tmp_path / "keys.json"
    store = ApiKeyStore(str(path), cache_ttl_sec=0.0)
    key = store.create_key("svc", created_by="test")
    eng = Engine.from_test_tables(spark, SF_SMOKE)
    with FlightSQLServer(eng, key_store=store) as srv:
        with FlightSQLClient(
            srv.uri, headers={"authorization": f"Bearer {key}"}
        ) as ok:
            assert int(ok.query("SELECT CAST(1 AS BIGINT) AS one")["one"][0]) == 1
        with FlightSQLClient(
            srv.uri, headers={"authorization": "Bearer wrong-key"}
        ) as bad:
            with pytest.raises(flight.FlightUnauthenticatedError):
                bad.query("SELECT 1 AS one")
        with FlightSQLClient(srv.uri) as anon:
            with pytest.raises(flight.FlightUnauthenticatedError):
                anon.query("SELECT 1 AS one")
        store.revoke("svc")
        with FlightSQLClient(
            srv.uri, headers={"authorization": f"Bearer {key}"}
        ) as revoked:
            with pytest.raises(flight.FlightUnauthenticatedError):
                revoked.query("SELECT 1 AS one")
        # outage: corrupt the backing file → UNAVAILABLE, not UNAUTHENTICATED
        path.write_text("{not json")
        with FlightSQLClient(
            srv.uri, headers={"authorization": f"Bearer {key}"}
        ) as outage:
            with pytest.raises(flight.FlightUnavailableError):
                outage.query("SELECT 1 AS one")


def test_server_rejects_auth_token_plus_key_store(tmp_path, spark):
    """The middleware ANDs its checks, so auth_token + key_store is a dead
    combination (one Bearer value can't satisfy both); the constructor
    must refuse it instead of rejecting every call at runtime."""
    import pytest

    from micromegas_spark.engine import Engine
    from micromegas_spark.flightsql.server import FlightSQLServer

    store = ApiKeyStore(str(tmp_path / "keys.json"))
    with pytest.raises(ValueError, match="not both"):
        FlightSQLServer(Engine(spark), auth_token="tok", key_store=store)
