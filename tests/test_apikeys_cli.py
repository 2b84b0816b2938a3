"""API-key admin CLI + served surface (reference unreleased changelog
#1383: OIDC-gated POST/GET/DELETE /auth/api_keys routes for minting keys
without a redeploy, mkdocs/docs/admin/api-keys.md). Here the same
lifecycle runs through `micromegas-spark apikeys mint|list|revoke`
against either a local store file or an admin FlightSQL server's
CreateApiKey/ListApiKeys/RevokeApiKey actions — with the reference's two
behavioral pins: the plaintext travels exactly once, and a NON-admin
server fails the actions as unknown functions (the same parity the
partition-admin UDTFs follow, query.rs:150-175)."""

from __future__ import annotations

import json

import pytest

from micromegas_spark import cli
from micromegas_spark.flightsql.apikeys import ApiKeyStore
from tests.conftest import SF_SMOKE


def run(capsys, *argv):
    rc = cli.main(list(argv))
    cap = capsys.readouterr()
    return rc, cap.out, cap.err


# ------------------------------------------------------------- local store


def test_apikeys_local_lifecycle(capsys, tmp_path):
    store_path = str(tmp_path / "keys.json")

    rc, out, err = run(capsys, "apikeys", "mint", "ci-bot",
                       "--store", store_path, "--by", "admin@corp")
    assert rc == 0
    plaintext = out.strip()
    assert len(plaintext) >= 32 and "shown once" in err

    # plaintext never at rest
    assert plaintext not in (tmp_path / "keys.json").read_text()

    rc, out, _ = run(capsys, "apikeys", "list", "--store", store_path,
                     "--format", "json")
    assert rc == 0
    (rec,) = json.loads(out)
    assert rec["name"] == "ci-bot" and rec["created_by"] == "admin@corp"
    assert rec["revoked_at"] is None and "hash" not in rec

    # the minted key actually validates, then revocation kills it
    assert ApiKeyStore(store_path).validate(plaintext) is True
    rc, out, _ = run(capsys, "apikeys", "revoke", "ci-bot",
                     "--store", store_path, "--by", "secops")
    assert rc == 0 and "revoked" in out
    assert ApiKeyStore(store_path, cache_ttl_sec=0).validate(plaintext) is False

    rc, out, _ = run(capsys, "apikeys", "list", "--store", store_path,
                     "--format", "json")
    (rec,) = json.loads(out)
    assert rec["revoked_at"] is not None and rec["revoked_by"] == "secops"


def test_apikeys_local_errors(capsys, tmp_path):
    store_path = str(tmp_path / "keys.json")
    rc, _, err = run(capsys, "apikeys", "mint", "--store", store_path)
    assert rc == 2 and "requires a key name" in err
    rc, _, err = run(capsys, "apikeys", "revoke", "ghost", "--store", store_path)
    assert rc == 2 and "unknown api key" in err
    run(capsys, "apikeys", "mint", "dup", "--store", store_path)
    rc, _, err = run(capsys, "apikeys", "mint", "dup", "--store", store_path)
    assert rc == 2 and "already exists" in err
    # exactly one of --store/--uri
    rc, _, err = run(capsys, "apikeys", "list")
    assert rc == 2 and "exactly one" in err
    rc, _, err = run(capsys, "apikeys", "list", "--store", store_path,
                     "--uri", "grpc://localhost:1")
    assert rc == 2 and "exactly one" in err


# --------------------------------------------------------- served surface


@pytest.fixture()
def admin_server(spark, tmp_path):
    pytest.importorskip("pyarrow.flight")
    from micromegas_spark.engine import Engine
    from micromegas_spark.flightsql.server import FlightSQLServer

    eng = Engine.from_test_tables(spark, SF_SMOKE)
    eng.admin = True
    store_path = str(tmp_path / "served_keys.json")
    store = ApiKeyStore(store_path)
    bootstrap = store.create_key("bootstrap", created_by="deploy")
    with FlightSQLServer(eng, key_store=store) as srv:
        yield srv, store_path, bootstrap


def test_apikeys_remote_mint_list_revoke(admin_server, capsys, tmp_path):
    """Mint-without-redeploy, end to end: bootstrap key authenticates the
    CLI; a new key is minted over the wire, works as a bearer credential
    itself, then is revoked and stops authenticating."""
    srv, store_path, bootstrap = admin_server

    rc, out, err = run(capsys, "apikeys", "mint", "svc-reader",
                       "--uri", srv.uri, "--bearer", bootstrap, "--by", "ops")
    assert rc == 0 and "shown once" in err
    new_key = out.strip()
    assert new_key and new_key not in open(store_path).read()

    # the NEW key is live immediately: list with it
    rc, out, _ = run(capsys, "apikeys", "list", "--uri", srv.uri,
                     "--bearer", new_key, "--format", "json")
    assert rc == 0
    names = {k["name"]: k for k in json.loads(out)}
    assert set(names) == {"bootstrap", "svc-reader"}
    assert names["svc-reader"]["created_by"] == "ops"

    rc, out, _ = run(capsys, "apikeys", "revoke", "svc-reader",
                     "--uri", srv.uri, "--bearer", bootstrap, "--by", "ops")
    assert rc == 0 and "revoked" in out

    # middleware TTL-caches positives; a fresh server-side check shows
    # the revocation is durable in the store
    assert ApiKeyStore(store_path, cache_ttl_sec=0).validate(new_key) is False
    rc, out, _ = run(capsys, "apikeys", "list", "--uri", srv.uri,
                     "--bearer", bootstrap, "--format", "json")
    assert json.loads(out)[1]["revoked_by"] == "ops"


def test_apikeys_remote_requires_valid_bearer(admin_server, capsys):
    srv, _, _ = admin_server
    rc, _, err = run(capsys, "apikeys", "list", "--uri", srv.uri,
                     "--bearer", "not-a-real-key")
    assert rc == 1 and "unauthenticated" in err.lower()


def test_apikeys_non_admin_server_rejects(spark, capsys, tmp_path):
    """Non-admin rejection: a server whose engine is not admin fails the
    key actions as UNKNOWN functions — identical to the partition-admin
    parity (the reference never registers admin routes on a non-admin
    deployment)."""
    pytest.importorskip("pyarrow.flight")
    from micromegas_spark.engine import Engine
    from micromegas_spark.flightsql.server import FlightSQLServer

    eng = Engine.from_test_tables(spark, SF_SMOKE)
    eng.admin = False
    store_path = str(tmp_path / "keys.json")
    store = ApiKeyStore(store_path)
    bootstrap = store.create_key("bootstrap")
    with FlightSQLServer(eng, key_store=store) as srv:
        rc, _, err = run(capsys, "apikeys", "mint", "nope",
                         "--uri", srv.uri, "--bearer", bootstrap)
        assert rc == 1 and "not found" in err
        # nothing was minted
        assert ApiKeyStore(store_path).list_keys()[0]["name"] == "bootstrap"
        assert len(ApiKeyStore(store_path).list_keys()) == 1
