"""Reference-config migration (MIGRATION.md's claim, reference
python/micromegas/micromegas/cli/config.py + #1403/#1408): a user's
existing ~/.micromegas/config.json — flat form, profiles form, issuers
lists — must drive this CLI's profile loader and OIDC settings resolver
with the reference's exact semantics: profile precedence --profile >
$PROFILE env > default_profile, MICROMEGAS_OIDC_* env beating config,
per-profile token caches, and bare logout clearing EVERY cache. The
fixture files under tests/fixtures/ are checked in verbatim in the
reference's shapes."""

from __future__ import annotations

import os
import pathlib

import pytest

from micromegas_spark import cli
from micromegas_spark.cli import _load_profile
from micromegas_spark.flightsql.oidc import (
    default_token_file,
    resolve_oidc_settings,
)

FIXTURES = pathlib.Path(__file__).parent / "fixtures"

_OIDC_ENV = (
    "MICROMEGAS_OIDC_ISSUER",
    "MICROMEGAS_OIDC_CLIENT_ID",
    "MICROMEGAS_OIDC_CLIENT_SECRET",
    "MICROMEGAS_OIDC_AUDIENCE",
    "MICROMEGAS_OIDC_SCOPE",
)


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    for k in (*_OIDC_ENV, "MICROMEGAS_SPARK_PROFILE", "MICROMEGAS_SPARK_CONFIG"):
        monkeypatch.delenv(k, raising=False)


def _use(monkeypatch, fixture: str) -> None:
    monkeypatch.setenv("MICROMEGAS_SPARK_CONFIG", str(FIXTURES / fixture))


# ------------------------------------------------------------- flat form


def test_flat_reference_config_used_directly(monkeypatch):
    """Reference resolve_active_profile with no `profiles` map returns the
    top-level dict as the active config — a migrated flat config.json
    must supply uri + OIDC settings without any profile machinery."""
    _use(monkeypatch, "reference_config_flat.json")
    prof = _load_profile(None)
    assert prof["uri"] == "grpc://analytics.example.com:50051"
    st = resolve_oidc_settings(prof)
    assert st["issuer"] == "https://idp.example.com/realms/main"
    assert st["client_id"] == "micromegas-cli"
    assert st["audience"] == "https://analytics.example.com"
    assert st["client_secret"] is None and st["scope"] is None


def test_flat_config_with_named_profile_is_an_error(monkeypatch):
    """Reference: --profile/$PROFILE against a config with no `profiles`
    map raises ProfileError, never silently falls back to the flat dict."""
    _use(monkeypatch, "reference_config_flat.json")
    with pytest.raises(KeyError, match="no 'profiles' map"):
        _load_profile("prod")
    monkeypatch.setenv("MICROMEGAS_SPARK_PROFILE", "prod")
    with pytest.raises(KeyError, match="no 'profiles' map"):
        _load_profile(None)


# --------------------------------------------------------- profiles form


def test_profile_precedence_flag_env_default(monkeypatch):
    """#1403/#1408 precedence, exactly the reference's
    resolve_active_profile order: --profile > MICROMEGAS_PROFILE-style
    env > default_profile."""
    _use(monkeypatch, "reference_config_profiles.json")

    # default_profile alone
    prof = _load_profile(None)
    assert prof["_profile_name"] == "dev"
    assert resolve_oidc_settings(prof)["issuer"].endswith("/dev")

    # env beats default_profile
    monkeypatch.setenv("MICROMEGAS_SPARK_PROFILE", "prod")
    prof = _load_profile(None)
    assert prof["_profile_name"] == "prod"
    assert prof["uri"] == "grpc://prod.example.com:50051"
    assert resolve_oidc_settings(prof)["audience"] == "aud-prod"

    # explicit --profile beats env
    prof = _load_profile("dev")
    assert prof["_profile_name"] == "dev"
    assert resolve_oidc_settings(prof)["client_id"] == "cli-dev"

    # unknown profile is a loud error listing the known ones
    with pytest.raises(KeyError, match="unknown profile"):
        _load_profile("staging")


def test_env_beats_fixture_issuers(monkeypatch):
    """#1408: MICROMEGAS_OIDC_* env wins over whatever the config file
    says — pinned against the checked-in reference-shaped fixture."""
    _use(monkeypatch, "reference_config_profiles.json")
    monkeypatch.setenv("MICROMEGAS_OIDC_ISSUER", "https://env.example.com")
    monkeypatch.setenv("MICROMEGAS_OIDC_SCOPE", "openid profile")
    st = resolve_oidc_settings(_load_profile("prod"))
    assert st["issuer"] == "https://env.example.com"
    assert st["scope"] == "openid profile"
    assert st["client_id"] == "cli-prod"  # unset env falls back to config


def test_per_profile_token_caches_and_bare_logout_clears_all(
    monkeypatch, tmp_path, capsys
):
    """#1403: each profile caches tokens in tokens-<name>.json;
    `logout --profile X` clears only X's cache; BARE logout clears the
    plain tokens.json AND every per-profile cache."""
    monkeypatch.setenv("HOME", str(tmp_path))
    _use(monkeypatch, "reference_config_profiles.json")
    token_dir = tmp_path / ".micromegas_spark"
    token_dir.mkdir()
    files = {
        "plain": token_dir / "tokens.json",
        "dev": token_dir / "tokens-dev.json",
        "prod": token_dir / "tokens-prod.json",
    }
    for p in files.values():
        p.write_text("{}")
    # the per-profile path helper agrees with the files #1403 writes
    assert default_token_file("dev") == str(files["dev"])
    assert default_token_file(None) == str(files["plain"])

    assert cli.main(["logout", "--profile", "prod"]) == 0
    assert not files["prod"].exists()
    assert files["plain"].exists() and files["dev"].exists()

    assert cli.main(["logout"]) == 0
    assert not any(p.exists() for p in files.values())
    capsys.readouterr()
