"""Command-line query tool + server launcher — the reference's CLI surface
(python/micromegas/micromegas/cli/query.py: positional SQL or --file/'-',
--begin/--end accepting RFC 3339 or relative deltas ('1h', '30m', '7d'),
--all, --format table|csv|json, --max-colwidth) over either runtime:

    python -m micromegas_spark.cli "SELECT ..." --all --sf-dir /root/testdata/sf0.01
    python -m micromegas_spark.cli --uri grpc://host:50051 "SELECT ..." --begin 1h
    python -m micromegas_spark.cli serve --sf-dir ... --port 50051

``--uri`` talks FlightSQL to a running server (flightsql/client.py);
without it an in-process Engine over ``--sf-dir`` answers directly.
``serve`` starts the FlightSQL server on the same engine. The table
formatter is dependency-free (no tabulate wheel in this environment).
"""

from __future__ import annotations

import argparse
import datetime
import pathlib
import sys


def parse_timestamp(value: str | None):
    """RFC 3339 timestamp or relative delta → tz-aware datetime
    (cli/query.py:13-32: deltas are 'now - delta')."""
    from micromegas_spark.timeutils import parse_datetime, parse_time_delta

    if value is None:
        return None
    try:
        delta = parse_time_delta(value)
        return datetime.datetime.now(datetime.timezone.utc) - delta
    except (RuntimeError, ValueError):
        pass
    dt = parse_datetime(value)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=datetime.timezone.utc)
    return dt


def truncate_value(value, max_width: int):
    if value is None:
        return value
    s = str(value)
    if len(s) <= max_width:
        return s
    if max_width <= 3:  # no room for an ellipsis — hard cut
        return s[:max_width]
    return s[: max_width - 3] + "..."


def _format_table(df, max_colwidth: int) -> str:
    if max_colwidth > 0:
        df = df.copy()
        for col in df.columns:
            df[col] = df[col].apply(lambda x: truncate_value(x, max_colwidth))
    cells = [[str(c) for c in df.columns]] + [
        ["" if v is None else str(v) for v in row] for row in df.itertuples(index=False)
    ]
    widths = [max(len(r[i]) for r in cells) for i in range(len(cells[0]))]
    lines = [
        "  ".join(c.ljust(w) for c, w in zip(cells[0], widths)).rstrip(),
        "  ".join("-" * w for w in widths),
    ]
    lines += ["  ".join(c.ljust(w) for c, w in zip(r, widths)).rstrip() for r in cells[1:]]
    return "\n".join(lines)


def read_sql_source(args) -> str:
    if args.file:
        if args.file == "-":
            return sys.stdin.read().strip()
        return pathlib.Path(args.file).read_text(encoding="utf-8").strip()
    return args.sql


def _load_profile(explicit: str | None) -> dict:
    """AWS-CLI-style named connection profiles (reference unreleased
    changelog: --profile / MICROMEGAS_PROFILE / default_profile in
    ~/.micromegas/config.json selecting one of several named connections).

    Config file (override path with $MICROMEGAS_SPARK_CONFIG; default
    ~/.micromegas_spark/config.json):

        {"default_profile": "local",
         "profiles": {"local": {"sf_dir": "...", "cpus": "8"},
                      "prod":  {"uri": "grpc://host:50051"}}}

    Precedence for which profile applies: --profile >
    $MICROMEGAS_SPARK_PROFILE > config's default_profile > none. Explicit
    CLI flags always beat profile values. A profile named but missing is
    an error; an absent config file is only an error when a profile was
    explicitly requested.

    A config with NO ``profiles`` map is the reference's original FLAT
    shape (cli/config.py resolve_active_profile) — the top-level dict is
    the connection config itself, so a reference user's flat config.json
    works verbatim; naming a profile against it is an error, matching
    the reference's ProfileError."""
    import json
    import os

    path = os.environ.get(
        "MICROMEGAS_SPARK_CONFIG",
        os.path.join(os.path.expanduser("~"), ".micromegas_spark", "config.json"),
    )
    name = explicit or os.environ.get("MICROMEGAS_SPARK_PROFILE")
    if not os.path.exists(path):
        if name:
            raise FileNotFoundError(
                f"profile {name!r} requested but no config at {path}"
            )
        return {}
    with open(path, encoding="utf-8") as f:
        cfg = json.load(f)
    profiles = cfg.get("profiles")
    if profiles is None:
        # FLAT config (the reference's original shape,
        # cli/config.py resolve_active_profile: no `profiles` map → the
        # top-level dict IS the active connection config). Naming a
        # profile against a flat config is the reference's ProfileError.
        if name:
            raise KeyError(
                f"profile {name!r} requested but {path} has no 'profiles' map"
            )
        return {
            k: v for k, v in cfg.items() if k not in ("profiles", "default_profile")
        }
    name = name or cfg.get("default_profile")
    if not name:
        return {}
    if name not in profiles:
        raise KeyError(
            f"unknown profile {name!r} in {path} (known: {sorted(profiles)})"
        )
    # carry the resolved name for per-profile derived paths (the OIDC
    # token cache keys on it, #1403) without changing the return shape
    out = dict(profiles[name])
    out["_profile_name"] = name
    return out


def _oidc_auth_provider(profile: dict):
    """When the active profile (or MICROMEGAS_OIDC_* env, which wins —
    #1408) configures an OIDC issuer + client id, build the auth provider
    for the remote connection: cached tokens from the PROFILE's token file
    (tokens-<name>.json, #1403), browser login if absent. Returns None
    when OIDC isn't configured — bare bearer/anonymous connections keep
    working untouched."""
    from micromegas_spark.flightsql.oidc import (
        default_token_file,
        load_or_login,
        resolve_oidc_settings,
    )

    st = resolve_oidc_settings(profile)
    if not (st["issuer"] and st["client_id"]):
        return None
    return load_or_login(
        st["issuer"],
        st["client_id"],
        client_secret=st["client_secret"],
        token_file=default_token_file(profile.get("_profile_name")),
        audience=st["audience"],
        scope=st["scope"],
    )


def _version_string() -> str:
    """Package + interpreter version and path (reference unreleased
    changelog: --version on micromegas-query reports 'micromegas-query
    0.29.0 (Python 3.11.9 at /usr/bin/python3.11)') so it's easy to tell
    which install and interpreter back the console script."""
    import platform

    from micromegas_spark import __version__

    return (
        f"micromegas-spark {__version__} "
        f"(Python {platform.python_version()} at {sys.executable})"
    )


def _query_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="micromegas-spark",
        description="Run SQL against the engine (in-process or FlightSQL); "
        "'micromegas-spark serve' starts a FlightSQL server",
    )
    p.add_argument("sql", nargs="?", default=None,
                   help="SQL query to execute (or use --file)")
    p.add_argument("--file", help="Read SQL from a file path ('-' for stdin)")
    p.add_argument("--begin",
                   help="Begin timestamp (RFC 3339, or relative like '1h', '30m', '7d')")
    p.add_argument("--end", help="End timestamp (defaults to now when --begin is set)")
    p.add_argument("--all", action="store_true",
                   help="Query the entire time range (no time filtering)")
    p.add_argument("--format", choices=["table", "csv", "json"], default="table")
    p.add_argument("--max-colwidth", type=int, default=50,
                   help="Max column width for table format (0 = unlimited)")
    p.add_argument("--uri", help="FlightSQL server URI (grpc://host:port)")
    p.add_argument("--sf-dir", default=None,
                   help="Local parquet dir for the in-process engine "
                        "(default: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.01)")
    p.add_argument("--cpus", default=None, help="local[N] parallelism for in-process mode")
    p.add_argument("--version", action="version", version=_version_string(),
                   help="Report package + interpreter version and exit")
    p.add_argument("--profile", default=None,
                   help="Named connection profile from "
                        "~/.micromegas_spark/config.json (or "
                        "$MICROMEGAS_SPARK_CONFIG); supplies uri/sf_dir/"
                        "cpus defaults — explicit flags win")
    p.add_argument("--show-audit", action="store_true",
                   help="After the result, print the query's audit record "
                        "(query_id, error class, peak execution memory, "
                        "spill, shuffle bytes) to stderr — reference "
                        "QueryAuditRecord parity (#1406)")
    return p


def _serve_parser() -> argparse.ArgumentParser:
    s = argparse.ArgumentParser(
        prog="micromegas-spark serve",
        description="Start a FlightSQL server over the engine",
    )
    s.add_argument("--port", type=int, default=50051)
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--sf-dir", default=None)
    s.add_argument("--cpus", default=None)
    s.add_argument("--auth-token", default=None,
                   help="require 'authorization: Bearer <token>' on every call")
    s.add_argument("--admin", action="store_true",
                   help="serve an admin engine (partition-admin actions enabled)")
    s.add_argument("--apikey-store", default=None,
                   help="JSON key-store path: callers must present a valid "
                        "stored API key as their bearer token, and (with "
                        "--admin) the CreateApiKey/ListApiKeys/RevokeApiKey "
                        "actions manage this store remotely")
    return s


def _default_sf_dir(arg):
    import os

    return arg or os.environ.get("SPARK_GRAFT_SF_DIR") or "/root/testdata/sf0.01"


def _in_process_client(sf_dir: str, cpus):
    from micromegas_spark.client import Client
    from micromegas_spark.engine import Engine
    from micromegas_spark.session import get_spark

    spark = get_spark("micromegas-cli", cpus=cpus)
    return Client(Engine.from_test_tables(spark, sf_dir))


def _logout_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="micromegas-spark logout",
        description="Clear saved OIDC authentication tokens",
    )
    p.add_argument("--profile", default=None,
                   help="Only clear this profile's cached tokens")
    p.add_argument("--version", action="version", version=_version_string())
    return p


def cmd_logout(args) -> int:
    """Reference micromegas-logout (#1403 behavior change): bare logout
    clears EVERY cached token file — the plain tokens.json plus every
    tokens-<profile>.json — so no profile keeps a stale credential;
    --profile <name> clears only that profile's cache (reference
    cli/logout.py:9-40)."""
    import os
    from pathlib import Path

    from micromegas_spark.flightsql.oidc import default_token_file

    if args.profile is not None:
        try:
            targets = [Path(default_token_file(args.profile))]
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
    else:
        token_dir = Path(os.path.expanduser("~")) / ".micromegas_spark"
        targets = [
            token_dir / "tokens.json",
            *sorted(token_dir.glob("tokens-*.json")),
        ]
    removed = False
    for token_file in targets:
        if token_file.exists():
            token_file.unlink()
            print(f"Tokens cleared from {token_file}")
            removed = True
    if not removed:
        print("No saved tokens found")
    return 0


def cmd_serve(args) -> int:
    from micromegas_spark.engine import Engine
    from micromegas_spark.flightsql.server import FlightSQLServer
    from micromegas_spark.session import get_spark

    spark = get_spark("micromegas-flightsql", cpus=args.cpus)
    engine = Engine.from_test_tables(spark, _default_sf_dir(args.sf_dir))
    engine.admin = bool(args.admin)
    key_store = None
    if getattr(args, "apikey_store", None):
        from micromegas_spark.flightsql.apikeys import ApiKeyStore

        key_store = ApiKeyStore(args.apikey_store)
    server = FlightSQLServer(
        engine,
        location=f"grpc://{args.host}:{args.port}",
        auth_token=args.auth_token,
        key_store=key_store,
    )
    print(f"serving FlightSQL on {server.uri}", flush=True)
    server.serve()  # blocks until killed
    return 0


def _vacuum_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="micromegas-spark vacuum",
        description="Sweep orphaned partition data dirs no manifest "
                    "references (crash debris between a data write and "
                    "its manifest commit, CAS losers) — the reference's "
                    "retention-daemon sweep (maintenance.rs:349-399) as "
                    "a standalone spelling; maintenance_tick also runs "
                    "it per tick",
    )
    p.add_argument("warehouse", help="warehouse root (path or URI)")
    p.add_argument("--view", action="append", default=None,
                   help="only these view sets (default: every view in "
                        "the catalog)")
    p.add_argument("--grace", type=float, default=3600.0,
                   help="min orphan age in seconds before deletion "
                        "(protects in-flight writes; default 3600)")
    return p


def cmd_vacuum(args) -> int:
    # driver-side catalog+fs walk: no SparkSession needed
    from micromegas_spark.materialize.batch import Lakehouse

    lake = Lakehouse(None, args.warehouse)
    views = args.view or lake.list_view_sets()
    total = 0
    for v in views:
        n = lake.vacuum_orphans(v, min_age_seconds=args.grace)
        print(f"{v}: removed {n} orphan dir(s)")
        total += n
    print(f"total: {total}")
    return 0


def _apikeys_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="micromegas-spark apikeys",
        description="Mint, list, and revoke API keys (reference #1383 "
        "/auth/api_keys admin surface; mkdocs/docs/admin/api-keys.md): "
        "either directly against a local store file (--store) or "
        "remotely against an admin FlightSQL server (--uri). A minted "
        "key's plaintext is printed ONCE and never stored.",
    )
    p.add_argument("op", choices=["mint", "list", "revoke"])
    p.add_argument("name", nargs="?", default=None,
                   help="key name (required for mint/revoke)")
    p.add_argument("--by", default="",
                   help="audit identity recorded as created_by/revoked_by")
    p.add_argument("--store", default=None,
                   help="local key-store JSON path (direct access)")
    p.add_argument("--uri", default=None,
                   help="FlightSQL server URI (remote admin actions)")
    p.add_argument("--bearer", default=None,
                   help="bearer credential for --uri (an existing API key "
                        "or static token; OIDC profiles also work via "
                        "--profile)")
    p.add_argument("--profile", default=None,
                   help="named connection profile (supplies uri/OIDC)")
    p.add_argument("--format", choices=["table", "json"], default="table")
    p.add_argument("--version", action="version", version=_version_string())
    return p


def cmd_apikeys(args) -> int:
    """CLI e2e for the key-admin surface: 'mint' prints the plaintext to
    stdout (once — pipe it straight to a secret store), 'list' prints the
    audit trail, 'revoke' confirms. Exactly one of --store/--uri picks
    local vs remote."""
    if args.op in ("mint", "revoke") and not args.name:
        print(f"error: {args.op} requires a key name", file=sys.stderr)
        return 2
    try:
        profile = _load_profile(args.profile)
    except (OSError, KeyError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    uri = args.uri or (profile.get("uri") if not args.store else None)
    if bool(args.store) == bool(uri):
        print("error: pass exactly one of --store (local) or --uri (remote)",
              file=sys.stderr)
        return 2

    if args.store:
        from micromegas_spark.flightsql.apikeys import ApiKeyStore

        store = ApiKeyStore(args.store)
        try:
            if args.op == "mint":
                print(store.create_key(args.name, created_by=args.by))
                print(f"key {args.name!r} minted; the plaintext above is "
                      "shown once and not stored", file=sys.stderr)
            elif args.op == "revoke":
                store.revoke(args.name, revoked_by=args.by)
                print(f"key {args.name!r} revoked")
            else:
                keys = store.list_keys()
                _print_keys(keys, args.format)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        return 0

    from micromegas_spark.flightsql.client import FlightSQLClient

    headers = {"authorization": f"Bearer {args.bearer}"} if args.bearer else None
    try:
        auth = _oidc_auth_provider(profile) if not args.bearer else None
    except Exception as e:
        print(f"error: OIDC login failed: {e}", file=sys.stderr)
        return 2
    with FlightSQLClient(uri, headers=headers, auth_provider=auth) as client:
        try:
            if args.op == "mint":
                out = client.create_api_key(args.name, created_by=args.by)
                print(out["result"]["key"])
                print(f"key {args.name!r} minted; the plaintext above is "
                      "shown once and not stored", file=sys.stderr)
            elif args.op == "revoke":
                client.revoke_api_key(args.name, revoked_by=args.by)
                print(f"key {args.name!r} revoked")
            else:
                _print_keys(client.list_api_keys()["result"]["keys"], args.format)
        except Exception as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
    return 0


def _print_keys(keys: list, fmt: str) -> None:
    import json as _json

    if fmt == "json":
        print(_json.dumps(keys, indent=2, sort_keys=True))
        return
    if not keys:
        print("no keys")
        return
    import pandas as pd

    cols = ["name", "created_at", "created_by", "last_used_at",
            "revoked_at", "revoked_by"]
    print(_format_table(pd.DataFrame([{c: k.get(c) for c in cols} for k in keys]), 0))


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # a subcommand and a positional SQL argument can't share one argparse
    # parser; 'serve' is dispatched by its leading token (and a query
    # starting with SELECT never collides)
    if argv[:1] == ["serve"]:
        return cmd_serve(_serve_parser().parse_args(argv[1:]))
    if argv[:1] == ["logout"]:
        return cmd_logout(_logout_parser().parse_args(argv[1:]))
    if argv[:1] == ["apikeys"]:
        return cmd_apikeys(_apikeys_parser().parse_args(argv[1:]))
    if argv[:1] == ["vacuum"]:
        return cmd_vacuum(_vacuum_parser().parse_args(argv[1:]))
    if argv[:1] == ["query"]:
        argv = argv[1:]
    parser = _query_parser()
    args = parser.parse_args(argv)

    try:
        profile = _load_profile(args.profile)
    except (OSError, KeyError, ValueError) as e:
        parser.error(str(e))
    if args.uri is None:
        args.uri = profile.get("uri")
    if args.sf_dir is None and "sf_dir" in profile:
        args.sf_dir = profile["sf_dir"]
    if args.cpus is None and "cpus" in profile:
        args.cpus = str(profile["cpus"])

    if args.file and args.sql:
        parser.error("cannot use both positional SQL and --file")
    if not args.file and not args.sql:
        parser.error("must provide SQL as a positional argument or via --file")
    try:
        sql = read_sql_source(args)
    except OSError as e:
        parser.error(f"cannot read file '{args.file}': {e}")

    if not args.begin and not args.all:
        parser.error("--begin is required (or use --all for the entire time range)")
    if args.all and (args.begin or args.end):
        parser.error("--all and --begin/--end are mutually exclusive")

    def ts(flag, value):
        try:
            return parse_timestamp(value)
        except (ValueError, OverflowError):
            parser.error(
                f"invalid --{flag} timestamp {value!r}: expected RFC 3339 "
                f"(e.g. 2026-01-01T00:00:00Z) or a delta like '1h', '30m', '7d'"
            )

    begin, end = ts("begin", args.begin), ts("end", args.end)
    if begin is not None and end is None:
        end = datetime.datetime.now(datetime.timezone.utc)

    _AUDIT_COLS = (
        "SELECT query_id, error_class, peak_execution_memory_bytes, "
        "memory_spill_bytes, disk_spill_bytes, shuffle_write_bytes "
        "FROM query_log WHERE sql = {} ORDER BY time_ns DESC LIMIT 1"
    )

    def _print_audit(audit_df) -> None:
        if len(audit_df) == 0:
            print("audit: no record found", file=sys.stderr)
            return
        rec = audit_df.iloc[0]
        print(
            f"audit: query_id={rec['query_id']} error_class={rec['error_class']} "
            f"peak_execution_memory_bytes={rec['peak_execution_memory_bytes']} "
            f"memory_spill_bytes={rec['memory_spill_bytes']} "
            f"disk_spill_bytes={rec['disk_spill_bytes']} "
            f"shuffle_write_bytes={rec['shuffle_write_bytes']}",
            file=sys.stderr,
        )

    if args.uri:
        from micromegas_spark.flightsql.client import FlightSQLClient

        try:
            auth = _oidc_auth_provider(profile)
        except Exception as e:
            parser.error(f"OIDC login failed: {e}")
        with FlightSQLClient(args.uri, auth_provider=auth) as client:
            df = client.query(sql, begin, end)
            if args.show_audit:
                # the audit lives server-side; fetch this statement's most
                # recent record over the same wire (the wire surface has
                # no parameter binding — handles are SQL text — so the
                # statement text is matched as an escaped literal)
                esc = sql.strip().replace("'", "''")
                _print_audit(client.query(_AUDIT_COLS.format(f"'{esc}'")))
    else:
        from micromegas_spark.timeutils import to_epoch_ns

        client = _in_process_client(_default_sf_dir(args.sf_dir), args.cpus)
        df = client.query(sql, to_epoch_ns(begin), to_epoch_ns(end))
        if args.show_audit:
            _print_audit(
                client.engine.resolve(
                    _AUDIT_COLS.format(":sql"), args={"sql": sql.strip()}
                ).toPandas()
            )

    if df.empty:
        print("no data")
        return 0
    if args.format == "table":
        print(_format_table(df, args.max_colwidth))
    elif args.format == "csv":
        print(df.to_csv(index=False), end="")
    else:
        print(df.to_json(orient="records", indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
