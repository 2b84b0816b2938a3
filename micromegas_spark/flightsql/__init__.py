"""Arrow FlightSQL wire surface: network server over the Engine plus a
reference-framing-compatible client. See server.py / client.py / pb.py."""

from micromegas_spark.flightsql import pb  # noqa: F401


def __getattr__(name):
    # lazy: importing the package must not require pyarrow.flight
    if name == "FlightSQLServer":
        from micromegas_spark.flightsql.server import FlightSQLServer

        return FlightSQLServer
    if name in ("FlightSQLClient", "PreparedStatement", "make_call_headers"):
        from micromegas_spark.flightsql import client as _c

        return getattr(_c, name)
    if name in (
        "OidcAuthProvider",
        "OidcClientCredentialsProvider",
        "load_or_login",
        "connect",
    ):
        from micromegas_spark.flightsql import oidc as _o

        return getattr(_o, name)
    raise AttributeError(name)
