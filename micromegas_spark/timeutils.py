"""Time helpers — parity with the reference client's time utilities
(python/micromegas/micromegas/time.py:12-160: format_datetime,
parse_datetime, parse_time_delta).

The engine's out-of-band query range is epoch-nanoseconds (ns is the
reference's native resolution, span_table.rs:56-65); ``to_epoch_ns``
is the bridge accepting whatever callers hold — datetime, pandas
Timestamp, RFC 3339 string, or a raw int — so the Client helper methods
can take reference-style ``(begin, end)`` datetimes directly.
"""

from __future__ import annotations

from micromegas_spark.flightsql.errors import InvalidArgument

import datetime
import re


def parse_datetime(value: str) -> datetime.datetime:
    """RFC 3339 string → timezone-aware datetime. RFC 3339 §5.6 allows a
    lowercase 'z' UTC designator which ``fromisoformat`` rejects —
    normalize it (reference time.py:71-97 does the same)."""
    if value.endswith("z"):
        value = value[:-1] + "Z"
    return datetime.datetime.fromisoformat(value)


def format_datetime(value) -> str | None:
    """datetime / pandas.Timestamp / RFC 3339 string / None → canonical
    RFC 3339 string (reference time.py:12-69). Naive datetimes are
    rejected: an ambiguous range silently shifted by the server's zone is
    the bug class this guards against."""
    import pandas as pd

    if value is None:
        return None
    if isinstance(value, pd.Timestamp):
        return value.isoformat()
    if isinstance(value, datetime.datetime):
        if value.tzinfo is None:
            raise InvalidArgument("datetime needs a time zone (use timezone.utc)")
        return value.isoformat()
    if isinstance(value, str):
        return format_datetime(parse_datetime(value))
    raise InvalidArgument(f"unsupported type for format_datetime: {type(value).__name__}")


_DELTA_RE = re.compile(r"^(\d+)([smhd])$")


def parse_time_delta(user_string: str) -> datetime.timedelta:
    """'30m' / '2h' / '7d' (and 's') → timedelta (reference
    time.py:97-160; 's' is our addition for sub-minute cadences,
    matching the daemon's 1-second tick, maintenance.rs:140-212)."""
    m = _DELTA_RE.match(user_string)
    if not m:
        raise InvalidArgument(
            f"invalid time delta {user_string!r}: expected <number><s|m|h|d>"
        )
    n, unit = int(m.group(1)), m.group(2)
    return datetime.timedelta(
        **{{"s": "seconds", "m": "minutes", "h": "hours", "d": "days"}[unit]: n}
    )


def to_epoch_ns(value) -> int | None:
    """Anything time-like → epoch nanoseconds (the engine's range unit).

    int/None pass through; datetime must be tz-aware; pandas.Timestamp
    keeps its ns resolution; strings go through parse_datetime.
    """
    import pandas as pd

    if value is None or isinstance(value, int):
        return value
    if isinstance(value, pd.Timestamp):
        if value.tzinfo is None:
            raise InvalidArgument("Timestamp needs a time zone")
        return int(value.value)
    if isinstance(value, datetime.datetime):
        if value.tzinfo is None:
            raise InvalidArgument("datetime needs a time zone (use timezone.utc)")
        return int(value.timestamp() * 1_000_000) * 1_000
    if isinstance(value, str):
        return to_epoch_ns(parse_datetime(value))
    raise InvalidArgument(f"unsupported type for to_epoch_ns: {type(value).__name__}")
