"""Datetime functions: date_bin and friends.

The reference leans on DataFusion's ``date_bin(interval, ts)`` for all
pre-aggregation (log_stats_view.rs:34; SURVEY §2.8 F21). Spark has
``date_trunc`` (calendar units only) and ``window`` (streaming-oriented);
arbitrary-stride binning is this one-liner over epoch integers — pure
codegen-able arithmetic, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def date_bin(stride_seconds: int, ts: Column, origin_epoch: int = 0) -> Column:
    """Floor ``ts`` (TimestampType) to a stride-aligned bucket, like
    DataFusion's date_bin(INTERVAL, ts, origin). Returns TimestampType.

    pmod (not %) so pre-origin timestamps floor to the earlier bucket —
    Spark's % follows the dividend's sign (DataFusion date_bin floors)."""
    us = F.unix_micros(ts)
    stride_us = int(stride_seconds) * 1_000_000
    origin_us = int(origin_epoch) * 1_000_000
    binned = ((us - origin_us) - F.pmod(us - origin_us, F.lit(stride_us))) + origin_us
    return F.timestamp_micros(binned)


def date_bin_epoch(stride_seconds: int, ts_us: Column) -> Column:
    """Same, over epoch-µs BIGINT columns (the ns-native event tables);
    returns the bucket start as epoch seconds BIGINT (exact: the bucket
    start is stride-aligned, so the µs→s division is integral)."""
    stride_us = int(stride_seconds) * 1_000_000
    binned_us = ts_us - F.pmod(ts_us, F.lit(stride_us))
    return (binned_us / F.lit(1_000_000)).cast("bigint")


def register(spark: SparkSession) -> None:
    try:
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION date_bin_s(stride_s BIGINT, ts TIMESTAMP) "
            "RETURNS TIMESTAMP RETURN "
            "timestamp_micros(unix_micros(ts) - (unix_micros(ts) % (stride_s * 1000000)))"
        )
    except Exception:
        pass
