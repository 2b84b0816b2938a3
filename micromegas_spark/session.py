"""SparkSession construction and tuning.

The reference builds a DataFusion SessionContext per query with UDFs and view
providers registered (rust/analytics/src/lakehouse/query.rs:207-256). Our
equivalent is one long-lived SparkSession with:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) — this
  is what makes the same code survive a 100x scale-up without manual tuning;
- Arrow transfer on (every pandas_udf / toPandas path is vectorized);
- shuffle partitions sized to the parallelism at hand (local mode: cores;
  cluster: leave to AQE coalescing from a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to *any* session handed to us (e.g. the
# driver's). Keep strictly to dynamic confs — static ones need builder time.
RUNTIME_CONFS = {
    # The synthetic events table stores TIMESTAMP(NANOS) which Spark cannot
    # read natively; read as epoch-nanosecond BIGINT and convert explicitly
    # (sources/tables.py). The reference is nanosecond-native throughout
    # (SURVEY §1.3), so we keep ns longs wherever sub-µs math matters.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # timezone-stable date functions regardless of host tz
    "spark.sql.session.timeZone": "UTC",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply dynamic confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # conf may be static/readonly in exotic deployments; queries are
            # written to degrade gracefully where possible.
            pass
    return spark


def get_spark(app_name: str = "micromegas-spark", cpus: int | str | None = None) -> SparkSession:
    """Build (or fetch) a tuned local session.

    On a real cluster the master/resources come from spark-submit; everything
    here except master() is cluster-appropriate as-is.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())
