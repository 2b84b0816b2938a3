"""External table providers (SURVEY §2.1 S6/S7/S8): CSV / JSON / parquet
registration, mirroring the reference's csv_table_provider /
json_table_provider (rust/analytics/src/dfext/csv_table_provider.rs:28,
json_table_provider.rs:87) and the static-tables session configurator
(static_tables_configurator.rs).

Spark's readers already do schema inference, compression, partition
discovery and predicate pushdown; these helpers add the reference's
register-by-URL surface so SQL can target the table by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_csv(
    spark: SparkSession, name: str, url: str, header: bool = True, **options
) -> DataFrame:
    """csv_table_provider(ctx, url) analogue: read + register temp view."""
    df = spark.read.options(header=header, inferSchema=True, **options).csv(url)
    df.createOrReplaceTempView(name)
    return df


def register_json(spark: SparkSession, name: str, url: str, **options) -> DataFrame:
    """json_table_provider(ctx, url) analogue (JSON Lines)."""
    df = spark.read.options(**options).json(url)
    df.createOrReplaceTempView(name)
    return df


def register_parquet(spark: SparkSession, name: str, url: str) -> DataFrame:
    df = spark.read.parquet(url)
    df.createOrReplaceTempView(name)
    return df


def register_static_tables(spark: SparkSession, tables: dict[str, str]) -> None:
    """Session configurator hook: register extra deployment tables by
    name → URL (format inferred from extension)."""
    for name, url in tables.items():
        if url.endswith(".csv"):
            register_csv(spark, name, url)
        elif url.endswith((".json", ".jsonl", ".ndjson")):
            register_json(spark, name, url)
        else:
            register_parquet(spark, name, url)
