"""The reference's custom SQL function surface (SURVEY §2.8), re-expressed as
native Spark Column expressions wherever possible (JVM-side, codegen-able;
UDFs only where Spark genuinely lacks the primitive, e.g. JSONPath filter
predicates).

``register_all(spark)`` exposes every function to SQL so both the DataFrame
and ``spark.sql`` surfaces work, mirroring the reference's session-wide UDF
registration (rust/analytics/src/lakehouse/query.rs:96-204).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_all(spark: SparkSession) -> None:
    from micromegas_spark.functions import (
        color,
        datetime_fns,
        histogram,
        jsonb,
        math_fns,
        properties,
        udtfs,
    )

    for mod in (math_fns, color, datetime_fns, properties, jsonb, histogram, udtfs):
        mod.register(spark)
