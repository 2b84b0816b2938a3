"""Math scalar functions: lerp / unlerp / bin_center.

Reference: rust/datafusion-extensions/src/math/lerp.rs (92 LoC),
math/unlerp.rs (93), binning/bin_center.rs (92); docs
functions-reference.md:1232-1256. Semantics preserved: no clamping,
NaN/Inf propagate; bin_center snaps to the center of zero-centered bins
[c - cs/2, c + cs/2).

All are pure Column expressions — whole-stage-codegen friendly, no Python in
the executor path.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def lerp(a: Column, b: Column, t: Column) -> Column:
    """a + (b - a) * t, no clamping (lerp.rs)."""
    return a + (b - a) * t


def unlerp(a: Column, b: Column, x: Column) -> Column:
    """(x - a) / (b - a); NULL when a == b would divide by zero → NaN/Inf
    propagate exactly as in the reference (unlerp.rs)."""
    return (x - a) / (b - a)


def bin_center(coord: Column, cell_size: Column | float) -> Column:
    """Snap coord to the center of its zero-centered bin (bin_center.rs:92).

    Bin k covers [k*cs - cs/2, k*cs + cs/2); the returned value is k*cs.
    """
    cs = F.lit(cell_size) if not isinstance(cell_size, Column) else cell_size
    return F.floor(coord / cs + 0.5).cast("double") * cs


def register(spark: SparkSession) -> None:
    """Expose the SQL spelling via Spark 4 SQL UDFs (CREATE TEMPORARY
    FUNCTION ... RETURN <expr>), matching the reference's session-wide
    registration (query.rs:96-204). The Column API above stays primary."""
    for name, arglist, expr in [
        ("lerp", "a DOUBLE, b DOUBLE, t DOUBLE", "a + (b - a) * t"),
        ("unlerp", "a DOUBLE, b DOUBLE, x DOUBLE", "(x - a) / (b - a)"),
        ("bin_center", "coord DOUBLE, cs DOUBLE", "CAST(floor(coord / cs + 0.5) AS DOUBLE) * cs"),
    ]:
        try:
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({arglist}) RETURNS DOUBLE RETURN {expr}"
            )
        except Exception:
            pass  # SQL-surface registration is best-effort; Column API is primary
