"""Differential harness mirroring the driver's correctness gate:

for every registered query, run the Spark DataFrame implementation AND the
DuckDB oracle SQL on the same sf parquet tables, then compare row count,
column names, and order-insensitive values (exact equality — the queries are
designed for bitwise determinism, see queries/registry.py conventions).
"""

from __future__ import annotations

import math

import pytest

from micromegas_spark.queries import REGISTRY
from tests.conftest import SF_CORRECT, register_duck_views


def _normalize(rows, colnames):
    """Sort columns by name (as the driver does), canonicalize values."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def canon(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return v
        return v

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))


@pytest.mark.parametrize("name", sorted(REGISTRY.keys()))
def test_query_matches_oracle(name, spark, duck):
    q = REGISTRY[name]
    sdf = q.spark(spark, SF_CORRECT)
    srows = sdf.collect()
    scols = sdf.columns

    if q.oracle is None:
        assert len(srows) >= 0  # rows-only check, mirroring the driver
        return

    register_duck_views(duck, SF_CORRECT)
    drel = duck.sql(q.oracle)
    drows = drel.fetchall()
    dcols = [d[0] for d in drel.description]

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"

    s_norm = _normalize([tuple(r) for r in srows], scols)
    d_norm = _normalize(drows, dcols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
