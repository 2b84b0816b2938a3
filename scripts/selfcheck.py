"""Strict driver-style self-check: Spark query vs DuckDB oracle at sf0.01,
compared at the PANDAS level (dtype-sensitive), mirroring the driver's
value-hash. Catches HUGEINT->float64 / int32-vs-int64 drifts that plain
Python equality misses (the round-1 failure mode, see ADVICE.md).

Usage: python scripts/selfcheck.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from micromegas_spark.queries import REGISTRY
from micromegas_spark.session import get_spark
from micromegas_spark.sources.tables import TEST_TABLES

SF_DIR = os.environ.get("SELFCHECK_SF", "/root/testdata/sf0.01")


def canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "<null>"
        # driver-style: floats hashed by rounded repr; ints as ints. A
        # float64 1.0 and int64 1 must NOT collide (that is the bug class
        # we are hunting), so keep the type tag.
        return f"f:{f:.9g}"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return f"i:{int(v)}"
    if isinstance(v, (np.bool_, bool)):
        return f"b:{bool(v)}"
    if isinstance(v, bytes):
        return "x:" + v.hex()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return "s:" + str(v)


def frame_canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    df = df[cols]
    rows = ["|".join(canon_cell(v) for v in row) for row in df.itertuples(index=False)]
    return cols, sorted(rows)


def main(names):
    spark = get_spark("selfcheck", cpus=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    duck = duckdb.connect()
    for t in TEST_TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    bad = []
    for name in names:
        q = REGISTRY[name]
        try:
            sdf = q.spark(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {e}")
            bad.append(name)
            continue
        if q.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            ddf = duck.sql(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error {e}")
            bad.append(name)
            continue
        scols, srows = frame_canon(sdf)
        dcols, drows = frame_canon(ddf)
        if scols != dcols:
            print(f"FAIL  {name}: cols {scols} vs {dcols}")
            bad.append(name)
        elif len(srows) != len(drows):
            print(f"FAIL  {name}: rows {len(srows)} vs {len(drows)}")
            bad.append(name)
        elif srows != drows:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
            )
            print(f"FAIL  {name}: first diff row {diff[0]}:\n  spark  {diff[1][:300]}\n  oracle {diff[2][:300]}")
            bad.append(name)
        else:
            print(f"ok    {name}: {len(srows)} rows")
    print(f"\n{len(names) - len(bad)}/{len(names)} ok; failing: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    names = sys.argv[1:] or sorted(REGISTRY.keys())
    raise SystemExit(main(names))
