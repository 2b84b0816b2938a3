"""SQL spellings for the reference's table-valued functions via Python
UDTFs (SURVEY §2.10; registration query.rs:104-176, jsonb/each.rs:273).

The DataFrame analogues live elsewhere (sources/payload.parse_block as an
Arrow mapInPandas fan-out; functions/jsonb.jsonb_each as explode) and are
the scale path — a lateral Python UDTF evaluates row-at-a-time in one
Python worker per task, which is fine for the interactive SQL spelling the
reference exposes but loses Arrow batching. Both spellings share the
same decode code so they cannot drift.

``view_instance`` deliberately has NO UDTF spelling: funneling a whole
materialized view instance through a row-yielding Python generator would
serialize a partitioned parquet scan into one worker. The Python API
(engine.view_instance) returning a real DataFrame scan is the honest Spark
shape for that one.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from micromegas_spark.sources.payload import decode_block


def _fmt(v):
    """get_json_object value semantics, so the SQL spelling agrees with
    the DataFrame spelling (functions/jsonb.jsonb_each) and the
    events_jsonb_each oracle: strings unquoted, JSON null → SQL NULL,
    everything else rendered as JSON text."""
    if v is None:
        return None
    if isinstance(v, str):
        return v
    return json.dumps(v, separators=(",", ":"))


def register(spark: SparkSession) -> None:
    """Register parse_block / jsonb_each / jsonb_array_elements for SQL:

        SELECT p.* FROM block_payloads, LATERAL parse_block(block_id, payload) p
        SELECT * FROM jsonb_each('{"a": 1}')

    No-op (with a warning comment in docs) on Spark < 3.5 where Python
    UDTFs don't exist."""
    try:
        from pyspark.sql.functions import udtf
    except ImportError:  # pragma: no cover - Spark < 3.5
        return

    @udtf(returnType="block_id string, object_index bigint, type_name string, value string")
    class ParseBlockUDTF:
        def eval(self, block_id, payload):
            if payload is None:
                return
            for i, obj in enumerate(decode_block(bytes(payload))):
                yield (
                    block_id,
                    i,
                    obj.get("__type", "?"),
                    json.dumps(obj, separators=(",", ":"), sort_keys=True),
                )

    @udtf(returnType="key string, value string")
    class JsonbEachUDTF:
        # objects AND arrays (key = index string) — jsonb/each.rs semantics
        def eval(self, j):
            if j is None:
                return
            try:
                doc = json.loads(j)
            except (ValueError, TypeError):
                return
            if isinstance(doc, dict):
                for k, v in doc.items():
                    yield (k, _fmt(v))
            elif isinstance(doc, list):
                for i, v in enumerate(doc):
                    yield (str(i), _fmt(v))

    @udtf(returnType="value string")
    class JsonbArrayElementsUDTF:
        # arrays only — jsonb/array_elements.rs semantics
        def eval(self, j):
            if j is None:
                return
            try:
                doc = json.loads(j)
            except (ValueError, TypeError):
                return
            if isinstance(doc, list):
                for v in doc:
                    yield (_fmt(v),)

    spark.udtf.register("parse_block", ParseBlockUDTF)
    spark.udtf.register("jsonb_each", JsonbEachUDTF)
    spark.udtf.register("jsonb_array_elements", JsonbArrayElementsUDTF)
