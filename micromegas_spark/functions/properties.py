"""Property-bag functions.

Reference: rust/datafusion-extensions/src/properties/property_get.rs (276 LoC),
properties_udf.rs (348), rust/analytics/src/properties/properties_to_jsonb_udf.rs,
properties_to_dict_udf.rs; docs functions-reference.md:717-757.

The reference stores properties in three physical formats (JSONB, legacy
List<Struct{key,value}>, dictionary-encoded JSONB) and property_get handles
all of them. Our engine normalizes on MAP<STRING,STRING> (SURVEY §1.3) but
property_get reads all three logical shapes:

  * MAP<STRING,STRING>        — the dominant flat k/v case
  * JSON string               — nested / OTel attributes
  * ARRAY<STRUCT<key,value>>  — the reference's legacy list form
    (fmt="array"; SQL spelling property_get_legacy)

Every function below stays JVM-side (element_at / get_json_object /
higher-order filter — no Python UDFs).
"""

from __future__ import annotations

from micromegas_spark.flightsql.errors import InvalidArgument

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType


def _is_map(col_type) -> bool:
    return isinstance(col_type, MapType)


def property_get(
    props: Column, key: str | Column, *, is_json: bool = False, fmt: str | None = None
) -> Column:
    """property_get(props, key) → STRING or NULL (property_get.rs;
    functions-reference.md:717-757). The reference dispatches on the
    input's physical type across THREE formats (property_get.rs handles
    JSONB, legacy List<Struct{key,value}>, and dict-encoded); Spark
    columns are typed at analysis, so the format is selected by ``fmt``:

      * ``"map"``  (default) — MAP<STRING,STRING>, element_at
      * ``"json"`` — JSON-string bag, get_json_object (``is_json=True``
        is the back-compat spelling)
      * ``"array"`` — the legacy ARRAY<STRUCT<key,value>> form; first
        matching entry wins (the reference scans the list in order)

    All three stay JVM-side (element_at / get_json_object / filter —
    no Python UDFs)."""
    fmt = fmt or ("json" if is_json else "map")
    if fmt == "json":
        k = key if isinstance(key, str) else None
        if k is None:
            raise InvalidArgument("JSON property access requires a literal key")
        return F.get_json_object(props, f"$.{k}")
    kcol = F.lit(key) if isinstance(key, str) else key
    if fmt == "array":
        # try_element_at: a missing key yields an EMPTY filtered array and
        # must return NULL, not an ANSI index error
        return F.try_element_at(F.filter(props, lambda e: e["key"] == kcol), F.lit(1))["value"]
    if fmt != "map":
        raise InvalidArgument(f"unknown property format {fmt!r} (map|json|array)")
    return F.element_at(props, kcol)


def properties_length(props: Column, *, is_json: bool = False) -> Column:
    """properties_length(props) → INT count of entries (properties_udf.rs)."""
    if is_json:
        # size of the parsed key array (casting the array to string would
        # produce '[a, b]' — not JSON — and always fail to re-parse)
        return F.size(F.json_object_keys(props))
    return F.size(props)


def properties_to_jsonb(props: Column) -> Column:
    """MAP → canonical JSON string (properties_to_jsonb_udf.rs — in a
    MapType design JSON *is* the interchange form; SURVEY §2.8 F12).
    Keys sorted for canonical output."""
    sorted_entries = F.array_sort(F.map_entries(props))
    return F.to_json(F.map_from_entries(sorted_entries))


def properties_to_dict(props: Column) -> Column:
    """Identity in the MapType design (properties_to_dict_udf.rs converts
    legacy list<struct> → dict-encoded; both normalize to MAP here)."""
    return props


def properties_to_array(props: Column) -> Column:
    """MAP → ARRAY<STRUCT<key,value>> (the reference's legacy format)."""
    return F.array_sort(F.map_entries(props))


def json_properties_to_map(props_json: Column) -> Column:
    """JSON-string property bag → MAP<STRING,STRING> (jsonb_parse + cast
    pipeline in the reference)."""
    return F.from_json(props_json, MapType(StringType(), StringType()))


def register(spark: SparkSession) -> None:
    for name, arglist, ret, expr in [
        (
            "property_get",
            "props MAP<STRING,STRING>, k STRING",
            "STRING",
            "element_at(props, k)",
        ),
        ("properties_length", "props MAP<STRING,STRING>", "INT", "size(props)"),
        (
            "property_get_json",
            "props STRING, k STRING",
            "STRING",
            # bracket-quoted path so keys containing '.' or '$' resolve as
            # literal member names, not nested paths
            "get_json_object(props, concat('$[\\'', k, '\\']'))",
        ),
        (
            # the reference's legacy List<Struct{key,value}> physical form
            # (property_get.rs); SQL temp functions carry ONE declared
            # signature, so the legacy form gets its own spelling — first
            # matching entry wins, like the reference's in-order list scan
            "property_get_legacy",
            "props ARRAY<STRUCT<key: STRING, value: STRING>>, k STRING",
            "STRING",
            "try_element_at(filter(props, e -> e.key = k), 1).value",
        ),
    ]:
        try:
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({arglist}) RETURNS {ret} RETURN {expr}"
            )
        except Exception:
            pass
