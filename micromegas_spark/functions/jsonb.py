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
implements the documented SQL/JSON-path surface (filters after any
wildcard step, ``&&``/``||`` with parentheses, navigation past filters,
``..name`` recursive descent, ``.*``) as a vectorized pandas UDF
(Arrow-batched; this is metadata-sized data in practice, never the
100 TB hot path).
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
    """jsonb_get(jsonb, key) → JSON of the member (get.rs). Works for
    object keys and array indices (numeric key). Returns the member's
    JSON ENCODING — strings keep their quotes — matching the reference's
    JSONB return value, so the documented composition
    ``jsonb_as_string(jsonb_get(...))`` works (query-audit-log.md;
    get_json_object would strip string quotes and break it)."""
    path = f"$[{key}]" if isinstance(key, str) and key.isdigit() else f"$.{key}"
    return F.to_json(F.try_variant_get(F.try_parse_json(j), path, "variant"))


def jsonb_as_string(j: Column) -> Column:
    """JSONB → Utf8 if the value is a string, else NULL (cast.rs).

    The string-ness test is on the RAW form (a JSON string starts with a
    quote; numbers/bools/objects don't), but the VALUE is decoded with a
    real JSON parse — stripping quotes with a regexp would leave \\"
    \\n \\uXXXX escapes encoded, silently corrupting any string that
    round-tripped through jsonb_get's JSON encoding."""
    trimmed = F.trim(j)
    return F.when(trimmed.startswith('"'), F.get_json_object(j, "$"))


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


# --- SQL/JSON path with filter predicates (pandas UDF) ----------------------
#
# Grammar (the reference's documented SQL/JSON-path surface,
# functions-reference.md:349-392 + the jsonb crate's jsonpath semantics,
# path_query.rs:176):
#
#   path     := '$' step*
#   step     := '.' NAME | '.*' | '..' NAME | '[' (INT | '*') ']'
#             | '?' '(' pred ')'
#   pred     := and_expr ('||' and_expr)*
#   and_expr := term ('&&' term)*
#   term     := '(' pred ')' | operand CMP operand | operand      (bare = exists)
#   operand  := '@' step* | STRING | NUMBER | true | false | null
#
# Filters may appear after ANY step (nested: $.teams[*].players[*] ? (...)),
# may combine && / || with parentheses, and navigation may continue past a
# filter. '..name' is recursive descent. Lax-mode comparison: an @-path
# yielding several values satisfies a comparison if ANY of them does;
# cross-type comparisons are false, never errors.

_PATH_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<dotdot>\.\.(?P<recname>\w+))
      | (?P<dotstar>\.\*)
      | (?P<dot>\.(?P<name>\w+))
      | (?P<bracket>\[(?P<idx>\d+|\*)\])
      | (?P<filter>\?)
    )""",
    re.VERBOSE,
)

_PRED_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<op>==|!=|>=|<=|>|<|&&|\|\||\(|\))
      | (?P<str>"(?:[^"\\]|\\.)*")
      | (?P<num>-?\d+(?:\.\d+)?)
      | (?P<kw>true|false|null)
      | (?P<at>@)
    )""",
    re.VERBOSE,
)


class _PathSyntaxError(ValueError):
    pass


def _parse_steps(s: str, pos: int, in_pred: bool) -> tuple[list, int]:
    steps: list = []
    while pos < len(s):
        m = _PATH_TOKEN_RE.match(s, pos)
        if m is None:
            break
        if m.group("dotdot"):
            steps.append(("rec", m.group("recname")))
        elif m.group("dotstar"):
            steps.append(("wild",))
        elif m.group("dot"):
            steps.append(("key", m.group("name")))
        elif m.group("bracket"):
            idx = m.group("idx")
            steps.append(("wild",) if idx == "*" else ("idx", int(idx)))
        else:  # filter
            if in_pred:
                raise _PathSyntaxError("nested '?' inside a predicate")
            pos = m.end()
            ws = re.compile(r"\s*\(").match(s, pos)
            if ws is None:
                raise _PathSyntaxError("expected '(' after '?'")
            pred, pos = _parse_pred(s, ws.end())
            ws = re.compile(r"\s*\)").match(s, pos)
            if ws is None:
                raise _PathSyntaxError("expected ')' closing the filter")
            steps.append(("filter", pred))
            pos = ws.end()
            continue
        pos = m.end()
    return steps, pos


def _parse_operand(s: str, pos: int) -> tuple[tuple, int]:
    m = _PRED_TOKEN_RE.match(s, pos)
    if m is None:
        raise _PathSyntaxError(f"bad predicate operand at {pos}")
    if m.group("at"):
        steps, pos = _parse_steps(s, m.end(), in_pred=True)
        return ("at", steps), pos
    if m.group("str"):
        body = m.group("str")[1:-1]
        # full JSON escape semantics: \n/\t/\uXXXX must decode to the
        # control/unicode characters (a hand-rolled backslash strip turns
        # "a\nb" into "anb" and never matches a real newline); strict=False
        # tolerates raw control chars the tokenizer let through. The
        # tokenizer admits ANY backslash escape (\\.), so non-JSON escapes
        # like \' fall back to the plain strip — previously-working paths
        # keep matching instead of silently becoming NULL-for-every-row.
        try:
            lit = json.loads(f'"{body}"', strict=False)
        except ValueError:
            lit = re.sub(r"\\(.)", r"\1", body)
        return ("lit", lit), m.end()
    if m.group("num"):
        t = m.group("num")
        return ("lit", float(t) if "." in t else int(t)), m.end()
    if m.group("kw"):
        return ("lit", {"true": True, "false": False, "null": None}[m.group("kw")]), m.end()
    raise _PathSyntaxError(f"bad predicate operand at {pos}")


def _parse_term(s: str, pos: int) -> tuple[tuple, int]:
    m = _PRED_TOKEN_RE.match(s, pos)
    if m is not None and m.group("op") == "(":
        node, pos = _parse_pred(s, m.end())
        m2 = _PRED_TOKEN_RE.match(s, pos)
        if m2 is None or m2.group("op") != ")":
            raise _PathSyntaxError("expected ')' in predicate")
        return node, m2.end()
    lhs, pos = _parse_operand(s, pos)
    m = _PRED_TOKEN_RE.match(s, pos)
    if m is not None and m.group("op") in ("==", "!=", ">", ">=", "<", "<="):
        rhs, pos = _parse_operand(s, m.end())
        return ("cmp", m.group("op"), lhs, rhs), pos
    return ("exists", lhs), pos


def _parse_and(s: str, pos: int) -> tuple[tuple, int]:
    node, pos = _parse_term(s, pos)
    while True:
        m = _PRED_TOKEN_RE.match(s, pos)
        if m is None or m.group("op") != "&&":
            return node, pos
        rhs, pos = _parse_term(s, m.end())
        node = ("and", node, rhs)


def _parse_pred(s: str, pos: int) -> tuple[tuple, int]:
    # '&&' binds tighter than '||' (the grammar above; standard SQL/JSON
    # path): a || b && c parses as a || (b && c)
    node, pos = _parse_and(s, pos)
    while True:
        m = _PRED_TOKEN_RE.match(s, pos)
        if m is None or m.group("op") != "||":
            return node, pos
        rhs, pos = _parse_and(s, m.end())
        node = ("or", node, rhs)


import functools


@functools.lru_cache(maxsize=1024)
def _parse_path(path: str) -> "list | None":
    """Parse once per DISTINCT path per executor — the UDF evaluates a
    constant path column over millions of rows and must not re-tokenize
    per row. Returns None for invalid syntax instead of raising:
    lru_cache does not memoize exceptions, so a raising error path would
    re-tokenize per row — the exact cost the cache exists to avoid.
    (Steps are treated as immutable after parse.)"""
    try:
        s = path.strip()
        if not s.startswith("$"):
            raise _PathSyntaxError("path must start with '$'")
        steps, pos = _parse_steps(s, 1, in_pred=False)
        if s[pos:].strip():
            raise _PathSyntaxError(f"trailing characters in path: {s[pos:]!r}")
        return steps
    except _PathSyntaxError:
        return None


def _descend(node, name: str, out: list) -> None:
    if isinstance(node, dict):
        if name in node:
            out.append(node[name])
        for v in node.values():
            _descend(v, name, out)
    elif isinstance(node, list):
        for v in node:
            _descend(v, name, out)


def _compare(op: str, a, b) -> bool:
    if isinstance(a, bool) or isinstance(b, bool) or a is None or b is None:
        # bools and nulls: only (in)equality, and bool never equals number
        if op not in ("==", "!="):
            return False
        same = type(a) is type(b) and a == b if isinstance(a, bool) or isinstance(b, bool) else a == b
        return same if op == "==" else not same
    num = isinstance(a, (int, float)) and isinstance(b, (int, float))
    txt = isinstance(a, str) and isinstance(b, str)
    if not (num or txt):
        return False
    return {
        "==": a == b, "!=": a != b,
        ">": a > b, ">=": a >= b, "<": a < b, "<=": a <= b,
    }[op]


def _eval_pred(node, item) -> bool:
    kind = node[0]
    if kind == "and":
        return _eval_pred(node[1], item) and _eval_pred(node[2], item)
    if kind == "or":
        return _eval_pred(node[1], item) or _eval_pred(node[2], item)
    if kind == "exists":
        op = node[1]
        return bool(_operand_values(op, item)) if op[0] == "at" else op[1] is not None
    _, op, lhs, rhs = node
    lv, rv = _operand_values(lhs, item), _operand_values(rhs, item)
    # lax mode: true if ANY pair of resolved values satisfies the comparison
    return any(_compare(op, a, b) for a in lv for b in rv)


def _operand_values(operand, item) -> list:
    if operand[0] == "lit":
        return [operand[1]]
    return _apply_steps([item], operand[1])


def _apply_steps(nodes: list, steps: list) -> list:
    cur = nodes
    for step in steps:
        nxt: list = []
        if step[0] == "key":
            for c in cur:
                if isinstance(c, dict) and step[1] in c:
                    nxt.append(c[step[1]])
        elif step[0] == "idx":
            for c in cur:
                if isinstance(c, list) and step[1] < len(c):
                    nxt.append(c[step[1]])
        elif step[0] == "wild":
            for c in cur:
                if isinstance(c, list):
                    nxt.extend(c)
                elif isinstance(c, dict):
                    nxt.extend(c.values())
        elif step[0] == "rec":
            for c in cur:
                _descend(c, step[1], nxt)
        else:  # filter
            nxt = [c for c in cur if _eval_pred(step[1], c)]
        cur = nxt
    return cur


def _eval_path(doc, path: str):
    """SQL/JSON-path evaluation over a parsed JSON document; invalid path
    syntax → None (the reference raises a parse error; we surface NULL,
    consistent with the try-semantics of the rest of the family)."""
    steps = _parse_path(path)
    if steps is None:
        return None
    return _apply_steps([doc], steps)


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
        matches = _eval_path(doc, p)
        if matches is None:  # invalid path syntax
            return None
        return json.dumps(matches, separators=(",", ":"))

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
        if not matches:  # no match, or invalid path syntax
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
        (
            "jsonb_get",
            "j STRING, k STRING",
            "STRING",
            # SQL UDFs inline at analysis, so concat folds to a constant
            # path for literal keys (variant_get requires a foldable path).
            # Digit keys address ARRAY INDICES, mirroring the Python
            # jsonb_get and the reference's get.rs — both surfaces must
            # agree on array access.
            "CASE WHEN k RLIKE '^[0-9]+$' "
            "THEN to_json(try_variant_get(try_parse_json(j), concat('$[', k, ']'), 'variant')) "
            "ELSE to_json(try_variant_get(try_parse_json(j), concat('$.', k), 'variant')) END",
        ),
        ("jsonb_as_f64", "j STRING", "DOUBLE", "try_cast(trim(j) AS DOUBLE)"),
        ("jsonb_as_i64", "j STRING", "BIGINT", "try_cast(trim(j) AS BIGINT)"),
        (
            "jsonb_as_string",
            "j STRING",
            "STRING",
            # real JSON parse for escape decoding, quote test for string-ness
            "CASE WHEN trim(j) LIKE '\"%' THEN get_json_object(j, '$') END",
        ),
        ("jsonb_parse", "j STRING", "STRING", "CASE WHEN try_parse_json(j) IS NOT NULL THEN j END"),
        ("jsonb_array_length", "j STRING", "INT", "json_array_length(j)"),
        ("jsonb_format_json", "j STRING", "STRING", "j"),
    ]:
        try:
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({arglist}) RETURNS {ret} RETURN {expr}"
            )
        except Exception:
            pass
