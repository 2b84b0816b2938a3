"""Custom stateful streaming: live thread-span assembly.

The reference materializes thread spans in micro-batches with per-stream
call-tree state rebuilt from blocks (SURVEY §3.2). The Structured-Streaming
native counterpart keeps each stream's OPEN-SPAN STACK as keyed state
(``applyInPandasWithState``): begin events push, end events pop and emit a
completed span row. State survives micro-batch boundaries and restarts via
the checkpoint — a span whose begin and end arrive in different batches is
still assembled exactly once.

Semantic deltas vs the batch builder (operators/spans.py), by necessity of
unbounded input (documented, tested):
- no query range ⇒ no clamping; spans stay open in state until closed;
- end-without-begin events are dropped (the batch path heals them to the
  range start — streaming has no range);
- scope mismatch resets the stream's stack (the batch path raises; a
  streaming query cannot abort per-record) and emits nothing for the
  broken frame.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STREAM_SPAN_SCHEMA = StructType(
    [
        StructField("stream_id", StringType()),
        StructField("id", LongType()),
        StructField("parent", LongType()),
        StructField("depth", IntegerType()),
        StructField("hash", LongType()),
        StructField("begin_ns", LongType()),
        StructField("end_ns", LongType()),
        StructField("duration", LongType()),
        StructField("name", StringType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("stack_json", StringType())])


def _process_stream(key: tuple, pdf_iter: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
    (stream_id,) = key
    stack: list[list] = json.loads(state.get[0]) if state.exists else []
    # the stack machine is inherently sequential per stream, but the loop
    # itself need not be row-dict-at-a-time: iterate primitive column
    # arrays via zip (~10x less per-row overhead than to_dict("records"),
    # guide §4.2 — hand batches to native code, keep the Python loop lean)
    out: list[tuple] = []
    pdf = pd.concat(list(pdf_iter), ignore_index=True)
    pdf = pdf.sort_values(["time_ns", "event_id"], kind="mergesort")
    for eid, etype, tns, ehash, name in zip(
        pdf["event_id"].to_numpy(),
        pdf["event_type"].to_numpy(),
        pdf["time_ns"].to_numpy(),
        pdf["hash"].to_numpy(),
        pdf["name"].to_numpy(),
    ):
        if etype == "begin":
            stack.append([int(eid), int(ehash), int(tns), name])
        else:
            if not stack:
                continue  # end-without-begin: dropped (see module docstring)
            top = stack.pop()
            if top[1] != int(ehash):
                stack = []  # scope mismatch: reset stream state
                continue
            t = int(tns)
            out.append(
                (
                    stream_id,
                    top[0],
                    stack[-1][0] if stack else -1,
                    len(stack),
                    top[1],
                    top[2],
                    t,
                    t - top[2],
                    top[3],
                )
            )
    state.update((json.dumps(stack),))
    yield pd.DataFrame(out, columns=[f.name for f in STREAM_SPAN_SCHEMA.fields])


def streaming_thread_spans(events: DataFrame) -> DataFrame:
    """events (streaming DF: stream_id, event_id, event_type, time_ns,
    hash, name) → completed spans as they close. Keyed state = the open
    stack per stream; output mode 'append' (closed spans are final)."""
    from micromegas_spark.session import configure

    configure(events.sparkSession)  # ship the package to executor workers
    return (
        events.groupBy("stream_id")
        .applyInPandasWithState(
            _process_stream,
            outputStructType=STREAM_SPAN_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


# ---------------------------------------------------------------------------
# Streaming counter rate (PromQL increase() with reset handling, live)
# ---------------------------------------------------------------------------

RATE_ROW_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("hour_epoch", LongType()),
        StructField("inc_micro", LongType()),
        StructField("has_inc", IntegerType()),
        StructField("reset", IntegerType()),
    ]
)

_RATE_STATE_SCHEMA = StructType([StructField("last_json", StringType())])


def _process_counter(key: tuple, pdf_iter: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
    """Per-series state = the last sample's scaled value. Values travel as
    exact micro-units (round-half-up of value*1e6 — the same rounding as a
    DECIMAL(18,6) cast), so streamed increments match the batch query's
    exact-decimal arithmetic bit-for-bit, not approximately."""
    import numpy as np

    (user_id,) = key
    last = json.loads(state.get[0]) if state.exists else None  # [ts_us, event_id, v_micro]
    pdf = pd.concat(list(pdf_iter), ignore_index=True)
    pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
    n = len(pdf)
    if n == 0:
        state.update((json.dumps(last),))
        yield pd.DataFrame(columns=[f.name for f in RATE_ROW_SCHEMA.fields])
        return
    # vectorized (guide §4.2): the delta chain only couples each row to its
    # PREDECESSOR, so a shift replaces the row loop. int(x + 0.5) on the
    # non-negative values is floor(x + 0.5) — np.floor keeps the exact
    # micro-unit rounding the batch oracle's DECIMAL(18,6) cast uses.
    ts = pdf["ts_us"].to_numpy(np.int64)
    v = np.floor(pdf["value"].to_numpy(np.float64) * 1e6 + 0.5).astype(np.int64)
    prev = np.empty_like(v)
    prev[1:] = v[:-1]
    prev[0] = v[0] if last is None else last[2]  # placeholder when first-ever
    reset = v < prev
    inc = np.where(reset, v, v - prev)
    has_inc = np.ones(n, dtype=np.int64)
    if last is None:
        inc[0], has_inc[0], reset[0] = 0, 0, False  # first-ever sample
    out = pd.DataFrame(
        {
            "user_id": np.full(n, int(user_id), dtype=np.int64),
            "hour_epoch": (ts // 3_600_000_000) * 3600,
            "inc_micro": inc,
            "has_inc": has_inc,
            "reset": reset.astype(np.int64),
        }
    )
    state.update((json.dumps([int(ts[-1]), int(pdf["event_id"].iloc[-1]), int(v[-1])]),))
    yield out


def streaming_counter_increments(events: DataFrame) -> DataFrame:
    """events (streaming DF: user_id, event_id, ts_us, value) → one
    increment row per sample with counter-reset semantics; keyed state =
    the series' last sample, surviving micro-batch boundaries, so a
    delta whose samples arrive in different batches is still computed
    exactly once (the streaming twin of events_counter_rate)."""
    from micromegas_spark.session import configure

    configure(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _process_counter,
        outputStructType=RATE_ROW_SCHEMA,
        stateStructType=_RATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# Streaming KMV sketch maintenance (live corpus-overlap estimation)
# ---------------------------------------------------------------------------

KMV_ROW_SCHEMA = StructType(
    [
        StructField("side", StringType()),
        StructField("ks_json", StringType()),
    ]
)

_KMV_STATE_SCHEMA = StructType([StructField("ks_json", StringType())])


def _make_process_kmv(k: int):
    def _process_kmv(key: tuple, pdf_iter: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        (side,) = key
        ks: list[int] = json.loads(state.get[0]) if state.exists else []
        seen = set(ks)
        for pdf in pdf_iter:
            seen.update(int(h) for h in pdf["h"])
        ks = sorted(seen)[:k]
        state.update((json.dumps(ks),))
        # emit the current sketch each batch: sketches are monotone
        # (k-smallest of a superset), so the k smallest of ALL emissions
        # equals the final state — downstream re-slices, no "last batch"
        # bookkeeping needed
        yield pd.DataFrame([{"side": side, "ks_json": json.dumps(ks)}])

    return _process_kmv


def streaming_kmv_sketches(pairs: DataFrame, k: int) -> DataFrame:
    """(side, h) stream → per-batch KMV sketch emissions; keyed state =
    the side's current k smallest distinct hashes. The streaming twin of
    operators/sketch.kmv_sketches: sketches stay a few KB per key no
    matter how much data streams through — the mergeable-sketch contract
    maintained live. Parallelism scales with the number of sketch keys
    ((corpus, shard) in production; two sides here)."""
    from micromegas_spark.session import configure

    configure(pairs.sparkSession)
    return pairs.groupBy("side").applyInPandasWithState(
        _make_process_kmv(k),
        outputStructType=KMV_ROW_SCHEMA,
        stateStructType=_KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
