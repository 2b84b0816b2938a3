"""Span machinery: thread-span call trees, async span pairing, process_spans.

Reference semantics ported (not translated — the stack machine is pure
imperative logic and lives in a Python function applied per group):

- Call-tree construction: rust/analytics/src/call_tree.rs:100-207 —
  begin/end events processed in time order per thread stream:
    * begin before the query range → ignored; after the range → stop;
    * a begin pushes an open span (end defaults to range end = healing for
      spans never closed);
    * an end closes the top span when hashes match; an end with no open
      span creates a span clamped to the range begin (healing);
    * hash mismatch on close is a data error (call_tree.rs:186-193);
- Flattening: rust/analytics/src/span_table.rs:126-187 — depth-first
  emission with (id, parent, depth, hash, begin, end, duration=end-begin,
  name, target, filename, line); top-level spans have parent = -1
  (we omit the synthetic whole-range root row the reference may emit when
  several top-level spans exist — its id is always -1/None and carries no
  scope; FIXTURES.md §6 uses the same convention).
- Async span pairing: process_spans_table_function.rs:319-339 /
  schema-reference.md:373-386 — begin×end equi-join on span_id with
  b.time < e.time residual; LEFT JOIN variant keeps unclosed spans with
  NULL end.

Scale shape: ``build_thread_spans`` is ``mapInPandas`` over
stream_id-hash-partitioned data (in-worker groupby) — each thread's event
stream is independent, so the shuffle key is the natural parallelism unit
and state never crosses partitions (this is the reference's per-stream JIT
partitioning, SURVEY §3.2); partition-level batching keeps the fixed
pandas/Arrow cost per task, not per stream. The pairing join is a plain
shuffled equi-join.
"""

from __future__ import annotations

from micromegas_spark.flightsql.errors import InvalidArgument

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SPAN_SCHEMA = StructType(
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
        StructField("target", StringType()),
        StructField("filename", StringType()),
        StructField("line", IntegerType()),
    ]
)


class ScopeMismatch(ValueError):
    """Raised when an end event closes a scope other than the open one
    (call_tree.rs:186-193)."""


def build_call_tree_rows(
    events: list[dict], begin_range_ns: int, end_range_ns: int
) -> list[dict]:
    """Pure-Python stack machine over ONE stream's time-sorted begin/end
    events → flattened span rows. Unit-testable against the reference
    semantics; wrapped by applyInPandas below."""
    # each frame: [id, hash, begin, end, children:list, scope]
    stack: list[list] = []
    top_level: list[list] = []

    def close_into_parent(node: list) -> None:
        if stack:
            stack[-1][4].append(node)
        else:
            top_level.append(node)

    for ev in events:
        t = ev["time_ns"]
        if t < begin_range_ns:
            continue
        if t > end_range_ns:
            break
        if ev["event_type"] == "begin":
            stack.append([ev["event_id"], ev["hash"], t, end_range_ns, [], ev])
        else:  # end
            if stack:
                top = stack.pop()
                if top[1] != ev["hash"]:
                    raise ScopeMismatch(
                        f"closing scope hash {ev['hash']} but {top[1]} is open"
                    )
                top[3] = t
                close_into_parent(top)
            else:
                # end without begin: span clamped to the range start
                close_into_parent([ev["event_id"], ev["hash"], begin_range_ns, t, [], ev])

    # unclosed begins: heal with end = range end, nesting preserved
    while stack:
        top = stack.pop()
        close_into_parent(top)

    rows: list[dict] = []

    def emit(node: list, parent_id: int, depth: int) -> None:
        nid, nhash, b, e, children, ev = node
        rows.append(
            {
                "id": nid,
                "parent": parent_id,
                "depth": depth,
                "hash": nhash,
                "begin_ns": b,
                "end_ns": e,
                "duration": e - b,
                "name": ev["name"],
                "target": ev.get("target"),
                "filename": ev.get("filename"),
                "line": ev.get("line", 0),
            }
        )
        for c in children:
            emit(c, nid, depth + 1)

    for node in top_level:
        emit(node, -1, 0)
    return rows


def build_thread_spans(
    events: DataFrame,
    begin_range_ns: int,
    end_range_ns: int,
) -> DataFrame:
    """thread_spans view builder (SURVEY §1.4, §3.2): per-stream call trees
    from begin/end event rows.

    Input columns: stream_id, event_id, event_type ('begin'|'end'),
    time_ns, hash, name, target, filename, line.

    mapInPandas over stream_id-hash-partitioned data with an in-worker
    groupby — per-stream state never crosses partitions, and the per-call
    overhead (pandas frame assembly + one Arrow batch) is paid once per
    PARTITION, not once per stream: telemetry has thousands-to-millions of
    thread streams, and at ~5 ms of fixed applyInPandas cost per group the
    per-group formulation spends 10x more time on framework overhead than
    on the call-tree stack machine (measured: 94k rows / 1500 streams =
    8.6 s per-group vs <1 s per-partition). Output stays sorted by begin
    within each stream (the reference certifies this scan order,
    thread_spans_view.rs:131; we sort explicitly)."""

    colnames = ["event_id", "event_type", "time_ns", "hash", "name", "target", "filename", "line"]
    out_cols = [f.name for f in SPAN_SCHEMA.fields]

    def process(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one stream's rows can straddle Arrow batches, so drain the
        # partition before grouping — memory is bounded by partition size,
        # which the repartition below keeps at data/parallelism
        chunks = list(pdf_iter)
        if not chunks:
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        frames = []
        # dropna=False: a NULL stream_id is still a group (the previous
        # Spark groupBy kept it; pandas groupby drops it by default)
        for stream_id, g in pdf.groupby("stream_id", sort=False, dropna=False):
            if pd.isna(stream_id):
                stream_id = None
            g = g.sort_values(["time_ns", "event_id"], kind="mergesort")
            # zip of column lists beats DataFrame.to_dict('records') ~4x on
            # million-row streams (the pandas per-row Series tax)
            records = [
                dict(zip(colnames, t))
                for t in zip(*(g[c].tolist() for c in colnames))
            ]
            rows = build_call_tree_rows(records, begin_range_ns, end_range_ns)
            out = pd.DataFrame(rows, columns=out_cols[1:])
            out.insert(0, "stream_id", stream_id)
            if len(out):
                out = out.sort_values("begin_ns", kind="mergesort")
            frames.append(out)
        if frames:
            yield pd.concat(frames, ignore_index=True)

    cols = ["stream_id", "event_id", "event_type", "time_ns", "hash", "name", "target", "filename", "line"]
    # explicit hash partitioning on the stream key: co-locates every
    # stream's rows in one partition (required for the in-worker groupby)
    # and pins the Python stage's parallelism — AQE would otherwise
    # coalesce the shuffle by *bytes* (64MB advisory), serializing the
    # CPU-bound stage onto a couple of tasks.
    parallelism = events.sparkSession.sparkContext.defaultParallelism
    return (
        events.select(*cols)
        .repartition(parallelism, "stream_id")
        .mapInPandas(process, schema=SPAN_SCHEMA)
    )


def pair_async_spans(events: DataFrame, keep_unclosed: bool = True) -> DataFrame:
    """Async span pairing (J3): begins LEFT JOIN ends on span_id with
    begin.time < end.time; unmatched begins survive with NULL end when
    keep_unclosed (schema-reference.md:373-386). Duplicate end candidates
    resolve to the EARLIEST end after the begin (min over matches).

    Input columns: span_id, parent_span_id, event_type, time_ns, name,
    depth, ... (async_events_table.rs:43-84 shape)."""
    b = events.where(F.col("event_type") == "begin").select(
        "span_id",
        "parent_span_id",
        "name",
        "depth",
        F.col("time_ns").alias("begin_ns"),
    )
    e = events.where(F.col("event_type") == "end").select(
        F.col("span_id").alias("e_span_id"), F.col("time_ns").alias("end_ns")
    )
    how = "left" if keep_unclosed else "inner"
    joined = b.join(e, (b.span_id == e.e_span_id) & (b.begin_ns < e.end_ns), how)
    return (
        joined.groupBy("span_id", "parent_span_id", "name", "depth", "begin_ns")
        .agg(F.min("end_ns").alias("end_ns"))
        .select(
            "span_id",
            "parent_span_id",
            "name",
            "depth",
            "begin_ns",
            "end_ns",
            (F.col("end_ns") - F.col("begin_ns")).alias("duration"),
        )
    )


def trace_chunks(
    spans: DataFrame,
    chunk_rows: int = 1000,
    order_cols: tuple[str, ...] = ("begin_ns", "span_id"),
    num_partitions: int | None = None,
    serializer: str = "perfetto",
) -> DataFrame:
    """perfetto_trace_chunks analogue (SURVEY §2.10;
    perfetto_trace_execution_plan.rs: streamed `(chunk_id Int32,
    chunk_data Binary)` protobuf chunks).

    serializer='perfetto' (default) emits protobuf Trace bytes via the
    hand-rolled wire-format writer in sources/perfetto.py (TrackDescriptor
    per stream + nesting-ordered SLICE_BEGIN/SLICE_END TrackEvents;
    requires stream_id/depth/name/begin_ns/end_ns columns). Concatenating
    all chunk_data in chunk order yields ONE valid Trace — protobuf
    repeated-field concatenation, the property the reference's chunk
    stream relies on. Cross-chunk event interleaving is resolved by
    Perfetto's trace sorter, as with any streamed producer.
    serializer='mmsb-json' keeps the schema-agnostic MMSB-framed JSON
    records (sources/payload.py). Either way the streamed-chunks shape
    (stable chunk ids, bounded chunk size, deterministic span order) is
    the tested contract; swapping the serializer changes no plan.

    Scale shape: global chunk numbering WITHOUT a single-partition global
    window, and WITHOUT relying on ``repartitionByRange`` sampling being
    identical across the count job and the numbering job (it is not: range
    boundaries are re-sampled per execution, so two jobs over the same
    un-persisted lineage can partition rows differently). Instead the
    range boundaries are collected ONCE (approxQuantile on the first order
    column) and embedded as literals, making the row→bucket assignment a
    deterministic per-row expression. The count job then counts per BUCKET
    (not per physical partition), so its offsets stay valid no matter how
    either job is physically partitioned; the numbering pass hashes on the
    bucket id, sorts within partitions, and enumerates each contiguous
    bucket segment locally, adding the broadcast bucket offset. Every
    stage is fully parallel.

    The input is persisted only for the driver-side jobs (boundary
    quantiles + per-bucket counts, one lineage execution between them) and
    unpersisted before returning — the final numbering job recomputes the
    lineage once, so an expensive upstream (e.g. the call-tree stack
    machine) runs twice total, same as the zipWithIndex contract, with no
    cache left pinned after the export. Requires a NUMERIC first order
    column (boundaries come from approxQuantile); pass num_partitions=1 to
    skip bucketing for non-numeric orderings.
    """
    import json as _json
    import struct as _struct

    import numpy as np
    from pyspark.sql.types import NumericType

    sc = spans.sparkSession.sparkContext
    n = num_partitions or sc.defaultParallelism
    first = order_cols[0]
    # deterministic range boundaries: collected once, embedded as literals
    bounds: list[float] = []
    cached = spans.persist()
    try:
        if n > 1:
            if not isinstance(spans.schema[first].dataType, NumericType):
                raise InvalidArgument(
                    f"trace_chunks needs a numeric first order column for range "
                    f"bucketing; {first!r} is {spans.schema[first].dataType}. "
                    "Pass num_partitions=1 to disable bucketing."
                )
            probs = [i / n for i in range(1, n)]
            bounds = sorted(set(cached.approxQuantile(first, probs, 0.001)))
        # constant-size expression regardless of partition count: probe the
        # literal boundary array (a thousands-term when-chain would bloat
        # the Catalyst tree and stress analysis/codegen)
        if bounds:
            barr = F.array(*[F.lit(float(x)) for x in bounds])
            bucket_expr = F.size(F.filter(barr, lambda b: F.col(first).cast("double") > b))
        else:
            bucket_expr = F.lit(0)
        bucketed = cached.withColumn("_bucket", bucket_expr.cast("int"))
        counts = bucketed.groupBy("_bucket").count().collect()
    finally:
        cached.unpersist(blocking=False)
    bucketed = spans.withColumn("_bucket", bucket_expr.cast("int"))
    offsets, acc = {}, 0
    for r in sorted(counts, key=lambda r: r["_bucket"]):
        offsets[r["_bucket"]] = acc
        acc += r["count"]
    offsets_bc = sc.broadcast(offsets)

    numbered_schema = StructType(
        bucketed.schema.fields
        + [StructField("_rn", LongType()), StructField("_chunk", IntegerType())]
    )
    part = bucketed.repartition(n, "_bucket").sortWithinPartitions("_bucket", *order_cols)

    def number(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = offsets_bc.value
        seen: dict[int, int] = {}
        for pdf in pdf_iter:
            rn = np.empty(len(pdf), dtype=np.int64)
            for bkt, idx in pdf.groupby("_bucket").indices.items():
                start = base.get(bkt, 0) + seen.get(bkt, 0)
                rn[idx] = start + np.arange(len(idx), dtype=np.int64)
                seen[bkt] = seen.get(bkt, 0) + len(idx)
            pdf = pdf.copy()
            pdf["_rn"] = rn
            pdf["_chunk"] = (rn // chunk_rows).astype(np.int32)
            yield pdf

    numbered = part.mapInPandas(number, schema=numbered_schema)
    out_schema = StructType(
        [StructField("chunk_id", IntegerType()), StructField("chunk_data", BinaryType())]
    )

    def pack(key: tuple, pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        (chunk_id,) = key
        pdf = pd.concat(list(pdf_iter), ignore_index=True).sort_values("_rn")
        records = pdf.drop(columns=["_rn", "_chunk", "_bucket"]).to_dict("records")
        if serializer == "perfetto":
            from micromegas_spark.sources.perfetto import spans_to_trace_bytes

            buf = spans_to_trace_bytes(records)
        else:
            buf = bytearray()
            for rec in records:
                b = _json.dumps(rec, separators=(",", ":"), sort_keys=True, default=str).encode()
                buf += _struct.pack(">I", len(b)) + b
        yield pd.DataFrame({"chunk_id": [chunk_id], "chunk_data": [bytes(buf)]})

    return numbered.groupBy("_chunk").applyInPandas(pack, schema=out_schema)


def process_spans(
    thread_spans: DataFrame | None,
    async_spans: DataFrame | None,
    span_types: str = "both",
) -> DataFrame:
    """process_spans(process_id, types) analogue
    (process_spans_table_function.rs:34-75): union of per-thread spans and
    paired async spans with a span_type discriminator column."""
    parts = []
    if thread_spans is not None and span_types in ("thread", "both"):
        parts.append(
            thread_spans.select(
                F.lit("thread").alias("span_type"),
                F.col("id").alias("span_id"),
                F.col("parent").alias("parent_span_id"),
                "name",
                "depth",
                "begin_ns",
                "end_ns",
                "duration",
            )
        )
    if async_spans is not None and span_types in ("async", "both"):
        parts.append(
            async_spans.select(
                F.lit("async").alias("span_type"),
                "span_id",
                "parent_span_id",
                "name",
                "depth",
                "begin_ns",
                "end_ns",
                "duration",
            )
        )
    if not parts:
        raise InvalidArgument("no span sources for the requested types")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def span_concurrency(
    spans: DataFrame,
    begin_col: str = "begin_us",
    end_col: str = "end_us",
    key_cols: list[str] | None = None,
    tie_col: str | None = None,
) -> DataFrame:
    """Sweep-line span concurrency (the async-performance-analysis
    'concurrent operations' pattern, async-performance-analysis.md:127-147,
    computed exactly instead of bucketing begin events per minute): each
    span emits (+1 at begin, −1 at end); the running sum of deltas in
    time order IS the number of open spans at that instant. Returns one
    row per key with ``peak_concurrency`` and ``n_spans``.

    Ordering is deterministic: at equal timestamps closes sort before
    opens (so a span ending exactly when another begins never
    double-counts) — EXCEPT the close of a zero-length span, which sorts
    after the opens so an instantaneous span still registers peak ≥ 1
    and the running sum never goes transiently negative. ``tie_col`` is
    the final tie-break.

    Scale shape: one explode (2 rows per span) + one window partitioned
    by the key — per-key sequential, never a global sort, and no
    interval self-join (the naive pairwise-overlap formulation is
    O(spans²) per key). This is the plan a 10⁹-span trace needs."""
    keys = key_cols or []
    # sort rank: normal closes −1 (before opens at 1), zero-length closes
    # 2 (after their own open)
    close_rank = F.when(F.col(end_col) > F.col(begin_col), F.lit(-1)).otherwise(
        F.lit(2)
    )
    deltas = spans.select(
        *keys,
        *( [F.col(tie_col).alias("_tie")] if tie_col else [F.lit(0).alias("_tie")] ),
        F.explode(
            F.array(
                F.struct(
                    F.col(begin_col).alias("t"),
                    F.lit(1).alias("d"),
                    F.lit(1).alias("rnk"),
                ),
                F.struct(
                    F.col(end_col).alias("t"),
                    F.lit(-1).alias("d"),
                    close_rank.alias("rnk"),
                ),
            )
        ).alias("ev"),
    ).select(
        *keys,
        "_tie",
        F.col("ev.t").alias("t"),
        F.col("ev.d").alias("d"),
        F.col("ev.rnk").alias("rnk"),
    )
    w = (
        Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    ).orderBy("t", "rnk", "_tie").rowsBetween(Window.unboundedPreceding, 0)
    run = deltas.select(*keys, F.sum("d").over(w).alias("open_spans"), "d")
    gb = run.groupBy(*keys) if keys else run.groupBy()
    return gb.agg(
        F.max("open_spans").cast("bigint").alias("peak_concurrency"),
        (F.count("*") / 2).cast("bigint").alias("n_spans"),
    )



def span_self_times(
    spans: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    duration_col: str = "duration",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Flamegraph EXCLUSIVE time per span: self = duration − Σ direct
    children (the single most-used profiler aggregate; the reference's
    span trees feed Perfetto's flamegraph, which renders exactly this —
    perfetto_trace_execution_plan.rs / span_table.rs parent links).

    Returns the input columns plus ``self_time``. Rows whose id never
    appears as any child's parent (leaves) get self = duration; unclosed
    spans contribute their healed duration like any other (call_tree.rs
    heals end to the range bound, so duration is always defined).

    Scale shape: one partial-aggregated groupBy on (keys, parent) — the
    child-sum relation is at most one row per INTERNAL node, i.e. ≤ the
    span count — followed by one left join back on (keys, id). Both
    shuffles hash on the stream key first, so a repartition by key
    upstream (build_thread_spans already leaves data key-partitioned)
    lets AQE reuse co-location; no window over the whole trace, no
    self-join on time containment (that formulation is O(n·fanout) per
    stream and needs the begin/end sort this one avoids).

    The aggregated side is renamed (``_sst_*``) BEFORE the self-join:
    joining a DataFrame to an aggregate derived from itself with
    ``spans["id"] == kid["parent"]`` is ambiguous to the analyzer (both
    sides share lineage), the classic Spark self-join trap.
    """
    keys = list(key_cols or [])
    kid = (
        spans.groupBy(*keys, parent_col)
        .agg(F.sum(duration_col).alias("_sst_child_dur"))
        .withColumnRenamed(parent_col, "_sst_pid")
    )
    for k in keys:
        kid = kid.withColumnRenamed(k, f"_sst_{k}")
    cond = spans[id_col] == kid["_sst_pid"]
    for k in keys:
        cond = cond & (spans[k].eqNullSafe(kid[f"_sst_{k}"]))
    joined = spans.join(kid, cond, "left")
    return joined.select(
        *[spans[c] for c in spans.columns],
        (
            spans[duration_col] - F.coalesce(kid["_sst_child_dur"], F.lit(0))
        ).alias("self_time"),
    )
