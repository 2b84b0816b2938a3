"""Net-span views: bandwidth spans whose X-axis is **bits**, not time
(SURVEY §1.4 net_spans; rust/analytics/src/net_spans_table.rs:41,
view_factory.rs:101-124 'X-axis is bits'). Trees are bit-offset trees
(net_span_tree.rs:19-50): children partition the parent's bit range.

FIXTURES.md §10 shape: span_id/parent_span_id (-1 sentinel at Connection
roots), depth (0 = connection), kind ∈ {connection, object, property, rpc},
begin_bits/end_bits/bit_size with end_bits = begin_bits + bit_size.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# bit-offset tree depth → span kind (net_span_tree.rs: Connection roots,
# Objects, Properties, RPC leaves)
NET_KINDS = ["connection", "object", "property", "rpc"]

NET_SPAN_SCHEMA = StructType(
    [
        StructField("connection_name", StringType()),
        StructField("span_id", LongType()),
        StructField("parent_span_id", LongType()),
        StructField("depth", IntegerType()),
        StructField("kind", StringType()),
        StructField("name", StringType()),
        StructField("is_outgoing", BooleanType()),
        StructField("begin_bits", LongType()),
        StructField("end_bits", LongType()),
        StructField("bit_size", LongType()),
    ]
)


def build_net_spans(events: DataFrame) -> DataFrame:
    """net_spans view builder — the bit-offset tree analogue of
    build_thread_spans (reference net_span_tree.rs:19-50; #1429 covers
    BOTH views' cross-block tree assembly): per connection, begin/end
    events ordered by cumulative bit offset feed a stack machine emitting
    the FIXTURES.md §10 shape — span_id = the begin event's event_id
    (deterministic, oracle-recomputable), parent_span_id = the enclosing
    open span's id (-1 at Connection roots), depth = nesting level,
    kind = NET_KINDS[min(depth, 3)], end_bits = begin_bits + bit_size.

    Input columns: connection_name, event_id, event_type ('begin'|'end'),
    offset_bits (cumulative, non-decreasing per connection), is_outgoing,
    name.

    Same scale shape as thread spans: mapInPandas over connection-hash-
    partitioned data with an in-worker groupby — per-connection state
    never crosses partitions and the applyInPandas fixed cost is paid per
    PARTITION. Output is sorted by begin_bits within each connection —
    the order the write-time ensure_begin_non_decreasing check (#1429)
    certifies at JIT-partition write."""
    import pandas as pd

    colnames = ["event_id", "event_type", "offset_bits", "is_outgoing", "name"]
    out_cols = [f.name for f in NET_SPAN_SCHEMA.fields]

    def process(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(pdf_iter)
        if not chunks:
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        frames = []
        for conn, g in pdf.groupby("connection_name", sort=False, dropna=False):
            if pd.isna(conn):
                conn = None
            g = g.sort_values(["offset_bits", "event_id"], kind="mergesort")
            stack: list[tuple] = []
            rows = []
            for eid, etype, off, outg, name in zip(
                *(g[c].tolist() for c in colnames)
            ):
                if etype == "begin":
                    stack.append((eid, off, outg, name))
                elif stack:  # unmatched ends are dropped, like thread spans
                    beid, boff, boutg, bname = stack.pop()
                    depth = len(stack)
                    rows.append(
                        (
                            int(beid),
                            int(stack[-1][0]) if stack else -1,
                            depth,
                            NET_KINDS[min(depth, 3)],
                            bname,
                            bool(boutg),
                            int(boff),
                            int(off),
                            int(off) - int(boff),
                        )
                    )
            out = pd.DataFrame(rows, columns=out_cols[1:])
            out.insert(0, "connection_name", conn)
            if len(out):
                out = out.sort_values("begin_bits", kind="mergesort")
            frames.append(out)
        if frames:
            yield pd.concat(frames, ignore_index=True)

    p = events.sparkSession.sparkContext.defaultParallelism
    return events.repartition(p, "connection_name").mapInPandas(
        process, NET_SPAN_SCHEMA
    )


def bandwidth_rollup(net_spans: DataFrame) -> DataFrame:
    """Bits by connection × kind × direction — the headline bandwidth
    breakdown."""
    return net_spans.groupBy("connection_name", "kind", "is_outgoing").agg(
        F.count("*").alias("n_spans"),
        F.sum("bit_size").alias("total_bits"),
    )


def tree_violations(net_spans: DataFrame) -> DataFrame:
    """Structural invariant check (FIXTURES.md §11): per parent,
    Σ child.bit_size ≤ parent.bit_size; child range within parent range;
    child.depth = parent.depth + 1. Returns violating parent rows (empty ⇒
    consistent). A validation operator, not a view — the reference fails
    loudly on malformed trees (net_span_tree.rs)."""
    c = net_spans.select(
        F.col("parent_span_id").alias("p_id"),
        F.col("bit_size").alias("c_bits"),
        F.col("begin_bits").alias("c_begin"),
        F.col("end_bits").alias("c_end"),
        F.col("depth").alias("c_depth"),
    )
    p = net_spans.select(
        F.col("span_id").alias("p_id"),
        F.col("bit_size").alias("p_bits"),
        F.col("begin_bits").alias("p_begin"),
        F.col("end_bits").alias("p_end"),
        F.col("depth").alias("p_depth"),
    )
    joined = c.join(p, "p_id")
    per_parent = joined.groupBy("p_id", "p_bits").agg(
        F.sum("c_bits").alias("children_bits"),
        F.min(
            (F.col("c_begin") >= F.col("p_begin"))
            & (F.col("c_end") <= F.col("p_end"))
            & (F.col("c_depth") == F.col("p_depth") + 1)
        ).alias("all_nested"),
    )
    return per_parent.where(
        (F.col("children_bits") > F.col("p_bits")) | (~F.col("all_nested"))
    )
