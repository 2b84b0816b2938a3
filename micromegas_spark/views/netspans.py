"""Net-span views: bandwidth spans whose X-axis is **bits**, not time
(SURVEY §1.4 net_spans; rust/analytics/src/net_spans_table.rs:41,
view_factory.rs:101-124 'X-axis is bits'). Trees are bit-offset trees
(net_span_tree.rs:19-50): children partition the parent's bit range.

FIXTURES.md §10 shape: span_id/parent_span_id (-1 sentinel at Connection
roots), depth (0 = connection), kind ∈ {connection, object, property, rpc},
begin_bits/end_bits/bit_size with end_bits = begin_bits + bit_size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
