"""Skew mitigation utilities — the two hot-key patterns AQE does NOT fix.

AQE's skew-join splitting handles sort-merge joins, and hash aggregation
already does map-side partial aggregation. What remains at 100 TB:

1. **Window skew** (`skew_safe_topk`): a per-key window (top-k per user,
   rank per trace) puts the whole hot key in ONE task. Two-phase instead:
   local top-k inside each input partition (sort within partitions — no
   shuffle), then global top-k per key over the k·P survivors. The hot key
   costs k rows per partition through the shuffle, not its full volume.

2. **Broadcast-impossible skewed joins** (`salted_join`): when both sides
   are large and keys are hot, salt the probe side with a deterministic
   bucket and replicate the build side across buckets — the hot key
   spreads over `salt` tasks. Replication factor bounds: use only when the
   build side is small enough to multiply.
"""

from __future__ import annotations

from micromegas_spark.flightsql.errors import InvalidArgument

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skew_safe_topk(
    df: DataFrame, part_cols: list[str], order_col: str, k: int, descending: bool = True
) -> DataFrame:
    """Top-k rows per key, skew-proof.

    Equivalent to ``row_number() OVER (PARTITION BY part ORDER BY ord) <= k``
    but never shuffles more than k rows per key per input partition; ties
    broken by the full row's order position within its partition (callers
    wanting deterministic cross-run output should include a unique column
    in ``order_col``'s ordering — pass e.g. a struct column)."""
    oc = F.col(order_col)
    local_order = oc.desc() if descending else oc.asc()
    # phase 1: local top-k inside each input partition (no shuffle)
    w_local = Window.partitionBy(F.spark_partition_id(), *part_cols).orderBy(local_order)
    pruned = (
        df.withColumn("_lrn", F.row_number().over(w_local))
        .where(F.col("_lrn") <= k)
        .drop("_lrn")
    )
    # phase 2: global top-k per key over the survivors
    w_global = Window.partitionBy(*part_cols).orderBy(local_order)
    return (
        pruned.withColumn("_rn", F.row_number().over(w_global))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


_SALT_SAFE_JOINS = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "cross"}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key salting: left rows get a deterministic salt
    bucket (hash of the whole row modulo `salt`); right rows replicate
    across all buckets. The join key becomes (keys…, salt) so a hot key's
    rows spread over `salt` tasks instead of one.

    Only left-preserving joins are salt-safe: under right/full outer an
    unmatched right row would survive once per salt replica."""
    if how.lower() not in _SALT_SAFE_JOINS:
        raise InvalidArgument(
            f"salted_join supports left-preserving joins only, got {how!r} "
            "(an unmatched right row would be duplicated per salt bucket)"
        )
    l_salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int")
    )
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    # shuffle_hash on the replicated build side: salting exists precisely
    # because the key distribution is pathological, and sort-merge would
    # SORT salt× replicated rows; a shuffled hash join builds a table from
    # the replica partition instead (AQE cannot pick this itself when
    # stats mispredict the exploded size)
    out = l_salted.join(r_salted.hint("shuffle_hash"), [*keys, "_salt"], how)
    return out.drop("_salt")
