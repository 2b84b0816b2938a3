"""Core relational query surface (SURVEY §2.1-§2.8).

These queries exercise, on the driver's synthetic tables, the same operator
families the reference uses: partitioned scans with pushdown, metadata
equi-joins with broadcast dims, hash aggregation, two-phase/composable
aggregation, window functions, top-k, set ops, self-join span pairing, and
the scalar-function surface (date_bin, property_get, bin_center, lerp,
histogram quantiles).

Reference parity notes cite /root/reference file:line in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from micromegas_spark.queries.registry import ordered, query
from micromegas_spark.sources.tables import load_table

# exact-decimal money sum, emitted as DOUBLE (see registry conventions)
_DEC2 = "decimal(18,2)"
_DEC6 = "decimal(28,6)"


def _revenue() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC6)


# ---------------------------------------------------------------------------
# Scan + filter + aggregate
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: full-scan hash aggregate with predicate pushdown.

    Mirrors the reference's ubiquitous agg pattern (SURVEY §2.4 A1; e.g.
    log_stats_view.rs:32-45). Filter reaches the parquet scan; sums use
    exact decimals so the result is summation-order independent (safe under
    any partitioning / AQE re-plan at 100 TB).
    """
    li = load_table(spark, sf_dir, "lineitem")
    sum_qty = F.sum(F.col("l_quantity").cast(_DEC2))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty.cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(_DEC2)).cast("double").alias("sum_base_price"),
            F.sum(_revenue()).cast("double").alias("sum_disc_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).cast(_DEC6)
            )
            .cast("double")
            .alias("sum_charge"),
            (sum_qty.cast("double") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .transform(ordered, "l_returnflag", "l_linestatus")
    )


@query(
    "events_hourly_errors",
    oracle="""
    SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE event_type = 'error'
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_hourly_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's canonical query: hourly error counts over the event
    stream (schema-reference.md:184-199 'hourly error counts from
    log_entries'). Time bucketing via epoch integer math = the reference's
    date_bin (log_stats_view.rs:34), timezone-proof on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") == "error")
        .groupBy((F.floor(F.col("ts_us") / F.lit(3_600_000_000)).cast("bigint") * 3600).alias("hour_epoch"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(_DEC2)).cast("double").alias("sum_value"),
        )
        .transform(ordered, "hour_epoch")
    )


@query(
    "events_datebin_15m",
    oracle="""
    SELECT (epoch_us(ts) // 900000000) * 900 AS bin_epoch,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_datebin_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-stride date_bin aggregation (SURVEY §2.8 F21: Spark lacks
    date_bin; the engine exposes the floor(epoch/stride)*stride equivalent,
    functions/datetime.py). 15-minute bins × event_type, as the reference's
    log_stats does 1-minute bins × level (log_stats_view.rs:32-45)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.floor(F.col("ts_us") / F.lit(900_000_000)).cast("bigint") * 900).alias("bin_epoch"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.col("value").cast(_DEC2)).cast("double") / F.count("*")).alias("avg_value"),
        )
        .transform(ordered, "bin_epoch", "event_type")
    )


@query(
    "log_stats_merge_idempotence",
    oracle="""
    SELECT bin_epoch, event_type, CAST(SUM(n) AS BIGINT) AS n
    FROM (
        SELECT (epoch_us(ts) // 60000000) * 60 AS bin_epoch, event_type, COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    )
    GROUP BY bin_epoch, event_type
    ORDER BY bin_epoch, event_type
    """,
)
def log_stats_merge_idempotence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase composable aggregation: extract (count per 1-min bin) then
    merge (sum of counts) — the reference's materialized-view maintenance
    contract (SURVEY §2.4 A2; sql_batch_view.rs:170-175, log_stats_view.rs:50-59).
    Spark plans this as partial+final aggregate with map-side combine."""
    ev = load_table(spark, sf_dir, "events")
    extract = ev.groupBy(
        (F.floor(F.col("ts_us") / F.lit(60_000_000)).cast("bigint") * 60).alias("bin_epoch"),
        "event_type",
    ).agg(F.count("*").alias("n"))
    merged = (
        extract.groupBy("bin_epoch", "event_type")
        .agg(F.sum("n").alias("n"))
        .transform(ordered, "bin_epoch", "event_type")
    )
    return merged


@query(
    "events_value_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
           CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
           sqrt((CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 - CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   * CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1)) AS stddev_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/avg/stddev per metric family — the measures-view statistics
    shape (SURVEY §2.4 A1, stddev). Sample stddev computed from exact
    decimal Σv and Σv² so both engines agree bit-for-bit (native stddev
    accumulates doubles in engine-specific order)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast(_DEC2)
    n = F.count("*")
    s = F.sum(v).cast("double")
    ss = F.sum(v * v).cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            n.alias("n"),
            F.min(v).cast("double").alias("min_value"),
            F.max(v).cast("double").alias("max_value"),
            (s / n).alias("avg_value"),
            F.sqrt((ss - s * s / n) / (n - F.lit(1))).alias("stddev_value"),
        )
        .transform(ordered, "event_type")
    )


@query(
    "events_timeseries_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT (MIN(epoch_us(ts)) // 3600000000) * 3600 AS lo,
               (MAX(epoch_us(ts)) // 3600000000) * 3600 AS hi
        FROM events
    ),
    grid AS (SELECT unnest(range(lo, hi + 3600, 3600)) AS hour_epoch FROM bounds),
    agg AS (
        SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch, COUNT(*) AS n
        FROM events WHERE event_type = 'signup' GROUP BY 1
    )
    SELECT g.hour_epoch AS hour_epoch, COALESCE(a.n, 0) AS n
    FROM grid g LEFT JOIN agg a ON g.hour_epoch = a.hour_epoch
    ORDER BY g.hour_epoch
    """,
)
def events_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense time series with zero-filled gaps — the observability
    dashboard shape (Grafana panels over the reference's views): bucket
    grid via sequence() + left join + coalesce. The grid generation is a
    one-row explode, not a driver loop."""
    ev = load_table(spark, sf_dir, "events")
    hour = (F.floor(F.col("ts_us") / F.lit(3_600_000_000)).cast("bigint") * 3600).alias("hour_epoch")
    agg = ev.where(F.col("event_type") == "signup").groupBy(hour).agg(F.count("*").alias("n"))
    bounds = ev.agg(
        (F.floor(F.min("ts_us") / F.lit(3_600_000_000)).cast("bigint") * 3600).alias("lo"),
        (F.floor(F.max("ts_us") / F.lit(3_600_000_000)).cast("bigint") * 3600).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(3600))).alias("hour_epoch")
    )
    return (
        grid.join(agg, "hour_epoch", "left")
        .select("hour_epoch", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
        .orderBy("hour_epoch")
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT o.o_orderkey AS o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           o.o_orderdate AS o_orderdate,
           o.o_orderpriority AS o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⨝fact⨝dim join + agg + deterministic top-k (TPC-H Q3 shape).

    The dim (filtered customer) is broadcast — at 100 TB the two fact tables
    shuffle on their join keys while customer ships to every executor
    (SURVEY §2.3 J1/J2: the reference broadcasts metadata dims the same way
    via DataFusion CollectLeft)."""
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q5_regional_revenue",
    oracle="""
    SELECT n.n_name AS n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way join with small-dim broadcast chain (TPC-H Q5 shape).

    supplier/nation/region are tiny at any scale factor → broadcast; the
    orders⨝lineitem fact join shuffles on orderkey. This is the reference's
    blocks⨝streams⨝processes 3-way metadata join writ large
    (blocks_view.rs:61-71)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    # customer is fact-scale: joins on custkey SHUFFLE (AQE may still pick
    # broadcast at small SFs); only the genuinely tiny dims are hinted
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .transform(ordered, F.desc("revenue"), "n_name")
    )


@query(
    "customer_without_orders",
    oracle="""
    SELECT c.c_nationkey AS c_nationkey, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def customer_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (SURVEY §2.3 J6 — absent in the reference, present here as
    part of full SQL surface). Spark plans NOT EXISTS as LeftAnti."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
        .transform(ordered, "c_nationkey")
    )


@query(
    "events_span_pairing",
    oracle="""
    WITH b AS (
        SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               epoch_us(ts) AS b_ts
        FROM events WHERE event_type = 'view'
    ),
    e AS (
        SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               epoch_us(ts) AS e_ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT b.user_id AS user_id, b.k AS k,
           COUNT(*) AS n_pairs,
           MIN(e.e_ts - b.b_ts) AS min_duration_us,
           MAX(e.e_ts - b.b_ts) AS max_duration_us
    FROM b JOIN e ON b.user_id = e.user_id AND b.k = e.k AND b.b_ts < e.e_ts
    GROUP BY b.user_id, b.k
    ORDER BY b.user_id, b.k
    """,
)
def events_span_pairing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Begin×end self-join span pairing: equi-join on the span key plus a
    theta residual b.time < e.time — exactly the reference's async-span
    construction (SURVEY §2.3 J3; process_spans_table_function.rs:319-339).
    Here 'view' events open a span and 'purchase' events close it, keyed by
    (user_id, props.k)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.col("ts_us"),
        "event_type",
    )
    b = ev.where(F.col("event_type") == "view").select("user_id", "k", F.col("ts_us").alias("b_ts"))
    e = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("e_user_id"), F.col("k").alias("e_k"), F.col("ts_us").alias("e_ts")
    )
    return (
        b.join(
            e,
            (b.user_id == e.e_user_id) & (b.k == e.e_k) & (b.b_ts < e.e_ts),
        )
        .groupBy("user_id", "k")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min(F.col("e_ts") - F.col("b_ts")).alias("min_duration_us"),
            F.max(F.col("e_ts") - F.col("b_ts")).alias("max_duration_us"),
        )
        .orderBy("user_id", "k")
    )


@query(
    "events_span_concurrency",
    oracle="""
    WITH spans AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS b_us,
               epoch_us(ts) + CAST(round(value * 1000000) AS BIGINT) AS e_us
        FROM events WHERE event_type = 'click'
    ),
    deltas AS (
        SELECT user_id, event_id AS tie, b_us AS t, 1 AS d, 1 AS rnk FROM spans
        UNION ALL
        SELECT user_id, event_id, e_us, -1,
               CASE WHEN e_us > b_us THEN -1 ELSE 2 END
        FROM spans
    ),
    run AS (
        SELECT user_id, d,
               SUM(d) OVER (PARTITION BY user_id ORDER BY t, rnk, tie
                            ROWS UNBOUNDED PRECEDING) AS open_spans
        FROM deltas
    )
    SELECT user_id,
           CAST(MAX(open_spans) AS BIGINT) AS peak_concurrency,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_spans
    FROM run GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_span_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact span-concurrency profile (operators/spans.span_concurrency —
    the async-performance-analysis.md:127-147 'concurrent operations'
    question answered with a sweep line instead of per-minute begin
    counts): every click event opens a span of ``value`` seconds; +1/-1
    deltas in time order give the open-span count, peak per user. One
    explode + one per-user window — no interval self-join (O(spans²))
    and no global sort. One row per user with peak and span count."""
    from micromegas_spark.operators.spans import span_concurrency

    ev = load_table(spark, sf_dir, "events")
    spans = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "event_id",
        F.col("ts_us").alias("b_us"),
        (F.col("ts_us") + F.round(F.col("value") * 1_000_000).cast("bigint")).alias("e_us"),
    )
    return (
        span_concurrency(
            spans, begin_col="b_us", end_col="e_us",
            key_cols=["user_id"], tie_col="event_id",
        )
        .orderBy("user_id")
    )


@query(
    "events_tail_sampling",
    oracle="""
    WITH flagged AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'error' AND value > 300.0
    ),
    kept AS (
        SELECT e.user_id, e.event_id,
               CASE WHEN f.user_id IS NOT NULL THEN 'flagged'
                    WHEN ('0x' || substr(md5('tail:' || CAST(e.user_id AS VARCHAR)), 1, 15))::BIGINT
                         / 1152921504606846976.0 < 0.10
                    THEN 'sampled' END AS keep_reason
        FROM events e LEFT JOIN flagged f USING (user_id)
        WHERE e.event_type IN ('view', 'click', 'purchase')
    )
    SELECT keep_reason,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM kept WHERE keep_reason IS NOT NULL
    GROUP BY keep_reason ORDER BY keep_reason
    """,
)
def events_tail_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail sampling (advanced-features.md:57-60: 'use low-frequency
    streams to decide sampling of high-frequency streams'): the
    low-frequency error stream (severe errors, value > 300) flags users whose HIGH-frequency events
    (view/click/purchase) are kept in full; everyone else is admitted by
    a deterministic 10% draw from the shared content-hash PRNG
    (operators/sampling.sample_unit — one hashing scheme, one oracle
    spelling) — the
    trace-level keep-all-errors + fixed-rate-rest policy of production
    tracing, decided AFTER the data is stored, which is exactly what the
    store-raw / materialize-on-query architecture allows.

    Scale shape: the flagged set is dimension-sized (distinct users with
    errors) → broadcast left join; the hash draw is a map-side filter.
    No shuffle of the high-frequency stream beyond the final count."""
    ev = load_table(spark, sf_dir, "events")
    flagged = (
        ev.where((F.col("event_type") == "error") & (F.col("value") > 300.0))
        .select("user_id")
        .distinct()
    ).withColumn("_flag", F.lit(1))
    high = ev.where(F.col("event_type").isin("view", "click", "purchase"))
    from micromegas_spark.operators.sampling import sample_unit

    kept = high.join(F.broadcast(flagged), "user_id", "left").select(
        "user_id",
        F.when(F.col("_flag").isNotNull(), F.lit("flagged"))
        .when(sample_unit(F.col("user_id"), salt="tail:") < 0.10, F.lit("sampled"))
        .alias("keep_reason"),
    )
    return (
        kept.where(F.col("keep_reason").isNotNull())
        .groupBy("keep_reason")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .transform(ordered, "keep_reason")
    )


@query(
    "events_asof_join",
    oracle="""
    WITH u AS (
        SELECT user_id, epoch_us(ts) AS t, 0 AS side,
               event_id AS r_eid, NULL::BIGINT AS l_eid
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, epoch_us(ts), 1, NULL, event_id
        FROM events WHERE event_type = 'error'
    ),
    m AS (
        SELECT user_id, t, side, l_eid,
               last_value(r_eid IGNORE NULLS) OVER w AS click_eid,
               last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER w AS click_t
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY t, side, r_eid
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, l_eid AS event_id, click_eid AS event_id_asof,
           t - click_t AS asof_gap
    FROM m WHERE side = 1
    ORDER BY event_id
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each error event picks the most recent click of
    the same user (operators/asof.asof_join — the union-window composition;
    SURVEY §2.3 J6 'as-of joins absent' in the reference, added here as a
    Spark-first custom operator). NULL match = no preceding click."""
    from micromegas_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select("user_id", "ts_us", "event_id")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts_us", "event_id")
    out = asof_join(
        errors, clicks, key_cols=["user_id"], time_col="ts_us",
        right_value_cols=["event_id"], tie_col="event_id",
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("event_id_asof"),
        F.col("asof_gap"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Windows / top-k / first_value
# ---------------------------------------------------------------------------


@query(
    "events_window_norm",
    oracle="""
    SELECT event_id,
           value,
           value / MAX(value) OVER (PARTITION BY event_type) AS norm_value
    FROM events
    ORDER BY event_id
    """,
)
def events_window_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded-window normalization — the reference's only documented
    window usage is exactly this shape: MAX(cnt) OVER () global normalization
    (functions-reference.md:1314; SURVEY §2.5)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    return (
        ev.select(
            "event_id",
            "value",
            (F.col("value") / F.max("value").over(w)).alias("norm_value"),
        ).orderBy("event_id")
    )


@query(
    "events_window_lag",
    oracle="""
    SELECT event_id,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
           value - LAG(value) OVER w AS value_delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ORDER BY event_id
    """,
)
def events_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytic frame per user stream (SURVEY §2.5: engine must
    support ranking/analytic/frames). Ordering includes the unique event_id
    so ties are deterministic across engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
    ).orderBy("event_id")


@query(
    "orders_topk_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def orders_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number (SURVEY §2.6 O1). At scale this is one
    shuffle on the partition key; Spark's WindowGroupLimit pushes the k-limit
    below the sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@query(
    "customer_first_order",
    oracle="""
    SELECT o_custkey, first_order_date, first_orderkey
    FROM (
        SELECT o_custkey, o_orderdate AS first_order_date, o_orderkey AS first_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn = 1
    ORDER BY o_custkey
    """,
)
def customer_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value-per-group for slowly-changing metadata — the reference's
    processes/streams views are exactly this aggregate (SURVEY §2.4 A3;
    processes_view.rs:28-46). Implemented as a struct-min single-pass
    aggregate (cheaper than a window sort at scale: map-side combinable)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.min(F.struct("o_orderdate", "o_orderkey")).alias("first"))
        .select(
            "o_custkey",
            F.col("first.o_orderdate").alias("first_order_date"),
            F.col("first.o_orderkey").alias("first_orderkey"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# Set ops / distinct
# ---------------------------------------------------------------------------


@query(
    "orders_union_by_status",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n
    FROM (
        SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT * FROM orders WHERE o_totalprice > 200000
    )
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def orders_union_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL across slices (SURVEY §2.7 — the reference unions per-process
    view instances for cross-process traces, schema-reference.md:515)."""
    o = load_table(spark, sf_dir, "orders")
    u = o.where(F.col("o_orderpriority") == "1-URGENT").unionByName(
        o.where(F.col("o_totalprice") > 200000)
    )
    return u.groupBy("o_orderstatus").agg(F.count("*").alias("n")).transform(ordered, "o_orderstatus")


@query(
    "lineitem_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def lineitem_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (SURVEY §2.4 A1; approx_count_distinct is
    the scale path and is exercised in tests — not oracle-comparable)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_rows"),
        )
        .transform(ordered, "l_returnflag")
    )


# ---------------------------------------------------------------------------
# Scalar-function surface on real columns
# ---------------------------------------------------------------------------


@query(
    "events_property_get",
    oracle="""
    SELECT (CAST(json_extract_string(props, '$.k') AS BIGINT) // 10) * 10 AS k_decile,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_property_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """property_get over JSON properties (SURVEY §2.8 F10/F3: the reference's
    property_get / jsonb_get). Our engine normalizes properties to
    MapType/JSON-string and uses native get_json_object — JVM-side, no
    Python UDF in the hot path."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.where(k.isNotNull())
        .groupBy(((k / 10).cast("bigint") * 10).alias("k_decile"))
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
        .transform(ordered, "k_decile")
    )


@query(
    "events_property_get_legacy",
    oracle="""
    SELECT (CAST(json_extract_string(props, '$.k') AS BIGINT) // 10) * 10 AS k_decile,
           COUNT(*) AS n
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_property_get_legacy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """property_get over the reference's LEGACY List<Struct{key,value}>
    physical format — property_get.rs dispatches across three property
    encodings and this exercises the array one: the JSON bag round-trips
    json → map → legacy array (properties_to_array), then
    property_get(fmt="array") reads it back; agreeing with the direct
    JSON-path oracle proves format equivalence. Filter/element_at are
    JVM-side higher-order functions — no Python crossing."""
    from micromegas_spark.functions import properties as P

    ev = load_table(spark, sf_dir, "events")
    legacy = P.properties_to_array(P.json_properties_to_map(F.col("props")))
    k = P.property_get(legacy, "k", fmt="array").cast("bigint")
    return (
        ev.where(k.isNotNull())
        .groupBy(((k / 10).cast("bigint") * 10).alias("k_decile"))
        .agg(F.count("*").alias("n"))
        .transform(ordered, "k_decile")
    )


@query(
    "lineitem_bin_center",
    oracle="""
    SELECT FLOOR(l_quantity / 5.0 + 0.5) * 5.0 AS qty_bin,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
    """,
)
def lineitem_bin_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bin_center(coord, cell_size) — snap to center of zero-centered bins
    (SURVEY §2.8 F17; binning/bin_center.rs:92, semantics [c-cs/2, c+cs/2)).
    Pure JVM-side expression, registered in functions/math_fns.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy((F.floor(F.col("l_quantity") / 5.0 + 0.5) * 5.0).alias("qty_bin"))
        .agg(F.count("*").alias("n"))
        .transform(ordered, "qty_bin")
    )


@query(
    "lineitem_math_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_discount + (l_tax - l_discount) * 0.5 AS lerp_mid,
           (l_quantity - 1.0) / (50.0 - 1.0) AS qty_unlerp
    FROM lineitem
    WHERE l_orderkey % 10 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
)
def lineitem_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lerp(a,b,t) / unlerp(a,b,x) scalar math (SURVEY §2.8 F18;
    math/lerp.rs, math/unlerp.rs — no clamping, NaN/Inf propagate)."""
    from micromegas_spark.functions.math_fns import lerp, unlerp

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_orderkey") % 10 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            lerp(F.col("l_discount"), F.col("l_tax"), F.lit(0.5)).alias("lerp_mid"),
            unlerp(F.lit(1.0), F.lit(50.0), F.col("l_quantity")).alias("qty_unlerp"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "events_rgba_color",
    oracle="""
    SELECT event_id,
           CAST(FLOOR(LEAST(GREATEST(value / 327.53, 0.0), 1.0) * 255 + 0.5) AS BIGINT) * 16777216
         + CAST(FLOOR(LEAST(GREATEST(CAST(user_id AS DOUBLE) / 14.0, 0.0), 1.0) * 255 + 0.5) AS BIGINT) * 65536
         + CAST(FLOOR(0.5 * 255 + 0.5) AS BIGINT) * 256
         + 255 AS rgba
    FROM events
    WHERE event_type = 'click'
    ORDER BY event_id
    """,
)
def events_rgba_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rgba(r,g,b,a) → packed 0xRRGGBBAA color (SURVEY §2.8 F14;
    color/rgba.rs:98 — components clamped to [0,1], scaled to 0..255).
    Implemented as a pure Column expression (functions/color.py)."""
    from micromegas_spark.functions.color import rgba

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type") == "click")
        .select(
            "event_id",
            rgba(
                F.col("value") / 327.53,
                F.col("user_id").cast("double") / 14.0,
                F.lit(0.5),
                F.lit(1.0),
            ).alias("rgba"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Histogram suite, SQL-composable form (SURVEY §2.4 A4-A7)
# ---------------------------------------------------------------------------

_H_START, _H_END, _H_BINS = 0.0, 110000.0, 22
_H_WIDTH = (_H_END - _H_START) / _H_BINS


@query(
    "lineitem_histogram_bins",
    oracle=f"""
    SELECT CAST(LEAST(GREATEST(FLOOR((l_extendedprice - {_H_START}) / {_H_WIDTH}), 0.0), {_H_BINS - 1}.0) AS BIGINT) AS bin_idx,
           ({_H_START} + (CAST(LEAST(GREATEST(FLOOR((l_extendedprice - {_H_START}) / {_H_WIDTH}), 0.0), {_H_BINS - 1}.0) AS BIGINT) + 0.5) * {_H_WIDTH}) AS bin_center,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY 1, 2
    ORDER BY 1
    """,
)
def lineitem_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_histogram + expand_histogram as composable SQL: fixed-bin
    assignment with edge clamping, then per-bin counts with bin centers
    (SURVEY §2.4 A4/A7; histogram_udaf.rs:19-110, expand.rs). The struct-
    valued UDAF variant lives in functions/histogram.py; this SQL shape is
    the scale path (pure map-side expression + one shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    bin_idx = F.least(
        F.greatest(F.floor((F.col("l_extendedprice") - _H_START) / _H_WIDTH), F.lit(0.0)),
        F.lit(float(_H_BINS - 1)),
    ).cast("bigint")
    return (
        li.groupBy(bin_idx.alias("bin_idx"))
        .agg(F.count("*").alias("n"))
        .select(
            "bin_idx",
            (_H_START + (F.col("bin_idx") + 0.5) * _H_WIDTH).alias("bin_center"),
            "n",
        )
        .transform(ordered, "bin_idx")
    )


@query(
    "lineitem_histogram_p95",
    oracle=f"""
    WITH h AS (
        SELECT CAST(LEAST(GREATEST(FLOOR((l_extendedprice - {_H_START}) / {_H_WIDTH}), 0.0), {_H_BINS - 1}.0) AS BIGINT) AS b,
               COUNT(*) AS c
        FROM lineitem GROUP BY 1
    ),
    s AS (
        SELECT b, c,
               SUM(c) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(c) OVER () AS total
        FROM h
    )
    SELECT ({_H_START} + (CAST(b AS DOUBLE) + (0.95 * total - (cum - c)) / c) * {_H_WIDTH}) AS p95
    FROM s
    WHERE cum >= 0.95 * total
    ORDER BY b
    LIMIT 1
    """,
)
def lineitem_histogram_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantile_from_histogram(h, 0.95): linear interpolation within the bin
    containing the target rank (SURVEY §2.4 A6; histogram/quantile.rs:96 —
    position = (target - cum_before) / bin_count within the bin)."""
    li = load_table(spark, sf_dir, "lineitem")
    b = F.least(
        F.greatest(F.floor((F.col("l_extendedprice") - _H_START) / _H_WIDTH), F.lit(0.0)),
        F.lit(float(_H_BINS - 1)),
    ).cast("bigint")
    h = li.groupBy(b.alias("b")).agg(F.count("*").alias("c"))
    w_cum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    s = h.select(
        "b",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("total"),
    )
    return (
        s.where(F.col("cum") >= 0.95 * F.col("total"))
        .orderBy("b")
        .limit(1)
        .select(
            (
                _H_START
                + (F.col("b").cast("double") + (0.95 * F.col("total") - (F.col("cum") - F.col("c"))) / F.col("c"))
                * _H_WIDTH
            ).alias("p95")
        )
    )


@query(
    "events_error_anomaly",
    oracle="""
    WITH b AS (
        SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE event_type = 'error' GROUP BY 1
    ),
    w AS (
        SELECT hour_epoch, n,
               CAST(COUNT(n)  OVER f AS BIGINT) AS k,
               CAST(SUM(n)    OVER f AS DOUBLE) AS s,
               CAST(SUM(n*n)  OVER f AS DOUBLE) AS ss
        FROM b
        WINDOW f AS (ORDER BY hour_epoch ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT hour_epoch, n,
           CASE WHEN k >= 8 AND (ss - s*s/k) / (k-1) > 0
                THEN round((n - s/k) / sqrt((ss - s*s/k) / (k-1)), 6)
           END AS z,
           CASE WHEN k >= 8 AND (ss - s*s/k) / (k-1) > 0
                     AND abs((n - s/k) / sqrt((ss - s*s/k) / (k-1))) > 2.0
                THEN 1 ELSE 0 END AS is_anomaly
    FROM w ORDER BY hour_epoch
    """,
)
def events_error_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-rate anomaly detection — the alerting query of an
    observability stack: hourly error counts scored as a z-score against
    the trailing 24 populated bins (explicit sum/sum-sq sample variance,
    NOT the engines' stddev implementations, so both engines share one
    float op order; frames evaluate in hour order on both). Bins with
    fewer than 8 trailing samples or zero variance emit NULL. One
    aggregation + one ordered window — at fleet scale partition the
    window by (process, metric) key; the global spine here matches the
    reference's single-stream alert shape."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.where(F.col("event_type") == "error")
        .groupBy(
            (F.floor(F.col("ts_us") / F.lit(3_600_000_000)).cast("bigint") * 3600).alias(
                "hour_epoch"
            )
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    f = Window.orderBy("hour_epoch").rowsBetween(-24, -1)
    w = b.select(
        "hour_epoch",
        "n",
        F.count("n").over(f).cast("bigint").alias("k"),
        F.sum("n").over(f).cast("double").alias("s"),
        F.sum(F.col("n") * F.col("n")).over(f).cast("double").alias("ss"),
    )
    # try_divide: ANSI mode raises on the k=0/k=1 rows of the warm-up
    # prefix even under a when() guard (the branch is analyzed eagerly);
    # the ok predicate already excludes those rows from the output
    var = F.try_divide(
        F.col("ss") - F.try_divide(F.col("s") * F.col("s"), F.col("k")),
        F.col("k") - 1,
    )
    z = F.try_divide(F.col("n") - F.try_divide(F.col("s"), F.col("k")), F.sqrt(var))
    ok = (F.col("k") >= 8) & (var > 0)
    return w.select(
        "hour_epoch",
        "n",
        F.when(ok, F.round(z, 6)).alias("z"),
        F.when(ok & (F.abs(z) > 2.0), F.lit(1)).otherwise(F.lit(0)).alias("is_anomaly"),
    ).orderBy("hour_epoch")


@query(
    "events_user_retention",
    oracle="""
    WITH a AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
    ),
    act AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_active FROM a GROUP BY day),
    ret AS (
        SELECT t.day, CAST(COUNT(*) AS BIGINT) AS n_retained
        FROM a t JOIN a n ON n.user_id = t.user_id AND n.day = t.day + 1
        GROUP BY t.day
    )
    SELECT act.day, act.n_active,
           COALESCE(ret.n_retained, 0) AS n_retained,
           round(CAST(COALESCE(ret.n_retained, 0) AS DOUBLE) / act.n_active, 6)
               AS retention
    FROM act LEFT JOIN ret USING (day)
    ORDER BY act.day
    """,
)
def events_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day user retention — the cohort query of product/usage
    analytics: of the users active on day d, the fraction also active on
    d+1. One distinct projection feeds both sides; the next-day set is
    the same relation shifted by one day, left-semi joined per user —
    cardinality is bounded by distinct (user, day), never raw events.
    At fleet scale the (user, day) distinct is the only full shuffle."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        "user_id", F.floor(F.col("ts_us") / F.lit(86_400_000_000)).cast("bigint").alias("day")
    ).distinct()
    act = a.groupBy("day").agg(F.count("*").cast("bigint").alias("n_active"))
    nxt = a.select("user_id", (F.col("day") - 1).alias("day"))
    ret = (
        a.join(nxt, ["user_id", "day"], "left_semi")
        .groupBy("day")
        .agg(F.count("*").cast("bigint").alias("n_retained"))
    )
    return (
        act.join(ret, "day", "left")
        .select(
            "day",
            "n_active",
            F.coalesce(F.col("n_retained"), F.lit(0)).cast("bigint").alias("n_retained"),
            F.round(
                F.coalesce(F.col("n_retained"), F.lit(0)).cast("double")
                / F.col("n_active"),
                6,
            ).alias("retention"),
        )
        .transform(ordered, "day")
    )


@query(
    "orders_skew_safe_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn <= 3
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey DESC
    """,
)
def orders_skew_safe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof per-key top-k (operators/skew.skew_safe_topk): local
    top-k inside each input partition, then a global window over the
    k·partitions survivors — semantically identical to a plain
    ROW_NUMBER window (the oracle), but a hot customer contributes at
    most k rows per partition to the shuffle instead of its full volume.
    The order key is a (price, orderkey) struct so ties are deterministic
    on both engines."""
    from micromegas_spark.operators.skew import skew_safe_topk

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.struct(F.col("o_totalprice"), F.col("o_orderkey")).alias("_ord"),
    )
    return (
        skew_safe_topk(o, ["o_custkey"], "_ord", k=3, descending=True)
        .drop("_ord")
        .orderBy("o_custkey", F.col("o_totalprice").desc(), F.col("o_orderkey").desc())
    )


@query(
    "orders_salted_join_revenue",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def orders_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe fact⨝fact join (operators/skew.salted_join): lineitem
    rows get a deterministic salt bucket, orders replicate across the 8
    buckets, the join key becomes (orderkey, salt) — a hot order's items
    spread over 16 tasks. The oracle is the PLAIN join: salting must be
    invisible in the result. Use when both sides are too big to broadcast
    and a key is hot enough that AQE's skew split can't keep up."""
    from micromegas_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = salted_join(li, o, ["o_orderkey"], salt=8, how="inner")
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast(_DEC2)).cast("double").alias("revenue"),
        )
        .transform(ordered, "o_orderpriority")
    )


@query(
    "events_hll_distinct_users",
    oracle="""
    SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def events_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting — SURVEY §2.4 A2's composable-
    aggregate contract extended to COUNT DISTINCT, which plain counts
    can't compose (distinct users per 15 min do NOT sum to distinct per
    hour). Spark's built-in DataSketches HLL does: 15-minute buckets
    pre-aggregate to sketches (hll_sketch_agg — map-side combinable,
    materializable exactly like log_stats partials), hours merge them
    (hll_union_agg) and read the estimate. At 100 TB this is THE way a
    dashboard serves distinct-user counts from pre-aggregated partitions
    without rescanning raw events.

    Differential check is exact, not approximate: the corpus's per-hour
    user cardinality sits in the sketch's sparse-exact regime at both
    correctness and bench SF (verified 720/720 hour buckets at sf0.01
    and sf0.1), so the estimate equals the oracle's exact
    COUNT(DISTINCT). Beyond the sparse range the operator degrades to
    the documented ±~1.6% HLL error — the merge identity, not the
    estimate, is the contract."""
    ev = load_table(spark, sf_dir, "events")
    # epoch-integer hour key (registry convention: event timestamps are
    # compared as epoch integers — timezone-proof on both engines)
    hour = (F.floor(F.col("ts_us") / F.lit(3_600_000_000)).cast("bigint") * 3600).alias(
        "hour_epoch"
    )
    part = (
        ev.select(
            hour,
            F.floor(F.col("ts_us") / (15 * 60 * 1000 * 1000)).alias("_b15"),
            "user_id",
        )
        .groupBy("hour_epoch", "_b15")
        # explicit lgK=20 (RSE ~0.10%): the union adopts the partials'
        # lgConfigK (pinned by test_hll_union_preserves_lgk), so partial
        # precision IS merged precision — the default lgK=12 (RSE 1.6%)
        # was the entire error source of the old sf1 measurement
        .agg(F.hll_sketch_agg("user_id", F.lit(20)).alias("_sk"))
    )
    return (
        part.groupBy("hour_epoch")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("_sk"))
            .cast("bigint")
            .alias("n_users")
        )
        .transform(ordered, "hour_epoch")
    )


@query(
    "events_funnel_anchor",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2, ANY_VALUE(s1.t1) AS t1
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
          AND epoch_us(e.ts) <= s1.t1 + 259200000000
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
          AND epoch_us(e.ts) <= s2.t1 + 259200000000
        GROUP BY e.user_id
    )
    SELECT step, event_type, n FROM (
        SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
               CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n
        UNION ALL
        SELECT 2, 'click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
        UNION ALL
        SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
    ) ORDER BY step
    """,
)
def events_funnel_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step funnel view→click→purchase with a 3-day window from
    each user's earliest VIEW — anchor-window semantics, vs the sibling
    events_funnel's per-transition 24h windows — via the reusable N-step
    operator (operators/funnel.funnel_counts): earliest-anchor greedy
    matching, one user-keyed aggregation per step (co-partitioned joins,
    no window functions, no event collection)."""
    from micromegas_spark.operators.funnel import funnel_counts

    e = load_table(spark, sf_dir, "events")
    return funnel_counts(
        e, ["view", "click", "purchase"], ts_col="ts_us",
        window=259_200_000_000,  # 3 days in ts_us's unit (µs)
    )


_COUNTER_RATE_ORACLE = """
    WITH v AS (
        SELECT epoch_us(ts) AS ts_us, event_id, user_id,
               CAST(value AS DECIMAL(18,6)) AS v
        FROM events
    ),
    l AS (
        SELECT (ts_us // 3600000000) * 3600 AS hour_epoch, v,
               lag(v) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS pv
        FROM v
    )
    SELECT hour_epoch,
           CAST(SUM(CASE WHEN pv IS NULL THEN NULL
                         WHEN v >= pv THEN v - pv
                         ELSE v END) AS DOUBLE) AS increase,
           CAST(SUM(CASE WHEN pv IS NOT NULL AND v < pv THEN 1 ELSE 0 END) AS BIGINT)
               AS n_resets,
           round(CAST(SUM(CASE WHEN pv IS NULL THEN NULL
                               WHEN v >= pv THEN v - pv
                               ELSE v END) AS DOUBLE) / 3600, 6) AS rate_per_sec
    FROM l GROUP BY hour_epoch ORDER BY hour_epoch
    """


@query("events_counter_rate", oracle=_COUNTER_RATE_ORACLE)
def events_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style increase()/rate() with counter-RESET handling — the
    monotonic-counter semantics every metrics backend needs: per series
    (user_id here; (process, metric) in the reference's measures view),
    delta to the previous sample ordered by (ts, id); a drop means the
    counter restarted, so the new raw value is the contribution
    (Prometheus increase() reset rule). Exact-decimal deltas so the
    per-hour sum is summation-order independent; one window shuffle on
    the series key, then one hash agg — both partition-parallel at 100 TB
    when keyed by series."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pv = F.lag(v).over(w)
    inc = (
        F.when(pv.isNull(), F.lit(None).cast("decimal(18,6)"))
        .when(v >= pv, v - pv)
        .otherwise(v)
    )
    reset = F.when(pv.isNotNull() & (v < pv), 1).otherwise(0)
    binned = ev.select(
        (F.floor(F.col("ts_us") / F.lit(3_600_000_000)).cast("bigint") * 3600).alias("hour_epoch"),
        inc.alias("inc"),
        reset.alias("reset"),
    )
    return (
        binned.groupBy("hour_epoch")
        .agg(
            F.sum("inc").cast("double").alias("increase"),
            F.sum("reset").cast("bigint").alias("n_resets"),
            F.round(F.sum("inc").cast("double") / 3600, 6).alias("rate_per_sec"),
        )
        .transform(ordered, "hour_epoch")
    )


@query(
    "events_slo_burn",
    oracle="""
    WITH b AS (
        SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS e
        FROM events GROUP BY 1
    ),
    w AS (
        SELECT hour_epoch, n, e,
               CAST(SUM(n) OVER f AS BIGINT) AS n6,
               CAST(SUM(e) OVER f AS BIGINT) AS e6
        FROM b
        WINDOW f AS (ORDER BY hour_epoch RANGE BETWEEN 18000 PRECEDING AND CURRENT ROW)
    )
    SELECT hour_epoch, n, e,
           round((e::DOUBLE / n) / 0.25, 6) AS burn_1h,
           round((e6::DOUBLE / n6) / 0.25, 6) AS burn_6h,
           CASE WHEN (e::DOUBLE / n) / 0.25 > 1.0 AND (e6::DOUBLE / n6) / 0.25 > 1.0
                THEN 1 ELSE 0 END AS alert
    FROM w ORDER BY hour_epoch
    """,
)
def events_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window error-budget burn-rate alerting (the Google SRE
    workbook rule): per hour, error ratio over a 75% SLO's budget gives
    the short-window burn; a trailing 6h time-RANGE window (robust to
    empty hours, unlike ROWS) gives the long window; alert only when BOTH
    exceed 1x budget — the standard guard against blips and against
    stale long-window averages. One agg + one ordered range-window over
    the hour spine; partition by (service, slo) at fleet scale."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        (F.floor(F.col("ts_us") / F.lit(3_600_000_000)).cast("bigint") * 3600).alias("hour_epoch")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("bigint").alias("e"),
    )
    f = Window.orderBy("hour_epoch").rangeBetween(-18000, 0)
    w = b.select(
        "hour_epoch",
        "n",
        "e",
        F.sum("n").over(f).cast("bigint").alias("n6"),
        F.sum("e").over(f).cast("bigint").alias("e6"),
    )
    burn1 = (F.col("e").cast("double") / F.col("n")) / F.lit(0.25)
    burn6 = (F.col("e6").cast("double") / F.col("n6")) / F.lit(0.25)
    return w.select(
        "hour_epoch",
        "n",
        "e",
        F.round(burn1, 6).alias("burn_1h"),
        F.round(burn6, 6).alias("burn_6h"),
        F.when((burn1 > 1.0) & (burn6 > 1.0), 1).otherwise(0).alias("alert"),
    ).orderBy("hour_epoch")


@query(
    "events_log_templates",
    oracle=r"""
    WITH m AS (
        SELECT event_id, user_id,
               regexp_split_to_array(trim(event_type || ' ' || props), '\s+') AS toks
        FROM events
    ),
    p AS (
        SELECT event_id, user_id, len(toks) AS n_toks,
               unnest(generate_series(1, len(toks))) AS pos,
               unnest(toks) AS tok
        FROM m
    ),
    dec AS (
        SELECT n_toks, pos, (COUNT(DISTINCT tok) > 8) AS masked
        FROM p GROUP BY 1, 2
    ),
    tm AS (
        SELECT p.event_id, min(p.user_id) AS user_id,
               string_agg(CASE WHEN d.masked THEN '<*>' ELSE p.tok END,
                          ' ' ORDER BY p.pos) AS template
        FROM p JOIN dec d USING (n_toks, pos)
        GROUP BY p.event_id
    )
    SELECT template, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(event_id) AS BIGINT) AS example_id
    FROM tm GROUP BY template ORDER BY n DESC, template
    """,
)
def events_log_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain-style log-template mining over the raw message stream
    (event_type + payload here; the reference's log_entries messages in
    production): positions whose distinct-token count exceeds a threshold
    within each token-count group are variables -> masked ``<*>``; stable
    slots survive verbatim. Two hash aggs + one broadcast of the tiny
    per-slot mask dimension (operators/logmine.py) — no parse tree, no
    Python crossing, partition-parallel at 100 TB. Output: each template
    with its frequency, distinct-user spread and earliest exemplar."""
    from micromegas_spark.operators.logmine import mine_templates

    ev = load_table(spark, sf_dir, "events")
    msgs = ev.select(
        "event_id",
        "user_id",
        F.concat_ws(" ", F.col("event_type"), F.col("props")).alias("msg"),
    )
    tm = mine_templates(msgs, msg_col="msg", id_col="event_id").join(
        msgs.select("event_id", "user_id"), "event_id"
    )
    return (
        tm.groupBy("template")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.min("event_id").cast("bigint").alias("example_id"),
        )
        .orderBy(F.desc("n"), "template")
    )


@query(
    "events_ohlc_downsample",
    oracle="""
    WITH v AS (
        SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch,
               epoch_us(ts) AS ts_us, event_id, value
        FROM events
    ),
    r AS (
        SELECT *,
               row_number() OVER (PARTITION BY hour_epoch ORDER BY ts_us, event_id) AS rn_a,
               row_number() OVER (PARTITION BY hour_epoch ORDER BY ts_us DESC, event_id DESC) AS rn_d
        FROM v
    )
    SELECT hour_epoch,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM r GROUP BY 1 ORDER BY 1
    """,
)
def events_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling — the dashboard-render query of every metrics
    store (candlestick per bin: first/max/min/last + mean): open/close
    resolved by a total (ts, id) tie-broken row_number per bin, extrema
    and exact-decimal mean as plain aggregates. One window + one agg,
    both keyed on the time bin — embarrassingly parallel across bins at
    100 TB; per-series variants add the series key to both partitionings."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        (F.floor(F.col("ts_us") / F.lit(3_600_000_000)).cast("bigint") * 3600).alias("hour_epoch"),
        "ts_us",
        "event_id",
        "value",
    )
    wa = Window.partitionBy("hour_epoch").orderBy("ts_us", "event_id")
    wd = Window.partitionBy("hour_epoch").orderBy(F.desc("ts_us"), F.desc("event_id"))
    r = v.select(
        "hour_epoch",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        r.groupBy("hour_epoch")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("*"), 6
            ).alias("mean"),
            F.count("*").cast("bigint").alias("n"),
        )
        .transform(ordered, "hour_epoch")
    )


_HT_START, _HT_END, _HT_BINS = 0.0, 500.0, 25
_HT_WIDTH = (_HT_END - _HT_START) / _HT_BINS


@query(
    "events_histogram_timeseries",
    oracle=f"""
    WITH v AS (
        SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch, value FROM events
    ),
    h AS (
        SELECT hour_epoch,
               CAST(LEAST(GREATEST(FLOOR((value - {_HT_START}) / {_HT_WIDTH}), 0.0), {_HT_BINS - 1}.0) AS BIGINT) AS b,
               COUNT(*) AS c
        FROM v GROUP BY 1, 2
    ),
    s AS (
        SELECT hour_epoch, b, c,
               SUM(c) OVER (PARTITION BY hour_epoch ORDER BY b
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(c) OVER (PARTITION BY hour_epoch) AS total
        FROM h
    )
    SELECT hour_epoch,
           round(arg_min(({_HT_START} + (CAST(b AS DOUBLE) + (0.95 * CAST(total AS DOUBLE) - (cum - c)) / c) * {_HT_WIDTH}), b), 6) AS p95,
           CAST(MIN(total) AS BIGINT) AS n
    FROM s
    WHERE cum >= 0.95 * CAST(total AS DOUBLE)
    GROUP BY 1 ORDER BY 1
    """,
)
def events_histogram_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus histogram_quantile over time: per hour bin, a fixed-bin
    histogram of `value`, then the interpolated p95 read out of the bins
    (SURVEY §2.4 A4+A6 composed into a timeseries — the reference's
    histogram UDAF exists precisely so dashboards can do this over
    pre-aggregated partials, histogram_udaf.rs + quantile.rs:96). The
    histogram IS the mergeable partial: per-hour state is 25 counters no
    matter how many raw events — the constant-size rollup contract that
    makes p95-over-time tractable at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        (F.floor(F.col("ts_us") / F.lit(3_600_000_000)).cast("bigint") * 3600).alias("hour_epoch"),
        "value",
    )
    b = F.least(
        F.greatest(F.floor((F.col("value") - _HT_START) / _HT_WIDTH), F.lit(0.0)),
        F.lit(float(_HT_BINS - 1)),
    ).cast("bigint")
    h = v.groupBy("hour_epoch", b.alias("b")).agg(F.count("*").alias("c"))
    w_cum = (
        Window.partitionBy("hour_epoch").orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("hour_epoch")
    s = h.select(
        "hour_epoch",
        "b",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("total"),
    )
    p95 = (
        _HT_START
        + (F.col("b").cast("double") + (0.95 * F.col("total").cast("double") - (F.col("cum") - F.col("c"))) / F.col("c"))
        * _HT_WIDTH
    )
    return (
        s.where(F.col("cum") >= 0.95 * F.col("total").cast("double"))
        .groupBy("hour_epoch")
        .agg(
            F.round(F.min_by(p95, F.col("b")), 6).alias("p95"),
            F.min("total").cast("bigint").alias("n"),
        )
        .transform(ordered, "hour_epoch")
    )


@query("events_counter_rate_stream", oracle=_COUNTER_RATE_ORACLE)
def events_counter_rate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING counter rate ≡ batch ≡ SQL oracle: the same events land
    as two time-split micro-batches; applyInPandasWithState keeps each
    series' LAST SAMPLE as keyed state across the batch boundary
    (streaming/stateful.streaming_counter_increments), so the delta whose
    two samples arrive in different batches is still computed exactly
    once — then the per-hour rollup of the streamed increments matches
    events_counter_rate's exact-decimal DuckDB oracle bit-for-bit
    (increments travel as micro-unit integers; the final
    sum(micro)/1e6 → double equals the batch CAST(SUM(decimal) AS
    DOUBLE) because both are the nearest double to the same rational).
    Batch ORDER is pinned by one_shot_stream_table; within a series
    state transitions sort by (ts, id) exactly like the batch window."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from micromegas_spark.streaming.incremental import one_shot_stream_table
    from micromegas_spark.streaming.stateful import streaming_counter_increments

    ev = load_table(spark, sf_dir, "events")
    samples = ev.select("user_id", "event_id", "ts_us", "value")
    lo, hi = samples.agg(F.min("ts_us"), F.max("ts_us")).collect()[0]
    mid = (int(lo) + int(hi)) // 2
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("ts_us", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    incs = one_shot_stream_table(
        spark,
        [samples.where(F.col("ts_us") < mid), samples.where(F.col("ts_us") >= mid)],
        schema,
        streaming_counter_increments,
        "counter_rate_stream_tbl",
        output_mode="append",
    )
    inc = F.when(F.col("has_inc") == 1, F.col("inc_micro"))
    increase = F.sum(inc).cast("double") / F.lit(1e6)
    return (
        incs.groupBy("hour_epoch")
        .agg(
            increase.alias("increase"),
            F.sum("reset").cast("bigint").alias("n_resets"),
            F.round(increase / 3600, 6).alias("rate_per_sec"),
        )
        .transform(ordered, "hour_epoch")
    )
