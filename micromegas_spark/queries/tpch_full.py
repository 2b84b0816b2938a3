"""Completion of the TPC-H-shape SQL surface (round 2): the remaining
query archetypes Q2/Q4/Q6/Q8/Q9/Q11/Q13/Q15/Q16/Q17/Q18/Q20/Q21 adapted
to the synthetic star schema (no partsupp table, no commit/receipt dates
— late shipping is `l_shipdate > o_orderdate + 60 days`). Together with
queries/sql_surface.py and queries/tpch_extra.py this covers all 22
TPC-H query shapes, exercising every join/agg/subquery archetype the
reference delegates to DataFusion (SURVEY §2.3-2.6, §3.1).

Determinism notes beyond queries/registry.py conventions:
- `l_quantity` holds integer-valued doubles (1..50), so SUM/AVG over it
  is exact in any summation order — safe to compare across engines.
- unit price = l_extendedprice / l_quantity is a single IEEE-754 double
  division, identical in both engines; MIN over it is order-independent.
- share/threshold comparisons cast exact DECIMAL sums to DOUBLE first,
  then do identical double arithmetic on both sides of the comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from micromegas_spark.queries.registry import ordered, query
from micromegas_spark.sources.tables import load_table

_DEC2 = "decimal(18,2)"
_DEC6 = "decimal(28,6)"

_LATE_DAYS = 60  # proxy for receipt>commit: shipped >60d after order


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH offer AS (
        SELECT p.p_partkey, p.p_name, l.l_suppkey,
               MIN(l.l_extendedprice / l.l_quantity) AS unit_price
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_size BETWEEN 10 AND 15 AND p.p_type = 'LARGE'
        GROUP BY p.p_partkey, p.p_name, l.l_suppkey
    )
    SELECT s.s_name, n.n_name AS n_name, o.p_partkey, o.p_name,
           o.unit_price AS best_price
    FROM offer o
    JOIN supplier s ON s.s_suppkey = o.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND o.unit_price = (SELECT MIN(o2.unit_price) FROM offer o2
                          WHERE o2.p_partkey = o.p_partkey)
    ORDER BY o.p_partkey, s.s_name
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier via correlated MIN subquery; the
    partsupp relation is derived from observed lineitem offers). The
    correlated `= (SELECT MIN ...)` becomes a window MIN over p_partkey —
    one extra shuffle on the already-grouped key instead of a self-join.
    part/supplier/nation/region all broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_size").between(10, 15) & (F.col("p_type") == "LARGE")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    offer = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    best = offer.withColumn(
        "_best", F.min("unit_price").over(Window.partitionBy("p_partkey"))
    ).where(F.col("unit_price") == F.col("_best"))
    return (
        best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("unit_price").alias("best_price"),
        )
        .orderBy("p_partkey", "s_name")
    )


@query(
    "q4_order_priority",
    oracle=f"""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: order-priority checking. The correlated EXISTS with a
    non-equi residual (late shipment) is a left-semi join: equi on
    orderkey (the shuffle key) with the date comparison as residual, so
    no fact-side duplication ever materializes."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
        .transform(ordered, "o_orderpriority")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate. All three predicates push to
    the parquet scan (PushedFilters), projection prunes to 4 columns, and
    the single scalar aggregate is map-side-combined — the minimal-IO
    plan a 100 TB fact scan needs."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(_DEC6))
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


@query(
    "q8_market_share",
    oracle="""
    WITH vol AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6)) AS v,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        JOIN part p     ON l.l_partkey = p.p_partkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
             / CAST(SUM(v) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — conditional share of a decimal
    sum per order year. Numerator and denominator are exact DECIMAL sums
    cast to DOUBLE before one division, so both engines do identical
    float arithmetic. Five dimension joins all broadcast; the only
    shuffles are lineitem⨝orders(⨝customer) and the year aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    v = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC6)
    zero = F.lit(0).cast(_DEC6)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", v).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(v).cast("double")
            ).alias("mkt_share")
        )
        .transform(ordered, "o_year")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - 0.5 * p.p_retailprice * l.l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × order year (supply
    cost proxied as half retail price — the schema has no partsupp).
    The LIKE filter prunes part before its broadcast; profit is computed
    per-row in double then summed as DECIMAL for order-independence."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(_DEC6)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
        .transform(ordered, "nation", F.col("o_year").desc())
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH val AS (
        SELECT n.n_name AS nation, l.l_partkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS part_value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        GROUP BY nation, l.l_partkey
    )
    SELECT nation, l_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM val
    WHERE CAST(part_value AS DOUBLE) >
          0.00015 * (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                    FROM lineitem)
    ORDER BY part_value DESC, nation, l_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: (nation, part) inventory value above 0.015% 
    of the global total. Both the per-group value and the global total
    are exact DECIMAL sums cast to DOUBLE before the identical
    `v > 0.0005 * total` comparison. The one-row global total broadcasts
    as a cross join — no second scan-shuffle of the fact table (the
    partial sums feed both aggregations at scale via the same shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    dec = F.col("l_extendedprice").cast(_DEC2)
    # ONE lineitem pass (r12): the global total previously ran as a second
    # full fact scan inside the broadcast subquery (job profile: two
    # 21-task lineitem jobs, 0.4 + 1.3 s warm). The generator guarantees
    # referential integrity (every l_suppkey resolves to a supplier, every
    # supplier to a nation — verified 0 orphans at sf0.001/0.01/0.1), so
    # the inner joins partition lineitem exactly and the DECIMAL group
    # sums re-aggregate to the bit-identical global total (exact decimal
    # addition is order-independent). localCheckpoint: `val` feeds both
    # the threshold subquery and the output — without a materialization
    # point the broadcast thread re-runs the whole scan+join+agg (the
    # nb_classify race). Executor-local blocks: see text.py caveat.
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "l_partkey")
        .agg(F.sum(dec).alias("_pv"))
        .localCheckpoint(eager=True)
    )
    total = val.agg(F.sum("_pv").cast("double").alias("_total"))
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("_pv").cast("double") > 0.00015 * F.col("_total"))
        .select(
            "nation", "l_partkey", F.col("_pv").cast("double").alias("part_value")
        )
        # bounded by construction at ANY scale: every surviving row exceeds
        # 0.015% of the (nonnegative-price) global total, and the part
        # values sum to at most that total, so at most 1/0.00015 ≈ 6,667
        # rows can survive — ordered() applies (no range sampler).
        .transform(ordered, F.col("part_value").desc(), "nation", "l_partkey")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                           AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of order counts per customer, zeros
    included via the left outer join (the filter on priority lives in
    the join condition, not WHERE — pushing it below the outer join
    keeps customers with only urgent orders at count 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .transform(ordered, F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier by quarterly revenue (the view + scalar
    MAX subquery). Revenue stays DECIMAL through the MAX/equality so ties
    are exact; the scalar max broadcasts back over the tiny rev relation."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC6)).alias(
            "_rev"
        )
    )
    mx = rev.agg(F.max("_rev").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("_rev") == F.col("_mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("_rev").cast("double").alias("total_rev"))
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part class, with a
    NOT IN supplier exclusion (negative balance ≙ complaints). NOT IN
    over the non-null key is a broadcast left-anti join; COUNT(DISTINCT)
    is Spark's two-phase expand — both shuffles on already-reduced data."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .transform(ordered, F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_quantity",
    oracle="""
    WITH avg_qty AS (
        SELECT l_partkey, 0.2 * AVG(l_quantity) AS lim
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < a.lim
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity-order revenue. The correlated
    `l_quantity < 0.2*AVG(per part)` becomes a broadcast join against
    the per-part averages (exact: quantities are integer-valued doubles,
    so AVG is order-independent). At 100 TB the avg_qty relation is
    |parts|-sized — bounded, broadcastable after aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    avg_qty = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("lim")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("_pk"))
        .where(F.col("l_quantity") < F.col("lim"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_DEC2)).cast("double") / 7.0).alias(
                "avg_yearly"
            ),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


@query(
    "q18_large_volume",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(epoch_us(o.o_orderdate) // 1000000 AS BIGINT) AS o_date,
           o.o_totalprice, CAST(SUM(l.l_quantity) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o_date, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume customers. The IN subquery is an
    aggregate-then-semi-join; quantity sums are exact (integer-valued
    doubles). Order date is emitted as epoch seconds per the registry's
    timezone-proof convention."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("_sq")).where(
        F.col("_sq") > 300.0
    )
    return (
        o.join(big.select("l_orderkey"), o.o_orderkey == F.col("l_orderkey"), "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").cast("bigint").alias("o_date"),
            "o_totalprice",
        )
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q20_part_promotion",
    oracle="""
    WITH shipped AS (
        SELECT l.l_suppkey, l.l_partkey, SUM(l.l_quantity) AS qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'red%'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
    ), part_total AS (
        SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_name, n.n_name AS n_name
    FROM shipped sh
    JOIN part_total t ON t.l_partkey = sh.l_partkey
    JOIN supplier s   ON s.s_suppkey = sh.l_suppkey
    JOIN nation n     ON n.n_nationkey = s.s_nationkey
    WHERE sh.qty > 0.5 * t.total_qty
    ORDER BY s.s_name
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominated (>50% of) a red part's
    1997 shipments. The nested correlated subqueries become one grouped
    relation reused for both sides (per-(supp,part) and per-part totals)
    — a single fact shuffle feeds both, then dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("qty").alias("total_qty")
    )
    return (
        shipped.join(F.broadcast(part_total), shipped.l_partkey == F.col("_pk"))
        .where(F.col("qty") > 0.5 * F.col("total_qty"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .distinct()
        .orderBy("s_name")
    )


@query(
    "q21_late_suppliers",
    oracle=f"""
    WITH ol AS (
        SELECT l.l_orderkey, l.l_suppkey, l.l_linenumber,
               CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY
                    THEN 1 ELSE 0 END AS is_late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
    ), per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supp
        FROM ol GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM ol
    JOIN per_order po ON po.l_orderkey = ol.l_orderkey
    JOIN supplier s   ON s.s_suppkey = ol.l_suppkey
    JOIN nation n     ON n.n_nationkey = s.s_nationkey
    WHERE ol.is_late = 1 AND po.n_supp > 1 AND po.n_late_supp = 1
      AND n.n_name = 'NATION_1'
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q21_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who alone held up multi-supplier orders.
    The EXISTS / NOT EXISTS pair collapses into per-order distinct
    counts (n_supp > 1, n_late_supp = 1 — given the probe row is late,
    it is necessarily the lone late supplier), turning two correlated
    self-joins into one grouped pass over the order-shuffled fact."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    ol = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAYS")
        ).alias("is_late"),
    )
    # ONE grouped pass, NO distinct-Expand (r12): the r11 shape consumed
    # `ol` as the two sides of a self-join (lineitem⋈orders computed twice,
    # shuffled by l_orderkey twice) and its two COUNT(DISTINCT)s planned an
    # Expand (rows ×3). A first mid-rewrite (count_distincts +
    # collect_list of late suppliers in one aggregate) measured 2.07× in
    # the controlled A/B — collect_list over the expanded rows forces
    # ObjectHashAggregate off the codegen path. This shape instead
    # aggregates twice hierarchically, all codegen HashAggregates:
    #   1. per (order, supplier): count of late rows — collapses the fact;
    #   2. per order: n_supp = group count (≡ COUNT(DISTINCT l_suppkey)),
    #      n_late_supp = groups with any late row, and — valid exactly
    #      because the filter keeps n_late_supp == 1 — the lone late
    #      supplier (max over the only non-null) and ITS late-row count.
    # numwait = Σ late rows of the lone supplier over surviving orders,
    # identical to the old COUNT(*) over the probe-join rows.
    per_os = ol.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("is_late"), F.lit(1))).alias("_lr")
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.count(F.when(F.col("_lr") > 0, F.lit(1))).alias("n_late_supp"),
        F.max(F.when(F.col("_lr") > 0, F.col("l_suppkey"))).alias("_lone"),
        F.max(F.when(F.col("_lr") > 0, F.col("_lr"))).alias("_lone_rows"),
    )
    return (
        per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("_lone") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.sum("_lone_rows").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
