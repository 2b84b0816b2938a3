"""Additional TPC-H-shape SQL-surface queries (round 2): nation-pair
volume (Q7), returned-items top customers (Q10), priority×ship-month
matrix (Q12 shape), disjunctive join predicates (Q19), and
above-average-balance anti-join (Q22 shape) — widening the general-SQL
parity surface the reference delegates to DataFusion
(mkdocs/docs/query-guide/ SQL reference; SURVEY §2.4-2.6, §3.1).

Determinism: money sums go through DECIMAL then one cast to DOUBLE; the
Q22 average-balance comparison is expressed as an exact decimal
multiply-compare (bal·n > Σbal) because AVG over DOUBLE is
summation-order-dependent and AVG over DECIMAL returns engine-specific
types (Spark widens the scale, DuckDB returns DOUBLE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from micromegas_spark.queries.registry import ordered, query
from micromegas_spark.sources.tables import load_table

_DEC2 = "decimal(18,2)"
_DEC6 = "decimal(28,6)"


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral nation-pair trade volume by ship year.
    Both nation dims broadcast; the disjunctive nation-pair predicate sits
    ABOVE the joins so each join stays a plain equi-join (Catalyst can
    still push the n1/n2 IN-lists into the dim scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC6))
            .cast("double")
            .alias("revenue")
        )
        .transform(ordered, "supp_nation", "cust_nation", "l_year")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned
    items in one quarter. Time + returnflag filters push to the parquet
    scans; the only shuffles are the two fact joins and the final
    TakeOrderedAndProject (no global sort). c_custkey breaks revenue
    ties for a deterministic LIMIT."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC6))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q12_priority_shipmonth",
    oracle="""
    SELECT CAST(epoch_us(date_trunc('month', l.l_shipdate)) // 1000000 AS BIGINT) AS ship_month,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY ship_month
    ORDER BY ship_month
    """,
)
def q12_priority_shipmonth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → ship month: the synthetic schema has no
    l_shipmode): urgent-vs-other order counts per ship month. Conditional
    counts are map-side-combinable SUM(CASE)s — one shuffle on the join
    key, one on the month. Months compare as epoch seconds (BIGINT), the
    timezone-proof convention."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            (F.unix_timestamp(F.date_trunc("month", F.col("l_shipdate"))))
            .cast("bigint")
            .alias("ship_month")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .transform(ordered, "ship_month")
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (brand, size, quantity) predicate
    groups over a fact⨝dim join. Catalyst extracts the common
    brand/size/quantity envelope as pushable conjuncts (the OR-predicate
    pushdown the reference gets from DataFusion); part is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")

    def grp(brand: str, smax: int, qlo: int, qhi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, smax)
            & F.col("l_quantity").between(qlo, qhi)
        )

    cond = grp("Brand#12", 5, 1, 11) | grp("Brand#23", 10, 10, 20) | grp(
        "Brand#34", 15, 20, 30
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC6))
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


@query(
    "q22_balance_anti",
    oracle="""
    WITH pos AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, pos
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.n > pos.total
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY segment
    ORDER BY segment
    """,
)
def q22_balance_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (phone prefix → market segment): customers with
    above-average positive balance and no RECENT orders (the synthetic
    data has no order-less customers, so the anti-join is time-windowed
    to stay selective). The average is an exact decimal multiply-compare
    (bal·n > Σbal) so both engines agree bit-for-bit; the no-recent-orders
    test is a left-anti join on custkey with the date filter pushed into
    the orders scan (the scalar aggregate broadcasts — one row)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    pos = c.where(F.col("c_acctbal") > 0.0).agg(
        F.count("*").cast("bigint").alias("_n"),
        F.sum(F.col("c_acctbal").cast(_DEC2)).alias("_total"),
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .where(F.col("c_acctbal").cast(_DEC2) * F.col("_n") > F.col("_total"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC2)).cast("double").alias("totacctbal"),
        )
        .transform(ordered, "segment")
    )


def _pagerank_oracle_sql(damping: float = 0.85, n_iter: int = 4) -> str:
    """Fully-unrolled weighted PageRank over the nation trade graph as
    one DuckDB query (the emb_kmeans template: fixed iterations make the
    whole iterative algorithm differentially checkable). Edge weights go
    through DECIMAL so both engines start from identical doubles."""
    d = damping
    parts = [
        """e AS (
        SELECT n1.n_name AS src, n2.n_name AS dst,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(28,6))) AS DOUBLE) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        GROUP BY n1.n_name, n2.n_name)""",
        "outw AS (SELECT src, SUM(w) AS outw FROM e GROUP BY src)",
        "t AS (SELECT e.src, e.dst, e.w / o.outw AS p FROM e JOIN outw o USING (src))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, n_iter + 1):
        parts += [
            f"d{i} AS (SELECT COALESCE(SUM(rank), 0.0) AS dm FROM r{i-1}"
            f"         WHERE node NOT IN (SELECT src FROM outw))",
            f"c{i} AS (SELECT t.dst AS node, SUM(r.rank * t.p) AS cm"
            f"         FROM t JOIN r{i-1} r ON r.node = t.src GROUP BY t.dst)",
            f"r{i} AS (SELECT nodes.node,"
            f"         (1.0 - {d}) / nn.n + {d} * (COALESCE(c.cm, 0.0) + d.dm / nn.n) AS rank"
            f"         FROM nodes CROSS JOIN nn CROSS JOIN d{i} d"
            f"         LEFT JOIN c{i} c ON c.node = nodes.node)",
        ]
    # MATERIALIZED: each r{i} is referenced twice (d{i+1}, c{i+1}) — with
    # DuckDB's default CTE inlining the plan tree would grow 2^n_iter
    # copies of the whole upstream chain including the 5-way edge join
    # (the same blowup fixed in engine_ops._kmeans_oracle_parts)
    parts = [p.replace(" AS (", " AS MATERIALIZED (", 1) for p in parts]
    return (
        "WITH " + ",\n".join(parts) + f"\n"
        f"SELECT node AS nation, round(rank, 6) AS rank FROM r{n_iter}\n"
        "ORDER BY rank DESC, nation"
    )


@query("nations_trade_pagerank", oracle=_pagerank_oracle_sql())
def nations_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation->nation trade graph (edges =
    supplier nation -> customer nation, weight = lineitem revenue): which
    nations sit at the center of the trade network. Exercises the
    iterative-graph-algorithm class (operators/graph.pagerank — the
    k-means/CC driver-loop template) with a full differential check: 4
    power iterations unroll into one generated DuckDB query. Edge
    weights aggregate through DECIMAL so both engines hand the iteration
    identical doubles; the per-round sums are 25-term and absorbed by
    round(6)."""
    from micromegas_spark.operators.graph import pagerank

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("src"))
    n2 = n.select(F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("dst"))
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("_sk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("_ck"))
        .groupBy("src", "dst")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC6))
            .cast("double")
            .alias("w")
        )
    )
    ranks = pagerank(edges, weight="w", damping=0.85, n_iter=4)
    return ranks.select(
        F.col("node").alias("nation"), F.round("rank", 6).alias("rank")
    ).orderBy(F.col("rank").desc(), "nation")
