"""TPC-H query-shape sweep over the fixture star schema.

The fixture tables (TESTDATA.md) are a TPC-H subset — no partsupp,
no comment/phone/commitdate columns — so each query here keeps the
*plan shape* of its TPC-H namesake (the part Catalyst has to get
right: correlated EXISTS/NOT-EXISTS decorrelation, conditional
aggregation, LIKE pushdown, HAVING over a scalar subquery,
equal-to-max selection, nested IN, OR-of-ANDs pushdown) while
substituting available columns.

Registered into the same driver-contract registry as
``parcialbigdata_spark.queries`` (which imports this module at the
bottom of its own definition).

Scale notes (100 TB design): every query is a declarative DataFrame
plan — joins shuffle on their keys, fixed-size dims (nation/region)
are broadcast by hint, linearly-growing tables (customer, supplier,
part, orders, lineitem) are left to AQE's size-based broadcast
choice. Correlated subqueries are written as semi/anti joins or
aggregate-then-join so Catalyst never falls back to a per-row
subplan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcialbigdata_spark.queries import _REV_SQL, _dec, _rev, query
from parcialbigdata_spark.sources.tables import load_table


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------
# Q4 — correlated EXISTS → left-semi join with a non-equi conjunct
# ---------------------------------------------------------------------


@query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      AND o_orderdate <  TIMESTAMP '1999-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS as a left-semi join (equi key + non-equi
    conjunct stays in the join condition, so it is still a single
    shuffled semi join, not a nested-loop)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1999-01-01")) & (F.col("o_orderdate") < _ts("1999-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------
# Q7 — two-nation volume shipping (join-graph with symmetric OR filter)
# ---------------------------------------------------------------------


@query(
    "q7_nation_volume",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS yr,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '2000-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: 6-table join with a symmetric OR predicate over the
    two nation roles. Both nation joins are broadcast (fixed-size dim,
    25 rows at any SF); the OR filter evaluates after them, JVM-side."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1998-01-01")) & (F.col("l_shipdate") < _ts("2000-01-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------
# Q8 — market share (conditional aggregation ratio per group)
# ---------------------------------------------------------------------


@query(
    "q8_market_share",
    f"""
    SELECT yr,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS yr, {_REV_SQL} AS volume, n1.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n2.n_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1999-01-01'
    ) t
    GROUP BY yr
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional revenue per year —
    conditional SUM over the same decimal measure, single final agg.
    The ratio divides two doubles derived from exact decimal sums, so
    it is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01")) & (F.col("o_orderdate") < _ts("1999-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_regionkey")))
    zero = F.lit(0).cast("decimal(18,4)")
    vol = F.col("volume")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_regionkey") == region.r_regionkey)
        .select(F.year("o_orderdate").alias("yr"), _rev().alias("volume"), "supp_nation")
        .groupBy("yr")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------
# Q9 — profit by nation and year (LIKE filter on part name)
# ---------------------------------------------------------------------


@query(
    "q9_profit_by_nation_year",
    f"""
    SELECT n_name AS nation, year(o_orderdate) AS yr,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: LIKE '%red%' (contains) on the part dim, then a
    4-way join rolled up by supplier nation × order year. The contains
    filter can't use stats but still prunes part before the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(F.sum(_rev()).cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------
# Q10 — returned-item reporting (top 20 by revenue)
# ---------------------------------------------------------------------


@query(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS acctbal,
           n_name
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      AND o_orderdate <  TIMESTAMP '1999-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-lineitem revenue per customer over a
    half-year window, top 20 (TakeOrderedAndProject after one agg
    shuffle). acctbal is re-aggregated (avg of a group-constant) so the
    group-by key list stays minimal — same trick as the spec query."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1999-01-01")) & (F.col("o_orderdate") < _ts("1999-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("acctbal"),
        )
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------
# Q11 — important suppliers (HAVING over a scalar subquery)
# ---------------------------------------------------------------------


@query(
    "q11_important_suppliers",
    f"""
    SELECT l_suppkey, CAST(SUM({_REV_SQL}) AS DOUBLE) AS value
    FROM lineitem
    GROUP BY l_suppkey
    HAVING SUM({_REV_SQL}) > (
        SELECT SUM({_REV_SQL}) * CAST(0.0105 AS DECIMAL(6,4)) FROM lineitem
    )
    """,
)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups whose share exceeds a fraction of the
    global total. The scalar total is a 1-row broadcast cross-join, so
    the fact table is scanned twice but shuffled once per agg — the
    scale-correct plan (no per-group correlated subquery)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("value_dec"))
    total = li.agg((F.sum(_rev()) * F.lit(0.0105).cast("decimal(6,4)")).alias("threshold"))
    return (
        per_supp.join(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("threshold"))
        .select("l_suppkey", F.col("value_dec").cast("double").alias("value"))
    )


# ---------------------------------------------------------------------
# Q12 — priority class counts per line status (conditional counts)
# ---------------------------------------------------------------------


@query(
    "q12_priority_by_linestatus",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_shipdate < TIMESTAMP '2000-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → linestatus): integer conditional
    counts — pure codegen CASE WHEN inside a partial+final agg."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1999-01-01")) & (F.col("l_shipdate") < _ts("2000-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join → double agg)
# ---------------------------------------------------------------------


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON o_custkey = c_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) t
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: left outer join with an extra join-side predicate,
    then a two-level aggregation (per-customer count → histogram of
    counts). COUNT(col) ignores the NULLs the outer join introduces."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------
# Q14 — promo revenue percentage (LIKE + conditional ratio, one row)
# ---------------------------------------------------------------------


@query(
    "q14_promo_revenue",
    f"""
    SELECT CAST(100 AS DOUBLE)
           * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1999-06-01' AND l_shipdate < TIMESTAMP '1999-07-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one-month revenue from promo parts. Scalar
    result; part join is AQE's choice (broadcastable at small SF,
    shuffled when part is fact-sized)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1999-06-01")) & (F.col("l_shipdate") < _ts("1999-07-01"))
    )
    part = load_table(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100).cast("double")
                * F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)).cast("double")
                / F.sum(_rev()).cast("double")
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------
# Q15 — top supplier (equal-to-max over an aggregated view)
# ---------------------------------------------------------------------


@query(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_shipdate < TIMESTAMP '1999-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the max quarterly revenue.
    Exact decimal comparison against the max (no double ties); the
    1-row max is broadcast. Window-free form keeps the agg reusable."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1999-01-01")) & (F.col("l_shipdate") < _ts("1999-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


# ---------------------------------------------------------------------
# Q16 — supplier count by part attrs (NOT IN subquery + count-distinct)
# ---------------------------------------------------------------------


@query(
    "q16_supplier_cnt",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 9, 19, 29, 39, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct-supplier counts per part attribute bucket,
    excluding a supplier blocklist. NOT IN over a non-nullable key is
    a left-anti join (no null-aware penalty); count-distinct expands
    to a two-phase agg."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 9, 19, 29, 39, 49))
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------
# Q18 — large-volume orders (IN over a grouped HAVING)
# ---------------------------------------------------------------------


@query(
    "q18_large_volume_orders",
    """
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > CAST(270 AS DECIMAL(18,4))
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN over a grouped-HAVING subquery → aggregate once,
    semi-join the keys back, aggregate again with the customer dim.
    The HAVING agg reuses the same shuffle key (l_orderkey) as the
    final join, so AQE coalesces into one exchange chain."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > F.lit(270).cast("decimal(18,4)"))
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_orderkey"),
                li.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# ---------------------------------------------------------------------
# Q19 — bracketed OR-of-ANDs (disjunctive pushdown)
# ---------------------------------------------------------------------


@query(
    "q19_bracket_revenue",
    f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three AND-brackets OR'd together across both join
    sides. Catalyst extracts the common single-side conjuncts
    (p_brand/p_size bracket union, l_quantity bracket union) and pushes
    them below the join; the full disjunction filters after."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    b1 = (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (q >= 1) & (q <= 20)
    b2 = (F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (q >= 10) & (q <= 30)
    b3 = (F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & (q >= 20) & (q <= 40)
    return joined.filter(b1 | b2 | b3).agg(F.sum(_rev()).cast("double").alias("revenue"))


# ---------------------------------------------------------------------
# Q20 — suppliers of high-volume red parts (nested IN subqueries)
# ---------------------------------------------------------------------


@query(
    "q20_red_part_suppliers",
    """
    SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND l_shipdate >= TIMESTAMP '1999-01-01' AND l_shipdate < TIMESTAMP '2000-01-01'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > CAST(100 AS DECIMAL(18,4))
    )
    """,
)
def q20_red_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries → two chained semi joins
    (part filter prunes lineitem before the per-supplier HAVING agg)."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1999-01-01")) & (F.col("l_shipdate") < _ts("2000-01-01"))
    )
    red_parts = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("red")).select(
        "p_partkey"
    )
    qualifying = (
        li.join(red_parts, li.l_partkey == red_parts.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > F.lit(100).cast("decimal(18,4)"))
        .select("l_suppkey")
    )
    return supp.join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name", F.col("s_acctbal").cast("double").alias("acctbal")
    )


# ---------------------------------------------------------------------
# Q21 — suppliers with sole-supplier multi-line orders (semi+anti pair)
# ---------------------------------------------------------------------


@query(
    "q21_sole_supplier_orders",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
)
def q21_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (no receipt/commit dates in the fixture): count
    finished-order lineitems whose order has no OTHER supplier — a
    correlated EXISTS + NOT EXISTS pair with a non-equi conjunct,
    planned as semi + anti joins on the same shuffle key."""
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey")
    l2 = li.select(F.col("l_orderkey").alias("l2_orderkey"))
    l3 = li.select(F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey"))
    return (
        l1.join(l2, l1.l_orderkey == l2.l2_orderkey, "left_semi")
        .join(
            l3,
            (l1.l_orderkey == l3.l3_orderkey) & (l1.l_suppkey != l3.l3_suppkey),
            "left_anti",
        )
        .join(orders, l1.l_orderkey == orders.o_orderkey)
        .join(supp, l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------
# Q22 — idle customers (NOT EXISTS + scalar-avg filter + substring key)
# ---------------------------------------------------------------------


@query(
    "q22_idle_customers",
    """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM (
        SELECT substring(c_name, 16, 1) AS cntrycode, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                                  / COUNT(*)
                           FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2001-01-01')
    ) t
    GROUP BY cntrycode
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (phone prefix → customer-number digit):
    above-average-balance customers with no RECENT orders (every
    fixture customer has some order, so "idle" is time-scoped),
    grouped by a substring key. Scalar avg is a broadcast 1-row join;
    NOT EXISTS is a left-anti join. The avg uses decimal-sum→double ÷
    count so both engines compare against the identical double."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2001-01-01")
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal"))
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(F.substring("c_name", 16, 1).alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------
# Q2 — min-cost supplier per part (correlated-min / argmin per group)
# ---------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    f"""
    WITH cost AS (
        SELECT l_partkey, l_suppkey, SUM({_REV_SQL}) AS total_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, p_name, l_suppkey AS s_suppkey,
           CAST(total_cost AS DOUBLE) AS cost
    FROM cost
    JOIN part ON p_partkey = l_partkey
    WHERE p_size <= 5
      AND total_cost = (SELECT MIN(c2.total_cost) FROM cost c2
                        WHERE c2.l_partkey = cost.l_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp in the fixture, so supply cost is
    the aggregated lineitem spend): per part, the supplier(s) with the
    minimum cost — the correlated-MIN subquery expressed as a MIN
    window over the aggregation's own grouping key, so the argmin
    reuses the agg's shuffle instead of self-joining the aggregate
    (what Catalyst would plan for the correlated form). Exact decimal
    comparison: ties return all minimal suppliers on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    from pyspark.sql import Window

    cost = li.groupBy("l_partkey", "l_suppkey").agg(F.sum(_rev()).alias("total_cost"))
    w = Window.partitionBy("l_partkey")
    return (
        cost.withColumn("min_cost", F.min("total_cost").over(w))
        .filter(F.col("total_cost") == F.col("min_cost"))
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            F.col("l_suppkey").alias("s_suppkey"),
            F.col("total_cost").cast("double").alias("cost"),
        )
    )
