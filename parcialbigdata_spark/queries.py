"""Named query registry: Spark implementation + DuckDB oracle per operator.

This is the driver-contract surface (``__spark_entry__.py`` re-exports
it). Every SURVEY.md §2 operator family has at least one named query
over the fixture tables; each oracle is ANSI-ish SQL DuckDB runs on the
same parquet.

Cross-engine determinism rules (so value hashes match bit-for-bit):

- Double SUM/AVG is order-dependent → all money/metric sums go through
  exact DECIMAL arithmetic and only the final result is CAST to DOUBLE.
- Ratios are computed as decimal-sum→double ÷ count (IEEE division of
  identical operands is deterministic).
- Timestamps are emitted as formatted strings or epoch-second bigints —
  never raw timestamp columns (unit/tz representation differs).
- Every ranking has a total-order tie-break; every computed column is
  aliased identically on both sides.
- Floating expressions that fold arrays (norms, cosines) fold in array
  order on both engines and round to 6 decimals at the end.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcialbigdata_spark.functions import text as T
from parcialbigdata_spark.functions import vectors as V
from parcialbigdata_spark.operators import dedup, joins, similarity
from parcialbigdata_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _dec(col: str | F.Column, prec: int = 18, scale: int = 4) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def _rev() -> F.Column:
    """Exact decimal revenue: l_extendedprice * (1 - l_discount)."""
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"


# =====================================================================
# A. Relational core — aggregations (SURVEY.md §2.4)
# =====================================================================


@query(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_REV_SQL}) AS DOUBLE)                             AS sum_disc_price,
           CAST(SUM({_REV_SQL} * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)      AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: full-scan partial+final hash aggregation.
    Plan check: filter pushed to parquet scan, map-side partial agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_rev()).cast("double").alias("sum_disc_price"),
            F.sum(_rev() * (F.lit(1).cast("decimal(18,4)") + _dec("l_tax")))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1999-01-01'
      AND l_shipdate  > TIMESTAMP '1999-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k.
    customer grows linearly with SF, so no forced broadcast — AQE /
    autoBroadcastJoinThreshold picks broadcast only while it fits;
    top-k is TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q5_region_revenue",
    f"""
    SELECT r_name, n_name, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '2000-01-01'
    GROUP BY r_name, n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join, date filter pushed down, single
    shuffle for the final agg. Only the fixed-size dims (region/nation)
    are broadcast by hint; customer is fact-sized at scale and left to
    AQE's size-based choice."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "top_customers_revenue",
    f"""
    SELECT c_custkey, c_name, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON o_custkey = c_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 10
    """,
)
def top_customers_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


# =====================================================================
# B. Join variants (SURVEY.md §2.3)
# =====================================================================


@query(
    "semi_customers_with_orders",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_mktsegment
    """,
)
def semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "anti_customers_without_orders",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    GROUP BY c_mktsegment
    """,
)
def anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


_BANDS = [
    ("low", 0.0, 50_000.0),
    ("mid", 50_000.0, 150_000.0),
    ("high", 150_000.0, 300_000.0),
    ("premium", 300_000.0, 1e12),
]


@query(
    "range_join_price_bands",
    f"""
    SELECT band_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders
    JOIN (VALUES {", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)})
         AS bands(band_name, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band_name
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join; the band table is tiny → explicit broadcast
    (BroadcastNestedLoopJoin is the right physical plan here)."""
    orders = load_table(spark, sf_dir, "orders")
    spark_bands = spark.createDataFrame(_BANDS, ["band_name", "lo", "hi"])
    joined = joins.range_join(
        orders,
        spark_bands,
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        broadcast_right=True,
    )
    return joined.groupBy("band_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total"),
    )


@query(
    "asof_latest_order_before_event",
    """
    WITH r AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey,
             CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS o_totalprice
      FROM orders GROUP BY o_custkey, o_orderdate
    ), j AS (
      SELECT e.event_id, e.user_id, r.o_orderkey, r.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY r.o_orderdate DESC, r.o_orderkey DESC) AS rn
      FROM events e LEFT JOIN r ON r.o_custkey = e.user_id AND r.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, o_orderkey, o_totalprice FROM j WHERE rn = 1
    """,
)
def asof_latest_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): each event picks the latest order at or
    before its timestamp for the same user/customer key. Exercises the
    union+LOCF as-of operator (operators/joins.py) — one shuffle, no
    range-join blowup."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max(_dec("o_totalprice")).cast("double").alias("o_totalprice"),
        )
    )
    out = joins.as_of_join(
        events.withColumnRenamed("user_id", "__uid"),
        orders.withColumnRenamed("o_custkey", "__uid"),
        on="__uid",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderkey", "o_totalprice"],
    )
    return out.select(
        "event_id", F.col("__uid").alias("user_id"), "o_orderkey", "o_totalprice"
    )


# =====================================================================
# C. Window functions (SURVEY.md §2.5)
# =====================================================================


@query(
    "window_top_orders_per_customer",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER w AS rn,
             LAG(o_totalprice) OVER w AS prev_totalprice
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    ) WHERE rn <= 3
    """,
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.lag("o_totalprice").over(w).alias("prev_totalprice"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
    FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


# =====================================================================
# D. Rollup / cube / distinct / percentiles (SURVEY.md §2.4)
# =====================================================================


@query(
    "rollup_revenue_region_nation",
    """
    SELECT r_name, n_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_revenue_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "cube_order_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "distinct_nations_per_segment",
    """
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def distinct_nations_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query(
    "percentile_quantity_by_flag",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


# =====================================================================
# E. Sorts / limits / set ops (SURVEY.md §2.6)
# =====================================================================


@query(
    "topk_parts_by_price",
    """
    SELECT p_partkey, p_name, p_retailprice
    FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 15
    """,
)
def topk_parts_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit → TakeOrderedAndProject: no global sort at scale."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey").asc())
        .limit(15)
    )


@query(
    "setops_customer_segments",
    """
    SELECT c_custkey FROM (
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       UNION
       SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      INTERSECT
      SELECT o_custkey FROM orders
    )
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    """,
)
def setops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    machinery = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    with_orders = orders.select(F.col("o_custkey").alias("c_custkey"))
    negative = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return building.union(machinery).distinct().intersect(with_orders).subtract(negative)


# =====================================================================
# F. JSON / events / sessionization (SURVEY.md §2.7 F4, §2.8)
# =====================================================================


@query(
    "json_event_props",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE) / COUNT(*) AS avg_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def json_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        (F.sum(k).cast("double") / F.count(F.lit(1))).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "events_hourly_agg",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value", 18, 6)).cast("double").alias("total_value"),
        )
    )


@query(
    "sessionization_events",
    """
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS es,
             LAG(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_es
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev_es IS NULL OR es - prev_es > 1800 THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ), numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           MIN(es) AS session_start_epoch,
           MAX(es) AS session_end_epoch,
           MAX(es) - MIN(es) AS duration_sec
    FROM numbered GROUP BY user_id, session_seq
    """,
)
def sessionization_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → flag → running
    sum → group. Two window passes over one shuffle on user_id — the
    classic scalable batch sessionizer (streaming variant:
    streaming/windows.py uses F.session_window)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    es = F.unix_timestamp("ts")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        es.alias("es"),
        F.when(
            F.lag(es).over(w).isNull() | ((es - F.lag(es).over(w)) > 1800), F.lit(1)
        ).otherwise(F.lit(0)).alias("new_session"),
    )
    numbered = flagged.withColumn(
        "session_seq",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("es").alias("session_start_epoch"),
        F.max("es").alias("session_end_epoch"),
        (F.max("es") - F.min("es")).alias("duration_sec"),
    )


@query(
    "event_type_stats",
    """
    SELECT event_type, COUNT(*) AS n,
           MIN(value) AS min_value, MAX(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum(_dec("value", 18, 6)).cast("double").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )
