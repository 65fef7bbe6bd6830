"""Distributed prefix aggregation (global running sums without a
single-reducer window).

``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY forces Spark to plan
``Exchange SinglePartition`` — every row of the table funnels through
ONE task, the classic 100 TB cliff (the per-customer windows elsewhere
in this repo are fine because they partition; this module is for the
genuinely GLOBAL scan: ECDFs, global ranks, cumulative totals).

Two-phase scan (Blelloch 1990, the textbook parallel prefix-sum,
re-expressed in DataFrame ops):

1. **Local pass** — ``repartitionByRange`` on the order key gives
   range-partitioned data; a window partitioned by
   ``spark_partition_id()`` computes per-partition running sums. The
   window's hash exchange on the partition id moves each range bucket
   as a unit — P parallel tasks, no single reducer.
2. **Offset pass** — per-partition totals form a ≤P-row relation
   (bounded by the cluster's partition count, NOT by data volume); an
   exclusive prefix sum over it — the only single-partition window, on
   P rows — yields each partition's starting offset, broadcast-joined
   back. ``global running sum = local running sum + offset``.

The input is persisted before branching so both passes observe the
SAME ``spark_partition_id()`` assignment (range boundaries come from a
sample; re-execution could legally re-draw them).

Result is partition-invariant: offsets add exactly what an
unpartitioned scan would have accumulated, so the oracle can verify
with a plain ``SUM() OVER (ORDER BY ...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def partitioned_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_cols: dict[str, str],
    num_partitions: int = 32,
) -> DataFrame:
    """Global running sums of each ``value_cols`` key (aliased to its
    value) in ``order_cols`` order, two-phase — no single-partition
    window over the data. ``order_cols`` must be a total order (add a
    tie-break column if not); output keeps all input columns and
    appends the cumulative ones."""
    ranged = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged
    for src, out in value_cols.items():
        local = local.withColumn(out, F.sum(src).over(w_local))

    totals = ranged.groupBy("__pid").agg(
        *[F.sum(src).alias(f"__tot_{out}") for src, out in value_cols.items()]
    )
    # Exclusive prefix over ≤num_partitions rows: the one
    # single-partition window, on a cluster-sized (not data-sized)
    # relation.
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "__pid",
        *[
            F.coalesce(F.sum(f"__tot_{out}").over(w_off), F.lit(0)).alias(f"__off_{out}")
            for out in value_cols.values()
        ],
    )
    out_df = local.join(F.broadcast(offs), "__pid")
    for out in value_cols.values():
        out_df = out_df.withColumn(out, F.col(out) + F.col(f"__off_{out}"))
    return out_df.drop("__pid", *[f"__off_{out}" for out in value_cols.values()])


def ks_two_sample(
    df: DataFrame, value_col: str, group_col: str, group_a: str, group_b: str
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic, distributed.

    D = sup_x |F_a(x) − F_b(x)| over the two groups' empirical CDFs.
    The sup is attained at a sample point, so it suffices to evaluate
    both ECDFs at every DISTINCT value: one hash aggregation collapses
    the table to (value, cnt_a, cnt_b), :func:`partitioned_cumsum`
    turns counts into running counts WITHOUT a single-reducer window,
    and the gap is ranked exactly in integer arithmetic —
    ``|c_a·n_b − c_b·n_a|`` as DECIMAL(38,0) (no float ECDF
    subtraction, so ties rank identically on any engine; the single
    division happens once, on the winning row). Returns one row:
    ``(n_a, n_b, at_value, ks_d)`` with the sup location tie-broken to
    the smallest value.

    Nonparametric sibling of ``ab_lift_events`` (parametric Welch t on
    means) and ``drift_psi_orders`` (binned proportion drift): KS is
    exact, binning-free, and sensitive to ANY distribution difference,
    not just the mean — the standard gate for "did this feature drift"
    before retraining.
    """
    tagged = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(value_col).alias("v"),
        F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("ia"),
        F.when(F.col(group_col) == group_b, 1).otherwise(0).alias("ib"),
    )
    per_value = tagged.groupBy("v").agg(
        F.sum("ia").alias("ca"), F.sum("ib").alias("cb")
    )
    cum = partitioned_cumsum(per_value, ["v"], {"ca": "cum_a", "cb": "cum_b"})
    totals = tagged.agg(
        F.sum("ia").cast("bigint").alias("n_a"), F.sum("ib").cast("bigint").alias("n_b")
    )
    gap = cum.crossJoin(F.broadcast(totals)).withColumn(
        "num",
        F.abs(
            F.col("cum_a").cast("decimal(38,0)") * F.col("n_b")
            - F.col("cum_b").cast("decimal(38,0)") * F.col("n_a")
        ),
    )
    top = gap.orderBy(F.desc("num"), F.asc("v")).limit(1)
    return top.select(
        "n_a",
        "n_b",
        F.col("v").alias("at_value"),
        F.round(
            F.col("num").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            6,
        ).alias("ks_d"),
    )
