"""Time-series densification operators (SURVEY.md §2 EXT: the
hypertable/rollup family re-expressed Spark-first).

The reference repo's only temporal behavior is the filename-derived
date column (download_lambda.py:67); these operators extend it to the
continuous-aggregate shapes every event pipeline needs: a *dense*
per-key time grid with gap rows materialized and last-observation-
carried-forward (LOCF) fill — the TimescaleDB ``time_bucket_gapfill``
/ ``locf`` pair, built from ``sequence`` + ``explode`` + an
``ignorenulls`` last-value window, no UDF anywhere.

Scale notes: the grid explode is per-key ``sequence(min_bucket,
max_bucket)`` — grid size is (time span ÷ step) × keys, tiny relative
to the event corpus that produced the buckets, and generated without
a driver-side loop. The LOCF window shuffles once on the key; the
grid⋈observed join is key+bucket equi-join on the already-aggregated
relation (events were reduced to buckets by the upstream agg), so the
whole densification never touches raw-event volume a second time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_locf(
    buckets: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Densify ``buckets`` (one row per observed (key, bucket)) into a
    complete per-key grid from each key's min to max bucket, stepping
    ``step``; missing buckets appear with ``is_gap = true`` and
    ``value_col`` filled by LOCF (the first bucket of a key is observed
    by construction, so the fill is total).

    Output columns: ``key_col, bucket_col, value_col`` (filled),
    ``is_gap``. Extra columns of ``buckets`` are carried through as
    NULL on gap rows."""
    spans = buckets.groupBy(key_col).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    grid = spans.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"interval {step}"))
        ).alias(bucket_col),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(buckets, [key_col, bucket_col], "left")
        .withColumn("is_gap", F.col(value_col).isNull())
        .withColumn(value_col, F.last(value_col, ignorenulls=True).over(w))
    )


def gap_fill_interp(
    buckets: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    step: str = "1 hour",
    decimals: int = 6,
) -> DataFrame:
    """Densify like :func:`gap_fill_locf` but fill gaps by LINEAR
    INTERPOLATION between the surrounding observed buckets (the
    TimescaleDB ``interpolate`` companion to ``locf``).

    Two ``ignorenulls`` windows over one per-key sort carry the previous
    and next observed (value, epoch) pair to every grid row; the fill is
    ``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)`` in plain
    IEEE double arithmetic, rounded to ``decimals`` — bit-identical on
    any engine given the same observed values.  Grid endpoints are
    observed by construction (per-key min/max), so the fill is total.

    Scale shape: identical to LOCF — grid explode is per-key
    ``sequence`` over the already-aggregated bucket relation, both
    windows share the single (key) shuffle + (bucket) sort, nothing
    re-touches raw event volume.
    """
    spans = buckets.groupBy(key_col).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    grid = spans.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"interval {step}"))
        ).alias(bucket_col),
    )
    joined = (
        grid.join(buckets, [key_col, bucket_col], "left")
        .withColumn("is_gap", F.col(value_col).isNull())
        .withColumn("__es", F.unix_timestamp(bucket_col))
        .withColumn(
            "__obs_es", F.when(~F.col("is_gap"), F.unix_timestamp(bucket_col))
        )
    )
    back = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last(value_col, ignorenulls=True).over(back).cast("double")
    prev_t = F.last("__obs_es", ignorenulls=True).over(back).cast("double")
    next_v = F.first(value_col, ignorenulls=True).over(fwd).cast("double")
    next_t = F.first("__obs_es", ignorenulls=True).over(fwd).cast("double")
    t = F.col("__es").cast("double")
    filled = F.when(~F.col("is_gap"), F.col(value_col).cast("double")).otherwise(
        prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
    )
    return joined.withColumn(
        value_col, F.round(filled, decimals)
    ).drop("__es", "__obs_es")


def theilsen_by_group(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    max_group_rows: int = 20_000,
) -> DataFrame:
    """Grouped Theil–Sen robust regression (Theil 1950; Sen, JASA
    1968): per group, the slope estimate is the MEDIAN of all pairwise
    slopes (y_j − y_i)/(x_j − x_i) over point pairs with distinct x,
    and the intercept is the median of (y_i − slope·x_i). Breakdown
    point ≈ 29% — a third of the points can be arbitrary garbage
    before the estimate moves, where one bad row can swing its
    least-squares sibling ``grouped_ols_lineitem`` without bound.
    Completes the robust-statistics family: ``mad_outliers_orders``
    (location/scale), ``winsorize_orders_by_segment`` (clipping),
    ``ks_2sample_order_values`` (distribution drift), robust TREND
    here.

    Scale contract: exact Theil–Sen is O(n²) PER GROUP by definition
    — the pair join is co-keyed on the group (one shuffle, pairs never
    leave their group's partitions), so total cost is Σ n_g², not
    (Σ n_g)². The ``max_group_rows`` guard refuses groups whose pair
    count would explode (the caller pre-samples — the production
    pattern at 100 TB is deterministic hash-sampling each group to a
    few thousand points, which the registered query demonstrates;
    Matoušek's randomized O(n log n) needs data-dependent iteration
    counts that break the fixed-plan/oracle discipline). Median via
    ``percentile`` (linear interpolation — engine-identical to DuckDB
    ``quantile_cont``); slopes are IEEE doubles built from exact
    integer/decimal inputs, rounded once at the end.

    Returns (group_cols…, slope, intercept, n_pairs, n_points)."""
    cnt = (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    if cnt is not None and cnt > max_group_rows:
        raise ValueError(
            f"theilsen_by_group: largest group has {cnt} rows; pairwise "
            f"slopes are O(n²) per group — pre-sample groups to ≤ "
            f"{max_group_rows} rows (deterministic hash sample) or raise "
            "max_group_rows explicitly."
        )
    pts = df.select(
        *group_cols,
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    cond = None
    for g in group_cols:
        eq = F.col(f"a.{g}").eqNullSafe(F.col(f"b.{g}"))
        cond = eq if cond is None else (cond & eq)
    pairs = a.join(b, cond & (F.col("a.__x") < F.col("b.__x"))).select(
        *[F.col(f"a.{g}").alias(g) for g in group_cols],
        (
            (F.col("b.__y") - F.col("a.__y")) / (F.col("b.__x") - F.col("a.__x"))
        ).alias("__slope"),
    )
    slopes = pairs.groupBy(*group_cols).agg(
        F.expr("percentile(__slope, 0.5)").alias("__m"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    # Intercept pass: broadcast the group-grained slopes back onto the
    # points (dim-sized by construction — one row per group).
    resid = pts.join(F.broadcast(slopes), group_cols).select(
        *group_cols,
        (F.col("__y") - F.col("__m") * F.col("__x")).alias("__r"),
        "__m",
        "n_pairs",
    )
    return resid.groupBy(*group_cols).agg(
        F.round(F.first("__m"), 6).alias("slope"),
        F.round(F.expr("percentile(__r, 0.5)"), 6).alias("intercept"),
        F.first("n_pairs").alias("n_pairs"),
        F.count(F.lit(1)).alias("n_points"),
    )
