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

    Scale contract: exact Theil–Sen is O(n²) PER GROUP by definition.
    The ``max_group_rows`` guard refuses groups whose pair count would
    explode (the caller pre-samples — the production pattern at 100 TB
    is deterministic hash-sampling each group to a few thousand
    points, which the registered query demonstrates; Matoušek's
    randomized O(n log n) needs data-dependent iteration counts that
    break the fixed-plan/oracle discipline).

    Execution (r10): one ``applyInPandas`` kernel per group — the
    documented drop-to-Arrow case. The r9 form materialized the
    C(n,2) pair multiset through a co-keyed self-join and took the
    median with the ``percentile`` UDAF; at 1.1M pairs/group that
    spent ~6 s shuffling and hash-mapping rows a numpy kernel
    produces and selects in ~20 ms — a bounded-group CPU kernel is
    exactly what the built-in operators can't express efficiently.
    Group rows cross as ONE Arrow batch (guard-bounded); slopes are
    IEEE float64 — bit-identical to the SQL doubles of the r9 join —
    and both medians interpolate exactly like DuckDB
    ``quantile_cont``: lo + (hi − lo)·0.5 over the two middle order
    statistics. Kernel memory is 8·C(n,2) bytes per group (plus the
    pair-index temporaries) — size ``max_group_rows`` accordingly.

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
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    pts = df.select(
        *group_cols,
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )
    out_schema = StructType(
        [pts.schema[g] for g in group_cols]
        + [
            StructField("slope", DoubleType()),
            StructField("intercept", DoubleType()),
            StructField("n_pairs", LongType()),
            StructField("n_points", LongType()),
        ]
    )

    def _median_cont(sorted_vals: "np.ndarray") -> float:
        # DuckDB quantile_cont at 0.5, literally: lo + (hi-lo)*0.5
        # over the two middle order statistics (equal when odd).
        m = len(sorted_vals)
        lo = float(sorted_vals[(m - 1) // 2])
        hi = float(sorted_vals[m // 2])
        return lo + (hi - lo) * 0.5

    def _kernel(key: tuple, pdf: "pd.DataFrame") -> "pd.DataFrame":
        x = pdf["__x"].to_numpy(dtype=np.float64)
        y = pdf["__y"].to_numpy(dtype=np.float64)
        n = len(x)
        ia, ib = np.triu_indices(n, 1)
        dx = x[ib] - x[ia]
        nz = dx != 0  # pairs with equal x contribute no slope
        slopes = (y[ib] - y[ia])[nz] / dx[nz]
        if slopes.size == 0:
            return pd.DataFrame(
                columns=[f.name for f in out_schema.fields]
            ).astype(
                {"slope": "f8", "intercept": "f8", "n_pairs": "i8",
                 "n_points": "i8"}
            )
        m = _median_cont(np.sort(slopes, kind="stable"))
        b = _median_cont(np.sort(y - m * x, kind="stable"))
        return pd.DataFrame(
            [[*key, m, b, int(slopes.size), n]],
            columns=[f.name for f in out_schema.fields],
        )

    raw = pts.groupBy(*group_cols).applyInPandas(_kernel, out_schema)
    # Round in Spark, not the kernel: F.round is HALF_UP like DuckDB
    # ROUND; Python's round() is banker's and would straddle exact
    # .5-at-6dp values (slopes here are RATIONAL — integer cents over
    # integer days — so that case is reachable, not measure-zero).
    return raw.select(
        *group_cols,
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
        "n_pairs",
        "n_points",
    )
