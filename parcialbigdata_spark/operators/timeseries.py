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
