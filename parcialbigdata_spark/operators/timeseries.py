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


def cusum_changepoints(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    k_sigma: float = 0.5,
    h_sigma: float = 5.0,
) -> DataFrame:
    """Grouped CUSUM change-point detection (Page, Biometrika 1954):
    per group, standardize each observation against the group's own
    mean/σ, then track Page's one-sided cumulative sums
    S⁺_t = max(0, S⁺_{t−1} + z_t − k) and S⁻_t = min(0, S⁻_{t−1} +
    z_t + k); an alarm fires when either excursion passes ``h_sigma``.
    The recurrences are NOT window folds — but both have closed
    prefix forms: S⁺_t = P_t − min(0, min_{j≤t} P_j) with
    P_t = Σ(z_i − k) (and dually for S⁻), so the whole detector is
    ONE ordered window computing a running sum and a running min/max
    — two passes over one sort, no recursion, no UDF. Completes the
    monitoring family: ``rolling_zscore_orders`` (point anomalies),
    ``drift_psi_orders``/``ks_2sample_order_values`` (distribution
    shift), LEVEL-shift localization here.

    Determinism contract: ``value_col`` must be EXACT integers
    (counts, cents) — μ/σ come from exact BIGINT moments, and z is
    quantized to INTEGER MICRO-SIGMA units (round(z·10⁶) as BIGINT)
    before the running sums, so every window accumulation is exact
    BIGINT arithmetic on both engines. NOT DECIMAL: DuckDB's windowed
    SUM over DECIMAL accumulates in double (measured drift at the
    13th digit, r10), the same trap as the cookbook's decimal-window
    rule — integer units are the portable exact form. ``k_sigma``/
    ``h_sigma`` are quantized the same way. Scale: one shuffle to the
    group key; the series is an already-aggregated time grid (days ×
    groups), orders of magnitude below fact volume.

    Returns (group_cols…, order_col, value, z, s_pos, s_neg, alarm)."""
    g = [F.col(c) for c in group_cols]
    stats = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(value_col)).alias("__s"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("__sq"),
    )
    mu = F.col("__s").cast("double") / F.col("__n")
    var = (
        F.col("__sq").cast("double")
        - F.col("__s").cast("double") * F.col("__s").cast("double") / F.col("__n")
    ) / F.col("__n")
    zi = F.round(
        (F.col(value_col).cast("double") - mu) / F.sqrt(var) * F.lit(1000000.0),
        0,
    ).cast("bigint")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ki = int(round(k_sigma * 1_000_000))
    hi = int(round(h_sigma * 1_000_000))
    base = (
        df.join(stats, group_cols)
        .filter(var > 0)  # constant series has no standardized scale
        .withColumn("__zi", zi)
        .withColumn("__pp", F.sum(F.col("__zi") - F.lit(ki)).over(w))
        .withColumn("__pn", F.sum(F.col("__zi") + F.lit(ki)).over(w))
    )
    s_pos = F.col("__pp") - F.least(F.lit(0).cast("bigint"), F.min("__pp").over(w))
    s_neg = F.col("__pn") - F.greatest(F.lit(0).cast("bigint"), F.max("__pn").over(w))
    out = base.select(
        *g,
        F.col(order_col),
        F.col(value_col).alias("value"),
        (F.col("__zi").cast("double") / 1e6).alias("z"),
        s_pos.alias("__spi"),
        s_neg.alias("__sni"),
    )
    return out.select(
        *g,
        F.col(order_col),
        "value",
        "z",
        (F.col("__spi").cast("double") / 1e6).alias("s_pos"),
        (F.col("__sni").cast("double") / 1e6).alias("s_neg"),
        ((F.col("__spi") > F.lit(hi)) | (F.col("__sni") < F.lit(-hi))).alias(
            "alarm"
        ),
    )


def seasonal_decompose(
    df: DataFrame,
    group_cols: list[str],
    date_col: str,
    cents_col: str,
    period: int = 7,
) -> DataFrame:
    """Grouped additive seasonal decomposition (classical
    moving-average method; Cleveland's STL is its loess refinement):
    value = trend + seasonal + residual, with the trend a CENTERED
    ``period``-point moving average (odd period; edge rows without a
    full window carry NULL trend and drop from the seasonal FIT — but
    never from the output), the seasonal component the per-phase mean
    of the detrended series re-centered to sum to zero, and the
    residual what remains. Phase is position-in-cycle (row_number mod
    period within the ordered group) so the operator needs no calendar
    semantics.

    Row contract (r11, ADVICE): every input row appears in the output
    exactly once. The phase-profile join is a LEFT join — a phase that
    only ever occurs on edge rows (groups shorter than ~2×period) has
    no fitted mean and surfaces with NULL seasonal/resid; the r10
    inner join silently dropped such rows, contradicting the
    documented NULL-edge contract for short groups.

    Determinism: input is exact integer cents; the MA is an exact
    BIGINT window sum divided by the literal period once (IEEE),
    detrended values round to 6dp before the per-phase DECIMAL mean
    (round-then-decimal-sum), and every output rounds once at the
    end. Plan: one sort per group serves the MA window and the phase
    numbering; the phase means are a ``period × groups``-row agg
    broadcast back. The series is an aggregated grid (days × groups)
    — fact volume never enters the windows.

    Returns (group_cols…, date_col, value, trend, seasonal, resid)."""
    half = period // 2
    ord_w = Window.partitionBy(*group_cols).orderBy(date_col)
    ma_w = ord_w.rowsBetween(-half, half)
    n_w = F.count(F.lit(1)).over(ma_w)
    trend = (
        F.when(
            n_w == period,
            F.sum(F.col(cents_col)).over(ma_w).cast("double")
            / F.lit(float(period))
            / 100.0,
        )
    )
    base = df.withColumn("__phase", (F.row_number().over(ord_w) - 1) % period)
    base = base.withColumn("__trend", trend).withColumn(
        "__detr",
        F.round(F.col(cents_col).cast("double") / 100.0 - F.col("__trend"), 6),
    )
    ph = (
        base.filter(F.col("__detr").isNotNull())
        .groupBy(*group_cols, "__phase")
        .agg(
            (
                F.sum(F.col("__detr").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("__ph_mean")
        )
    )
    # Re-center phase means to sum to zero per group (the additive
    # identifiability constraint) — a period-sized agg, broadcast back.
    gw = Window.partitionBy(*group_cols)
    ph = ph.withColumn(
        "__season",
        F.round(
            F.col("__ph_mean")
            - F.sum(F.round(F.col("__ph_mean"), 6).cast("decimal(18,6)")).over(gw)
            .cast("double")
            / F.count(F.lit(1)).over(gw),
            6,
        ),
    ).select(*group_cols, "__phase", "__season")
    return (
        base.join(F.broadcast(ph), [*group_cols, "__phase"], "left")
        .select(
            *[F.col(c) for c in group_cols],
            F.col(date_col),
            (F.col(cents_col).cast("double") / 100.0).alias("value"),
            F.round(F.col("__trend"), 6).alias("trend"),
            F.col("__season").alias("seasonal"),
            F.round(
                F.col(cents_col).cast("double") / 100.0
                - F.col("__trend")
                - F.col("__season"),
                6,
            ).alias("resid"),
        )
    )


def acf_by_lag(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Grouped sample autocorrelation function for lags 1..max_lag:
    r_k = Σ_{t>k}(y_t − ȳ)(y_{t−k} − ȳ) / Σ(y_t − ȳ)², ȳ the full
    group mean. Expanded to raw-moment form so everything except the
    final IEEE arithmetic is EXACT integer/decimal sums:
    the numerator is Σ y_t·y_{t−k} − ȳ·(S_a + S_b) + (n−k)·ȳ² with
    S_a = Σ_{t>k} y_t and S_b = Σ_{t≤n−k} y_t, the denominator
    n·Var from the same moments — the closed-form-stats recipe
    (``grouped_ols_lineitem``) applied to a lagged product. One
    ordered window computes all ``max_lag`` lag columns in a single
    sort; ``stack`` unpivots to (lag, y, y_lag) rows and one hash agg
    per (group, lag) finishes — no self-join, no per-lag pass.
    ``value_col`` must be exact integers (cents/counts); products
    accumulate as DECIMAL(38,0).

    Returns (group_cols…, lag, n_pairs, acf)."""
    ow = Window.partitionBy(*group_cols).orderBy(order_col)
    v = F.col(value_col).cast("bigint")
    lagged = df.select(
        *group_cols,
        v.alias("__y"),
        *[F.lag(v, k).over(ow).alias(f"__l{k}") for k in range(1, max_lag + 1)],
    )
    stats = lagged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__y").alias("__s"),
        F.sum(F.col("__y").cast("decimal(19,0)") * F.col("__y")).alias("__sq"),
    )
    stacked = lagged.select(
        *group_cols,
        F.expr(
            "stack(%d, %s) as (lag, y, y_lag)"
            % (
                max_lag,
                ", ".join(f"{k}, __y, __l{k}" for k in range(1, max_lag + 1)),
            )
        ),
    ).filter(F.col("y_lag").isNotNull())
    per_lag = stacked.groupBy(*group_cols, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y_lag")).alias("__sprod"),
        F.sum("y").alias("__sa"),
        F.sum("y_lag").alias("__sb"),
    )
    j = per_lag.join(F.broadcast(stats), group_cols)
    nd = F.col("__n").cast("double")
    mu = F.col("__s").cast("double") / nd
    den = F.col("__sq").cast("double") - nd * mu * mu
    num = (
        F.col("__sprod").cast("double")
        - mu * (F.col("__sa").cast("double") + F.col("__sb").cast("double"))
        + F.col("n_pairs").cast("double") * mu * mu
    )
    return j.select(
        *[F.col(c) for c in group_cols],
        "lag",
        "n_pairs",
        F.round(num / den, 6).alias("acf"),
    )


def isotonic_fit_by_group(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    cents_col: str,
    max_group_rows: int = 100_000,
) -> DataFrame:
    """Grouped ISOTONIC REGRESSION by pool-adjacent-violators (PAVA;
    Barlow–Bartholomew–Bremner–Brunk 1972): per group, the
    monotone-nondecreasing step function minimizing squared error to
    the (x, value) points — the shape-constrained fit behind monotone
    calibration (Zadrozny & Elkan KDD'02: map raw classifier scores
    to probabilities WITHOUT assuming a parametric curve; the
    diagnostic sibling ``diagnostics.reliability_bins`` shows THAT
    scores are miscalibrated, isotonic is the standard repair).

    Execution: ties on x pre-average in Spark (one hash agg), then
    one ``applyInPandas`` PAVA kernel per group — PAVA is a
    SEQUENTIAL stack algorithm (each merge depends on the previous),
    precisely the bounded-group kernel case of its neighbor
    ``theilsen_by_group``. Determinism discipline: values are exact
    integer cents; blocks carry (Σcents, n) and every violator
    comparison is the exact cross-multiplication s₁·n₂ > s₂·n₁ — no
    float enters until the ONE final division per block, so the
    fitted means are identical rationals on any engine. The oracle
    cross-checks via the closed-form minimax characterization
    ŷᵢ = max_{j≤i} min_{k≥i} mean(y[j..k]) — a brute force PAVA
    cannot disagree with unless the pooling logic is wrong.

    Returns (group_cols…, x_col, n_points, fitted) — one row per
    distinct x, fitted nondecreasing in x within each group."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    pre = df.groupBy(*group_cols, x_col).agg(
        F.sum(F.col(cents_col)).alias("__sc"),
        F.count(F.lit(1)).alias("__n"),
    )
    cnt = (
        pre.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    if cnt is not None and cnt > max_group_rows:
        raise ValueError(
            f"isotonic_fit_by_group: largest group has {cnt} distinct x; "
            "the kernel is one Arrow batch per group — pre-sample or raise "
            "max_group_rows explicitly."
        )
    out_schema = StructType(
        [pre.schema[g] for g in group_cols]
        + [
            pre.schema[x_col],
            StructField("n_points", LongType()),
            StructField("fitted", DoubleType()),
        ]
    )

    def _kernel(key: tuple, pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(x_col)
        sc = pdf["__sc"].to_numpy(dtype=object)  # exact Python ints
        n = pdf["__n"].to_numpy(dtype=object)
        # PAVA stack: blocks of (sum, count, width); merge while the
        # new block's mean is BELOW the previous block's mean —
        # compared exactly via cross-multiplication.
        blocks: list[list] = []  # [sum, count, width]
        for s_i, n_i in zip(sc, n):
            cur = [int(s_i), int(n_i), 1]
            while blocks and cur[0] * blocks[-1][1] < blocks[-1][0] * cur[1]:
                prev = blocks.pop()
                cur = [cur[0] + prev[0], cur[1] + prev[1], cur[2] + prev[2]]
            blocks.append(cur)
        fitted = np.empty(len(pdf), dtype=np.float64)
        counts = np.empty(len(pdf), dtype=np.int64)
        pos = 0
        for s_b, n_b, w in blocks:
            fitted[pos : pos + w] = (float(s_b) / n_b) / 100.0
            counts[pos : pos + w] = pdf["__n"].to_numpy()[pos : pos + w]
            pos += w
        out = pd.DataFrame(
            {
                x_col: pdf[x_col].to_numpy(),
                "n_points": counts,
                "fitted": fitted,
            }
        )
        for g, v in zip(group_cols, key):
            out.insert(0, g, v)
        return out[[*group_cols, x_col, "n_points", "fitted"]]

    raw = pre.groupBy(*group_cols).applyInPandas(_kernel, out_schema)
    return raw.select(
        *group_cols, x_col, "n_points", F.round("fitted", 6).alias("fitted")
    )


def theilsen_by_group(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    max_group_rows: int = 8_000,
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
    statistics. Kernel memory (r11, ADVICE): the slope multiset itself
    is 8·C(n,2) bytes per group — irreducible for an exact median —
    but the pair machinery is CHUNKED over row blocks, so the
    temporaries are block-bounded instead of the r10
    ``np.triu_indices`` form whose five pair-length arrays could reach
    ~8 GB inside one Arrow task at the old 20,000-row guard. The
    default guard is now 8,000 (slope array ≈ 256 MB); raise it only
    with executor memory to match.

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
            "max_group_rows explicitly (the default dropped from 20,000 "
            "to 8,000 in r11 for kernel-memory safety — callers with "
            "groups of 8,001-20,000 rows that fit their executors can "
            "restore the old behavior with max_group_rows=20_000)."
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

    def _pairwise_slopes(
        x: "np.ndarray", y: "np.ndarray", block: int = 512
    ) -> "np.ndarray":
        # All C(n,2) slopes, computed block-of-rows at a time so the
        # temporaries stay ≤ block×n instead of C(n,2) (r11 — the
        # triu_indices form allocated five pair-length arrays at once).
        # Same float64 subtract/divide per pair, so the multiset is
        # bit-identical to the one-shot form.
        n = len(x)
        j_idx = np.arange(n)
        chunks = []
        for i0 in range(0, n - 1, block):
            i1 = min(i0 + block, n - 1)
            dx = x[None, i0 + 1:] - x[i0:i1, None]
            dy = y[None, i0 + 1:] - y[i0:i1, None]
            keep = (j_idx[None, i0 + 1:] > j_idx[i0:i1, None]) & (dx != 0)
            chunks.append(dy[keep] / dx[keep])
        if not chunks:
            return np.empty(0, dtype=np.float64)
        return np.concatenate(chunks)

    def _kernel(key: tuple, pdf: "pd.DataFrame") -> "pd.DataFrame":
        x = pdf["__x"].to_numpy(dtype=np.float64)
        y = pdf["__y"].to_numpy(dtype=np.float64)
        n = len(x)
        slopes = _pairwise_slopes(x, y)
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
