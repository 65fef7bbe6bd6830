"""Data-distribution diagnostics: the profiling operators a 100 TB
pipeline runs BEFORE committing to a partitioning/join strategy.

``key_skew_profile`` quantifies how skewed a prospective shuffle or
join key is — the number every salting/AQE-skew-split decision hangs
on. It reduces the fact table to per-key counts (one map-side-combined
shuffle on the key itself), then collapses those counts to a one-row
profile: key cardinality, row total, heaviest key, count percentiles,
and the max/mean skew ratio. The profile relation is key-grained, so
the second aggregate is dim-sized; nothing here is driver-side.

The skew-JOIN mitigation itself (salting) lives in ``operators/skew.py``
— this module is the measurement side of that decision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key_col: str, rel_name: str) -> DataFrame:
    """One-row skew profile of ``key_col``'s value distribution.

    Columns: ``rel`` (the supplied label), ``n_keys``, ``n_rows``,
    ``max_cnt``, ``p50_cnt``/``p99_cnt`` (linear-interpolation
    percentiles of the per-key counts — Spark ``percentile`` ==
    DuckDB ``quantile_cont``), ``skew_ratio`` (max over mean count,
    the multiplier the heaviest shuffle partition pays vs the
    average), and ``top_key`` (the heaviest key, max-key tie-break,
    cast to string so profiles of differently-typed keys union).

    Two aggregates: per-key counts (the only fact-sized shuffle, with
    map-side combine), then a global roll-up of the key-grained count
    relation; the heavy-hitter lookup is a broadcast join of the
    1-row max back onto the counts."""
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.expr("percentile(cnt, 0.5)"), 6).alias("p50_cnt"),
        F.round(F.expr("percentile(cnt, 0.99)"), 6).alias("p99_cnt"),
    )
    top = (
        counts.join(
            F.broadcast(stats.select("max_cnt")),
            counts.cnt == F.col("max_cnt"),
        )
        .agg(F.max("k").cast("string").alias("top_key"))
    )
    return (
        stats.crossJoin(F.broadcast(top))
        .select(
            F.lit(rel_name).alias("rel"),
            "n_keys",
            "n_rows",
            "max_cnt",
            "p50_cnt",
            "p99_cnt",
            F.round(
                F.col("max_cnt").cast("double")
                * F.col("n_keys").cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("skew_ratio"),
            "top_key",
        )
    )


def table_fingerprint(
    df: DataFrame, cols: list[str], rel_name: str
) -> DataFrame:
    """Order-independent table checksum — the data-reconciliation
    primitive for verifying a replication, migration or engine swap
    without sorting or transferring rows: each row's listed columns
    (integers/strings only — float formatting is not canonical across
    engines) fold into a canonical ``|``-joined string, md5's leading
    8 hex digits become a 32-bit integer, and the per-row integers SUM
    (accumulated as DECIMAL(38) so the running sum cannot wrap — a
    100 TB table's sum of 2^32-sized terms overflows BIGINT around
    2^31 rows — then, for cross-engine emission, cast back to BIGINT:
    the final value fits until ~2^31 rows per table, and at true
    100 TB scale the caller should keep the DECIMAL(38) column
    instead; pandas/Arrow render wide decimals as float64, which is
    why the emitted dtype here is BIGINT). Addition is commutative,
    so partitioning, scan
    order and engine are all irrelevant; two sides agree iff their
    (n_rows, fingerprint) pairs agree (collisions need an ADVERSARIAL
    2^32-bucket imbalance — fine for reconciliation, not for
    integrity against tampering; use a wider slice there). One scan,
    one scalar aggregate, zero shuffles of row data."""
    canon = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("bigint")
    agg = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h.cast("decimal(38,0)")).alias("__fp_dec"),
    )
    # The BIGINT emission is guarded, not silent: under non-ANSI Spark
    # a plain cast of an overflowing DECIMAL(38) yields NULL, and a
    # reconciliation primitive degrading to NULL==NULL comparisons at
    # exactly the scale it targets is worse than failing. try_cast +
    # raise_error turns overflow (~2^31 rows) into a loud run failure
    # telling the caller to keep the DECIMAL(38) column.
    guarded = guarded_bigint(
        F.col("__fp_dec"),
        "table_fingerprint: checksum sum exceeds BIGINT (~2^31 rows) — "
        "emit the DECIMAL(38,0) sum instead of the BIGINT cast at this scale",
    )
    return agg.select(
        F.lit(rel_name).alias("rel"), "n_rows", guarded.alias("fingerprint")
    )


def guarded_bigint(col: Column, msg: str) -> Column:
    """``col`` cast to BIGINT, raising ``msg`` instead of silently
    emitting NULL when a non-NULL value does not fit (non-ANSI Spark's
    plain cast returns NULL on overflow; ANSI mode would throw a
    generic CAST_OVERFLOW without the operator-specific remediation).
    NULL input stays NULL — only lossy casts raise."""
    as_big = col.try_cast("bigint")
    return F.when(
        col.isNotNull() & as_big.isNull(),
        F.raise_error(F.lit(msg)).cast("bigint"),
    ).otherwise(as_big)


def join_size_estimate(
    a: DataFrame, key_a: str, b: DataFrame, key_b: str, join_name: str
) -> DataFrame:
    """EXACT equi-join output cardinality WITHOUT running the join:
    ``|A ⋈ B| = Σ_k cnt_A(k) · cnt_B(k)`` over the per-key count
    relations — the planner-grade question ("will this self-join blow
    up?") answered with two map-side-combined count aggregations and
    one key-grained join, instead of materializing a possibly
    quadratic result. NULL keys are excluded (SQL equi-joins never
    match them). The oracle VERIFIES the identity by actually
    performing the join and counting — so the gate proves the
    estimator exact, which is precisely why it's safe to size a
    100 TB shuffle with it."""
    ca = (
        a.filter(F.col(key_a).isNotNull())
        .groupBy(F.col(key_a).alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt_a"))
    )
    cb = (
        b.filter(F.col(key_b).isNotNull())
        .groupBy(F.col(key_b).alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt_b"))
    )
    return (
        ca.join(cb, "k")
        .agg(
            F.coalesce(F.sum(F.col("cnt_a") * F.col("cnt_b")), F.lit(0))
            .cast("bigint")
            .alias("est_pairs")
        )
        .select(F.lit(join_name).alias("join_name"), "est_pairs")
    )


def hashed_bigram_logit_udf():
    """Arrow-batched hashed-bigram logit — the scoring kernel of the
    calibration/quality pair, moved out of the interpreted ``aggregate``
    HOF (r10): evaluating md5+conv+mod inside a higher-order-function
    lambda runs interpreted per ELEMENT (the r9 bloom lesson), and the
    sf10 datapoint showed the scoring pass crossing linear
    (115 s at 100×, 13.8× for the last 10×). Here each Arrow batch
    loops its bigrams once in Python with C md5 — ~180M digests at
    sf10 spread over the worker pool — while tokenization stays
    Spark-side (the Java-regex tokens are the cross-engine-verified
    contract; Python ``re`` unicode classes are not). Weight formula
    is bit-for-bit the oracle's:
    ``((md5_hex4 % 64) * 37 + 11) % 201 − 100`` summed as exact ints.

    Returns a pandas UDF mapping ``array<string>`` token arrays to
    the BIGINT logit sum over adjacent-pair bigrams."""
    import hashlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NOTE: no type hints — this module uses postponed annotations and
    # pandas is function-local, so get_type_hints() could not resolve
    # the stringified 'pd.Series' (UNSUPPORTED_SIGNATURE); the explicit
    # returnType + hint-less function selects the scalar path directly.
    @pandas_udf("bigint")
    def logit(toks):
        out = []
        for arr in toks:
            s = 0
            if arr is not None and len(arr) >= 2:
                prev = arr[0]
                for cur in arr[1:]:
                    h = int(
                        hashlib.md5(f"{prev}_{cur}".encode()).hexdigest()[:4],
                        16,
                    )
                    s += ((h % 64) * 37 + 11) % 201 - 100
                    prev = cur
            out.append(s)
        return pd.Series(out, dtype="int64")

    return logit


def reliability_bins(
    df: DataFrame,
    conf_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram / calibration audit for a scored relation
    (Murphy & Winkler 1977; the binned-ECE formulation of Naeini et
    al., AAAI'15; Guo et al., ICML'17 popularized it for neural
    classifiers): bucket rows by predicted confidence into ``n_bins``
    equi-width bins over [0, 1] and compare, per bin, the MEAN
    PREDICTED confidence against the OBSERVED positive rate. A quality
    filter that says "0.9" for documents that are good 60% of the time
    is miscalibrated even when its ranking is perfect — and every
    downstream threshold choice (what survives into the training mix)
    silently inherits that bias; this audit is how the threshold gets
    chosen on evidence. Completes the model-ops family:
    ``drift_psi_orders`` watches the INPUT distribution move,
    ``ab_lift_events`` compares interventions, this watches the
    MODEL's probability semantics.

    Determinism discipline (the cross-engine value-hash rules): the
    bin id is integer ``floor(conf·n_bins)`` clamped to the top bin;
    confidences are summed as rounded DECIMALs (order-independent),
    divided by exact counts ONCE at the end; the observed rate is a
    ratio of exact integers; ``abs_gap`` subtracts the two
    already-rounded doubles. Scale: one map-side-combined hash
    aggregation to ≤ ``n_bins`` rows — runs inline on the scoring
    pass's output at any volume; nothing driver-side.

    Returns (bin, n_rows, avg_conf, pos_rate, abs_gap), bin ascending
    by value; ECE = Σ n_rows·abs_gap / Σ n_rows is one more
    aggregation away and deliberately left to the caller (the per-bin
    relation is the operational artifact — it shows WHERE the model
    lies, not just how much)."""
    conf = F.col(conf_col)
    bin_id = F.least(
        F.floor(conf * n_bins).cast("int"), F.lit(n_bins - 1)
    ).alias("bin")
    agg = (
        df.select(
            bin_id,
            F.round(conf, 9).cast("decimal(18,9)").alias("__c"),
            F.col(label_col).cast("int").alias("__y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__c").alias("__sum_c"),
            F.sum("__y").alias("__n_pos"),
        )
    )
    avg_conf = F.round(F.col("__sum_c").cast("double") / F.col("n_rows"), 6)
    pos_rate = F.round(F.col("__n_pos").cast("double") / F.col("n_rows"), 6)
    return agg.select(
        "bin",
        "n_rows",
        avg_conf.alias("avg_conf"),
        pos_rate.alias("pos_rate"),
        F.round(F.abs(avg_conf - pos_rate), 6).alias("abs_gap"),
    )
