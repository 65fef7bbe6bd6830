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

from pyspark.sql import DataFrame
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
