"""Deterministic distributed sampling.

``stratified_sample`` draws an exact k-per-stratum uniform sample,
reproducibly: rows are ranked inside each stratum by a multiplicative
hash of their id (Knuth's 2654435761 mixing constant mod a large
prime — plain integer arithmetic, so any engine recomputes the same
ranks) and the k smallest win. Deterministic sampling is what makes
training-data pipelines auditable: the same corpus snapshot always
yields the same sample, diffs between runs are real data diffs.

Scale design — two-level top-k: a naive per-stratum row_number ranks
everything through one exchange hashed on the (possibly skewed)
stratum alone. Here the first window partitions by (stratum,
spark_partition_id()), so its exchange hashes on a composite key that
spreads each stratum across the cluster (no single hot reducer even
when one stratum is 90% of the table) and keeps only k survivors per
(stratum, input partition); the final per-stratum window then ranks
at most k x n_partitions rows per stratum — a few thousand — instead
of the full fact. The full table still crosses the wire once (a
partitionBy window always inserts a hash exchange), but on the
skew-spreading key, and the stratum-keyed exchange that remains is
bounded. Same partial/final split as Spark's TakeOrderedAndProject,
generalized to grouped sampling. The pre-prune changes no output row
(anything pruned locally loses to k better rows that survived), so
the result is independent of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: multiplicative-hash constants (Knuth 2654435761; 1e9+7 prime)
_MIX = 2654435761
_MOD = 1000000007


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    k: int = 5,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Exact, deterministic k-per-stratum sample: rows ranked by
    ``((id % 1000000007) * 2654435761) % 1000000007`` (ties broken by
    id) inside each stratum; rank <= k survive. Emits stratum,
    ``sample_rank``, the id column and any ``extra_cols`` payload
    columns carried through (so downstream operators — e.g. the
    Theil–Sen pre-sample — get their measure columns without a join
    back to the fact table). ``id_col`` must be integral and
    unique per row for the rank to be a total order. Reducing the key
    mod the prime BEFORE the multiply keeps the product < 2.66e18
    (inside int64) for ANY bigint id — a bare ``id * MIX`` silently
    wraps in non-ANSI Spark around id ~3.5e9 while DuckDB promotes,
    which would break cross-engine rank agreement at scale."""
    extra = list(extra_cols or [])
    h = ((F.col(id_col) % F.lit(_MOD)) * F.lit(_MIX)) % F.lit(_MOD)
    with_h = df.select(
        F.col(stratum_col), F.col(id_col), *[F.col(c) for c in extra],
        h.alias("__h"), F.spark_partition_id().alias("__pid"),
    )
    local = Window.partitionBy(stratum_col, "__pid").orderBy("__h", id_col)
    pruned = (
        with_h.withColumn("__lrn", F.row_number().over(local))
        .filter(F.col("__lrn") <= k)
    )
    global_w = Window.partitionBy(stratum_col).orderBy("__h", id_col)
    return (
        pruned.withColumn("sample_rank", F.row_number().over(global_w))
        .filter(F.col("sample_rank") <= k)
        .select(stratum_col, "sample_rank", id_col, *extra)
    )
