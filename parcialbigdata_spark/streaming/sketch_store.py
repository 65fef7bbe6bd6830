"""Streaming mergeable-sketch maintenance: per-micro-batch HLL
partials appended to a persistent store.

The online complement of the batch ``hll_rollup_users`` query, and the
sketch analog of ``dedup_store.py``: each micro-batch reduces to one
~KB DataSketches HLL partial per key (``hll_sketch_agg``), appended to
a parquet store; a distinct-count query at ANY later time is
``hll_union_agg`` over the store — it never re-touches raw events.
This is how a 100 TB event pipeline serves "distinct users per segment,
any date range" dashboards: the partials are additive, so batch
boundaries, replays and late re-appends only ever ADD sketch state, and
the union is order-insensitive (HLL register-max is commutative and
idempotent), making the at-least-once foreachBatch append contract
harmless — a replayed batch's partial unions to the same registers.

Store growth is one row per (key, batch); compact by periodically
re-unioning per key (the same ``hll_union_agg``) and rewriting — the
merged sketch IS the compacted state, a property exact distinct
counting fundamentally lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hll_partial_applier(
    store_path: str, key_col: str = "event_type", id_col: str = "user_id"
):
    """foreachBatch body: reduce the batch to one HLL partial per key
    and append (key, sketch, batch_id) to the store."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy(key_col)
            .agg(F.hll_sketch_agg(id_col).alias("sk"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(store_path)
        )

    return apply


def stream_hll_to_store(
    stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
    id_col: str = "user_id",
):
    """Wire a streaming DataFrame through :func:`hll_partial_applier`
    with an availableNow trigger; returns the started query."""
    return (
        stream.writeStream.foreachBatch(
            hll_partial_applier(store_path, key_col, id_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def merged_estimates(
    spark: SparkSession, store_path: str, key_col: str = "event_type"
) -> DataFrame:
    """Distinct-count estimates per key from the partial store alone
    (no fact scan): ``hll_union_agg`` + ``hll_sketch_estimate``."""
    store = spark.read.parquet(store_path)
    return store.groupBy(key_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
        F.count(F.lit(1)).alias("n_partials"),
    )


def kll_partial_applier(
    store_path: str, key_col: str = "event_type", val_col: str = "value"
):
    """foreachBatch body: one DataSketches KLL(double) partial per key
    per micro-batch, appended to the store — the QUANTILE twin of
    :func:`hll_partial_applier`. KLL merge is associative (not
    idempotent like HLL's register-max, so a replayed batch counts its
    rows twice — rank estimates degrade gracefully rather than double,
    since quantiles are scale-free in duplicated data; exactly-once
    stores compact by batch_id when that matters)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy(key_col)
            .agg(F.kll_sketch_agg_double(val_col).alias("sk"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(store_path)
        )

    return apply


def stream_kll_to_store(
    stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
    val_col: str = "value",
):
    """availableNow drain of a stream into per-batch KLL partials."""
    return (
        stream.writeStream.foreachBatch(
            kll_partial_applier(store_path, key_col, val_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def merged_quantiles(
    spark: SparkSession,
    store_path: str,
    key_col: str = "event_type",
    ranks: "tuple[float, ...]" = (0.5, 0.95),
) -> DataFrame:
    """Quantile estimates per key from the partial store alone:
    ``kll_sketch_merge_double`` folded over each key's partials (a
    bounded per-key list — one ~KB sketch per batch; compact
    periodically at scale), then ``kll_sketch_get_quantile_double``.

    The fold runs in ``batch_id`` order (collect (batch_id, sk)
    structs, ``array_sort``, then fold): ``collect_list`` order is
    nondeterministic across runs and KLL merge results vary slightly
    with merge order, so an unsorted fold would make est_p50/est_p95
    (and rank checks near the ±ε boundary) non-reproducible."""
    store = spark.read.parquet(store_path)
    merged = store.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct("batch_id", "sk"))
        ).alias("sks"),
        F.count(F.lit(1)).alias("n_partials"),
    )
    msk = F.expr(
        "aggregate(slice(sks, 2, size(sks) - 1), sks[0].sk,"
        " (acc, x) -> kll_sketch_merge_double(acc, x.sk))"
    )
    out = merged.select(key_col, "n_partials", msk.alias("msk"))
    for r in ranks:
        out = out.withColumn(
            f"est_p{int(r * 100)}",
            F.kll_sketch_get_quantile_double(F.col("msk"), F.lit(r)),
        )
    return out.drop("msk")


# ------------------------------------------------- Misra–Gries frequency
#
# Third sketch type in the store, completing distinct (HLL) / quantile
# (KLL) with FREQUENCY: per-batch Misra–Gries heavy-hitter summaries in
# the mergeable-summaries form (Agarwal, Cormode, Huang, Phillips, Wei,
# Yi — PODS'12): a batch's exact per-item counts minus its (k+1)-th
# largest count, positives kept. Counters only ever UNDER-count
# (est ≤ true), merging is counter ADDITION, and the merged summary
# keeps the theorem: any item with true count > N/(k+1) retains a
# counter, and true − est ≤ N/(k+1) with N the key's total row count.
# Unlike HLL/KLL these partials are plain (key, item, cnt) rows — no
# binary sketch column — so compaction is an ordinary groupBy-sum.


def mg_partial_applier(
    store_path: str,
    key_col: str = "event_type",
    item_col: str = "user_id",
    k: int = 50,
):
    """foreachBatch body: reduce the batch to a ≤k-counter Misra–Gries
    summary per key (exact counts − (k+1)-th largest, positives kept)
    and append (key, item, cnt, batch_id) to the store."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        counts = batch_df.groupBy(key_col, item_col).agg(
            F.count(F.lit(1)).alias("__c")
        )
        w_rank = Window.partitionBy(key_col).orderBy(
            F.desc("__c"), F.asc(item_col)
        )
        w_key = Window.partitionBy(key_col)
        d = F.max(
            F.when(F.row_number().over(w_rank) == k + 1, F.col("__c"))
        ).over(w_key)
        (
            counts.withColumn("__d", F.coalesce(d, F.lit(0)))
            .select(
                key_col,
                item_col,
                (F.col("__c") - F.col("__d")).alias("cnt"),
                F.lit(batch_id).alias("batch_id"),
            )
            .filter(F.col("cnt") > 0)
            .write.mode("append")
            .parquet(store_path)
        )

    return apply


def stream_mg_to_store(
    stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
    item_col: str = "user_id",
    k: int = 50,
):
    """availableNow drain of a stream into per-batch MG summaries."""
    return (
        stream.writeStream.foreachBatch(
            mg_partial_applier(store_path, key_col, item_col, k)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def merged_counters(
    spark: SparkSession, store_path: str, key_col: str = "event_type",
    item_col: str = "user_id",
) -> DataFrame:
    """Merged heavy-hitter counters per (key, item) from the store
    alone — counter addition IS the merge (no fold-order issues, the
    sum is commutative), and a periodic compaction is the same
    groupBy-sum rewritten."""
    store = spark.read.parquet(store_path)
    return store.groupBy(key_col, item_col).agg(F.sum("cnt").alias("est"))
