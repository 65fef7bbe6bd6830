"""Streaming EXACT-state maintenance: per-micro-batch algebraic
aggregate states appended to a persistent store.

The exact-arithmetic twin of ``sketch_store.py`` and the streaming face
of ``operators/incremental.py``: each micro-batch reduces to one
algebraic state row per key (count, exact integer-cents sum, min, max
— the :func:`~parcialbigdata_spark.operators.incremental.agg_state`
schema plus ``batch_id``), appended to a parquet store; the current
aggregate at ANY later time is one key-grained merge over the store —
raw events are never re-scanned. Unlike the sketches this state is
EXACT, and unlike them a replayed batch WOULD double-count (sum/count
are not idempotent), which is why the applier runs under foreachBatch's
exactly-once batch_id contract and the store keeps ``batch_id`` so a
compactor can dedupe re-appends by (key, batch_id) before merging.

Store growth is one row per (key, batch); compact by merging per key
and rewriting — the merged state IS the compacted state, the same
property the sketch store exploits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parcialbigdata_spark.operators.incremental import agg_state


def agg_state_applier(
    store_path: str, key_col: str = "event_type", val_col: str = "value"
):
    """foreachBatch body: one algebraic state row per key per
    micro-batch, appended to the store."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        (
            agg_state(batch_df, [key_col], val_col)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(store_path)
        )

    return apply


def stream_agg_state_to_store(
    stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
    val_col: str = "value",
):
    """availableNow drain of a stream into per-batch algebraic states."""
    return (
        stream.writeStream.foreachBatch(
            agg_state_applier(store_path, key_col, val_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def merged_state(
    spark: SparkSession, store_path: str, key_col: str = "event_type"
) -> DataFrame:
    """Current per-key aggregate from the partial store alone (no fact
    re-scan): counts and cents-sums add, min/max fold — one dim-sized
    aggregation over the (key × batch)-grained store. Batch order is
    irrelevant: every merge op is commutative and associative, so this
    is deterministic without the sort the KLL store needs."""
    store = spark.read.parquet(store_path)
    return store.groupBy(key_col).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sum_cents").cast("bigint").alias("sum_cents"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.count(F.lit(1)).alias("n_partials"),
    )
