"""Bucketed / partitioned warehouse layout helpers (100 TB design).

At fact scale the dominant cost of the star joins (orders ⋈ lineitem ⋈
customer) is the shuffle. Spark's bucketing removes it: both sides
written bucketed by the join key into the session catalog join with
ZERO exchanges (bucket-local SortMergeJoin). These helpers encode that
layout so the repartition/bucket strategy is code, not tribal
knowledge:

- ``write_bucketed``: save a DataFrame as a bucketed, sorted catalog
  table (bucket count sized by target data volume).
- ``write_partitioned``: hive-style date/category partitioning for
  pruning (the pipeline's CSV sink uses the same idea).
- ``bucket_join_ready``: quick check that two catalog tables share a
  bucket spec on the join key.

Bucketing requires the table to live in the session catalog
(``saveAsTable``) — plain ``parquet(path)`` files cannot carry the
bucket metadata. Verified by ``tests/test_warehouse.py``: the bucketed
join plan contains no Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Save as a bucketed (and bucket-sorted) catalog table.

    Size ``num_buckets`` so each bucket lands in the 128 MB-1 GB range
    at the target volume; both join sides must use the SAME count for
    an exchange-free join. ``path`` makes it an external table (data at
    an explicit location instead of the warehouse dir)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet for partition pruning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, sorted parquet layout for min/max data skipping.

    ``repartitionByRange`` gives each output file a DISJOINT range of
    ``sort_cols`` and ``sortWithinPartitions`` orders rows inside, so
    every parquet row group carries tight min/max statistics. A later
    scan with a predicate on the leading sort column prunes whole files
    and row groups (footer-only reads) — the single-column analog of
    Z-ordering, and the right layout for the one column a table is
    overwhelmingly filtered by (ship date, event time). At 100 TB the
    range exchange is one extra shuffle at write time that every
    subsequent time-filtered scan amortizes."""
    cols = [df[c] for c in sort_cols]
    part = df.repartitionByRange(num_files, *cols) if num_files else df.repartitionByRange(*cols)
    part.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def bucket_join_ready(spark: SparkSession, table_a: str, table_b: str, key: str) -> bool:
    """True when both catalog tables are bucketed on ``key`` with equal
    bucket counts (the precondition for an exchange-free join)."""

    def spec(table: str) -> tuple[int, str] | None:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        info = {r.col_name: (r.data_type or "") for r in rows}
        n = info.get("Num Buckets")
        cols = info.get("Bucket Columns", "")
        return (int(n), cols) if n else None

    a, b = spec(table_a), spec(table_b)
    return a is not None and a == b and f"`{key}`" in a[1]


def write_training_shards(
    df: DataFrame,
    path: str,
    order_key: str,
    num_shards: int = 8,
    fmt: str = "json",
    mode: str = "overwrite",
) -> None:
    """Write a deterministically shuffled training-shard layout: one
    file per shard, rows ordered by ``order_key`` inside each shard.

    This is the sink half of the ``shuffle_order_documents`` contract:
    the order key is a salted hash of the id (NOT ``rand()``), so the
    epoch order every reader sees is identical across runs, engines,
    and cluster sizes. The shard is the hash prefix modulo
    ``num_shards`` (the same formula as the ``shuffle_order_documents``
    query), the write is ``repartition(shard)`` +
    ``sortWithinPartitions(order_key)`` + ``partitionBy(shard)`` — one
    shuffle, no global sort. ``partitionBy`` (not the repartition alone)
    is what guarantees exactly one sorted file per shard directory:
    hash collisions may co-locate two shards in one task, but the
    writer then splits them into their own directories preserving
    in-task order. At 100 TB shard files are independent, the write
    parallelizes across executors, and a training job maps one reader
    per shard directory. ``json`` (= JSONL, the common LLM-corpus
    interchange format) or ``parquet``."""
    from pyspark.sql import functions as F

    shard = (
        F.conv(F.substring(F.col(order_key), 1, 4), 16, 10).cast("bigint") % num_shards
    )
    (
        df.withColumn("shard", shard)
        .repartition(num_shards, "shard")
        # Leading with the partition column matters: the parquet/json
        # FileFormatWriter requires task rows sorted by partition cols
        # and would inject its OWN (order-destroying) sort if the
        # existing ordering didn't already start with `shard`.
        .sortWithinPartitions("shard", order_key)
        .write.mode(mode)
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )
