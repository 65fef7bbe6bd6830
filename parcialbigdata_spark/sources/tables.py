"""Fixture-table loaders (driver contract, TESTDATA.md).

Ten parquet tables per scale factor. At 100 TB these would be
partitioned/bucketed warehouse tables; the loaders keep the access path
identical (``spark.read.parquet``) so Catalyst's parquet source handles
predicate pushdown, column pruning and partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that are always small enough to broadcast, even at
# 100 TB fact scale (TPC-H dims grow sub-linearly or are fixed-size).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def spread(df: DataFrame, *keys: str) -> DataFrame:
    """Raise scan parallelism to the cluster default ahead of a
    CPU-heavy narrow map (tokenize/shingle/hash over full text).

    A source that produced fewer splits than cores — tiny files, a
    single parquet row-group — would otherwise run the whole expensive
    map in ≤ a handful of tasks while the rest of the cluster idles.
    At 100 TB the scan has thousands of splits, so this is a no-op
    (``getNumPartitions() >= defaultParallelism``) and costs nothing;
    the exchange only appears exactly when the input is too small to
    saturate the cluster, where shuffling it is cheap by definition.
    Hash-partitions on ``keys`` when given (deterministic placement,
    no round-robin sort); plain round-robin otherwise.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if keys:
        return df.repartition(target, *[F.col(k) for k in keys])
    return df.repartition(target)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # TIMESTAMP(NANOS) read as long (see session.py); truncate to
        # microseconds exactly like DuckDB/Arrow do. Integer DIV — a
        # double division would lose precision above 2^53 ns.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for spark.sql paths)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
