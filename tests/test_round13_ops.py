"""Round-13 operator tests.

1. ``_sn_bucketize`` LCP-strip fix (VERDICT r12 #1 / top_next): on
   common-prefix key domains (every TPC-H ``c_name`` starts
   ``Customer#``) the un-stripped 7-byte proxy was CONSTANT — every
   quantile cut equal, every row in bucket 0, pass 1 degenerating to
   the single-partition global sort the operator exists to avoid.
   The fix strips the domain's longest common prefix (one binary
   min/max agg + driver-side byte compare) before the 7-byte window.
   Tests pin: >1 populated bucket on ``Customer#NNNNN``-style keys at
   sf0.1 scale, pass-1 window parallelism > 1, and byte-for-byte
   equality with the single-reducer global run (exactness must
   survive the proxy change).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from parcialbigdata_spark.operators.linkage import (
    _sn_bucketize,
    sorted_neighborhood_pairs,
    sorted_neighborhood_pairs_global,
)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _pairset(df):
    return {
        (r.id_a, r.id_b, r.key_a, r.key_b, r.pos_gap) for r in df.collect()
    }


def test_sn_bucketize_multi_bucket_on_common_prefix_keys(spark):
    # The degeneracy fixture: formatted-ID keys sharing a long prefix.
    rows = [(i, f"Customer#{i:09d}") for i in range(5000)]
    df = spark.createDataFrame(rows, "id bigint, k string").repartition(8)
    b = _sn_bucketize(df, "id", "k", num_buckets=8)
    pops = b.groupBy("__bucket").count().collect()
    assert len(pops) > 1, "common-prefix keys must spread across buckets"
    # balanced-ish: no bucket holds more than half the rows
    assert max(r["count"] for r in pops) < 5000 * 0.5


def test_sn_bucketize_multi_bucket_on_sf01_customer(spark):
    cust = spark.read.parquet(os.path.join(SF01, "customer.parquet"))
    b = _sn_bucketize(cust, "c_custkey", "c_name", num_buckets=8)
    pops = b.groupBy("__bucket").count().collect()
    n = sum(r["count"] for r in pops)
    assert len(pops) >= 6, f"sf0.1 c_name must populate ~8 buckets, got {len(pops)}"
    assert max(r["count"] for r in pops) < n * 0.5


def test_sn_global_no_single_partition_window_on_prefix_keys(spark):
    # The scale contract: with >1 populated bucket, the pass-1 window
    # partitions by __bucket so its sort runs on >1 task. Count the
    # actual partitions carrying rows after the window's exchange.
    rows = [(i, f"Customer#{i:09d}") for i in range(4000)]
    df = spark.createDataFrame(rows, "id bigint, k string").repartition(8)
    b = _sn_bucketize(df, "id", "k", num_buckets=8)
    shuffled = b.repartition(32, "__bucket")  # the window's exchange shape
    nonempty = (
        shuffled.rdd.mapPartitions(lambda it: [1] if next(it, None) else [])
        .count()
    )
    assert nonempty > 1, "pass-1 sort must not land on a single task"


def test_sn_global_exact_on_prefix_keys(spark):
    # Exactness must survive the LCP strip: byte-for-byte equality
    # with the single-reducer global run on the degeneracy fixture.
    rows = [(i, f"Customer#{(i * 37) % 900:09d}") for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, k string").repartition(7)
    ref = _pairset(sorted_neighborhood_pairs(df, "id", "k", window=3))
    got = _pairset(
        sorted_neighborhood_pairs_global(df, "id", "k", window=3, num_buckets=6)
    )
    assert got == ref
    assert len(ref) > 0


def test_sn_bucketize_all_equal_keys_single_bucket(spark):
    # Degenerate DATA (every key identical) is genuinely one bucket:
    # the LCP is the whole key, the stripped proxy is 0 everywhere,
    # and correctness still holds via the single populated bucket.
    rows = [(i, "same-key") for i in range(50)]
    df = spark.createDataFrame(rows, "id bigint, k string")
    b = _sn_bucketize(df, "id", "k", num_buckets=4)
    assert b.select("__bucket").distinct().count() == 1
    ref = _pairset(sorted_neighborhood_pairs(df, "id", "k", window=2))
    got = _pairset(
        sorted_neighborhood_pairs_global(df, "id", "k", window=2, num_buckets=4)
    )
    assert got == ref
