"""Round-6b operator tests: fingerprint layout-invariance, join-size
estimator identity, apportionment budget property, and the streaming
exact-state store's merge==batch identity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_table_fingerprint_is_layout_and_order_invariant(spark):
    """Same rows → same (n_rows, fingerprint) under any partitioning or
    row order; one changed row flips the fingerprint."""
    from parcialbigdata_spark.operators.diagnostics import table_fingerprint

    rows = [(i, f"name-{i}", "SEG" + str(i % 3)) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "name", "seg"])
    cols = ["id", "name", "seg"]
    base = table_fingerprint(df.coalesce(1), cols, "t").collect()[0]
    shuffled = table_fingerprint(
        df.repartition(17).sortWithinPartitions(F.desc("name")), cols, "t"
    ).collect()[0]
    assert (base["n_rows"], base["fingerprint"]) == (
        shuffled["n_rows"],
        shuffled["fingerprint"],
    )
    tampered_rows = rows[:100] + [(100, "name-100x", "SEG1")] + rows[101:]
    tampered = spark.createDataFrame(tampered_rows, ["id", "name", "seg"])
    t = table_fingerprint(tampered, cols, "t").collect()[0]
    assert t["n_rows"] == base["n_rows"]
    assert t["fingerprint"] != base["fingerprint"]


def test_join_size_estimate_matches_real_join_and_skips_nulls(spark):
    from parcialbigdata_spark.operators.diagnostics import join_size_estimate

    a = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,), (None,)], "k bigint"
    )
    b = spark.createDataFrame([(1,), (2,), (2,), (None,)], "k bigint")
    est = join_size_estimate(a, "k", b, "k", "ab").collect()[0]["est_pairs"]
    actual = a.join(b, "k").count()  # inner equi-join: NULLs never match
    assert est == actual == 2 * 1 + 1 * 2  # k=1: 2x1, k=2: 1x2
    # disjoint keys -> empty count relation join -> 0, not NULL
    c = spark.createDataFrame([(99,)], "k bigint")
    assert join_size_estimate(a, "k", c, "k", "ac").collect()[0]["est_pairs"] == 0


def test_apportionment_allocations_sum_to_budget(spark):
    """The registered query's allocations must sum exactly to 10,000 —
    the property float-rate rounding cannot guarantee."""
    from parcialbigdata_spark.queries import QUERIES

    out = QUERIES["sample_budget_apportionment"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert sum(r["alloc"] for r in out) == 10000
    assert all(r["alloc"] in (r["base_alloc"], r["base_alloc"] + 1) for r in out)


def test_streaming_state_store_merge_equals_batch(spark, tmp_path):
    """Applying the foreachBatch body over two disjoint static batches
    and merging the store must equal one batch agg_state over the
    union — the replay-free exactly-once contract in miniature."""
    from parcialbigdata_spark.operators.incremental import agg_state
    from parcialbigdata_spark.streaming.state_store import (
        agg_state_applier,
        merged_state,
    )

    rows = [("a", 1.25), ("a", 2.5), ("b", 10.0), ("b", 0.75), ("c", 5.0)]
    df = spark.createDataFrame(rows, ["event_type", "value"])
    b1, b2 = df.limit(2), df.subtract(df.limit(2))
    store = os.path.join(str(tmp_path), "store")
    applier = agg_state_applier(store)
    applier(b1, 0)
    applier(b2, 1)
    merged = {
        r["event_type"]: (r["n"], r["sum_cents"], r["min_v"], r["max_v"])
        for r in merged_state(spark, store).collect()
    }
    full = {
        r["event_type"]: (r["n"], r["sum_cents"], r["min_v"], r["max_v"])
        for r in agg_state(df, ["event_type"], "value").collect()
    }
    assert merged == full
