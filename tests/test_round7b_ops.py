"""Round-7b operator tests: k-anonymity report semantics, the
two-phase distributed prefix scan (correctness vs the single-window
reference + partition invariance), exact two-sample KS, the
partition-pruned scan plan (PartitionFilters + single partition
read), mergeSchema evolution nullability, and golden-record
survivorship tie-breaks."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------- privacy


def test_k_anonymity_report_counts(spark):
    from parcialbigdata_spark.operators.privacy import k_anonymity_report

    # Classes: (a,) -> 3 rows, sensitive {1,2};  (b,) -> 1 row {9}.
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 1), ("b", 9)], ["qi", "s"]
    )
    rows = {
        r["k_threshold"]: r
        for r in k_anonymity_report(df, ["qi"], "s", thresholds=[2, 5]).collect()
    }
    assert set(rows) == {2, 5}
    r2, r5 = rows[2], rows[5]
    # k=2: only the singleton class (b) is below.
    assert (r2["classes_below"], r2["records_at_risk"]) == (1, 1)
    # k=5: both classes are below; all 4 records at risk.
    assert (r5["classes_below"], r5["records_at_risk"]) == (2, 4)
    for r in (r2, r5):
        assert (r["n_classes"], r["k_min"], r["min_l"]) == (2, 1, 1)


# ---------------------------------------------------------------- scan


def test_partitioned_cumsum_matches_global_window_and_is_partition_invariant(spark):
    from parcialbigdata_spark.operators.scan import partitioned_cumsum

    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 1000).alias("k"), (F.col("id") % 7).alias("x")
    )
    expected = {
        (r["k"], r["cum"])
        for r in df.withColumn(
            "cum",
            F.sum("x").over(
                Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).collect()
    }
    for p in (2, 8):
        got = {
            (r["k"], r["cum"])
            for r in partitioned_cumsum(df, ["k"], {"x": "cum"}, num_partitions=p).collect()
        }
        assert got == expected, f"num_partitions={p}"


def test_partitioned_cumsum_plan_single_data_exchange(spark):
    # r8: the explicit range-bucket column replaces repartitionByRange
    # + spark_partition_id(); the local window and the totals agg must
    # REUSE the one explicit repartition — Catalyst adding an
    # ENSURE_REQUIREMENTS exchange on the bucket column is exactly the
    # double-shuffle this design eliminates.
    from parcialbigdata_spark.operators.scan import partitioned_cumsum

    df = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(1).alias("x"))
    out = partitioned_cumsum(df, ["k"], {"x": "cum"}, num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan
    assert "rangepartitioning" not in plan.lower()
    bad = [
        line
        for line in plan.splitlines()
        if "ENSURE_REQUIREMENTS" in line and "__pid" in line
    ]
    assert not bad, f"window/agg re-shuffled the bucketed data: {bad}"


def test_ks_two_sample_known_value(spark):
    from parcialbigdata_spark.operators.scan import ks_two_sample

    # A = {1,2,3,4}, B = {3,4,5,6}: F_a - F_b is maximal at x=2
    # (F_a=0.5, F_b=0) -> D = 0.5, attained first at value 1? No:
    # at 1: |1/4 - 0| = 0.25; at 2: |2/4 - 0| = 0.5; at 3: |3/4-1/4|=0.5.
    # Max = 0.5, tie between values 2 and 3 -> smallest value wins: 2.
    rows = [(float(v), "A") for v in (1, 2, 3, 4)] + [
        (float(v), "B") for v in (3, 4, 5, 6)
    ]
    df = spark.createDataFrame(rows, ["v", "g"])
    r = ks_two_sample(df, "v", "g", "A", "B").collect()[0]
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["ks_d"] == 0.5
    assert r["at_value"] == 2.0


# --------------------------------------------------- partition pruning


def test_partition_pruned_scan_reads_one_partition(spark):
    from parcialbigdata_spark.queries import _partitioned_events_day

    base = tempfile.mkdtemp(prefix="prune_test_")
    try:
        day, out = _partitioned_events_day(spark, SF_DIR, base)
        plan = day._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        pf = plan.split("PartitionFilters", 1)[1][:300]
        assert "event_date" in pf
        # The pruned scan must read exactly the one matching hive
        # partition directory, not all ~30. (inputFiles() reflects the
        # pre-pruning file index, so ask the scan node itself.)
        scan = day._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        assert scan.getClass().getSimpleName() == "FileSourceScanExec"
        assert scan.selectedPartitions().partitionCount() == 1
        n_dates = {f.split("event_date=")[1].split("/")[0] for f in day.inputFiles()}
        assert len(n_dates) > 1  # the unpruned index really had ~30 days
        assert out.count() > 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ------------------------------------------------------ schema evolution


def test_merge_schema_evolution_nullability(spark):
    docs = spark.createDataFrame(
        [(1, "t1", "s1"), (2, "t2", "s1")], ["doc_id", "text", "source"]
    )
    base = tempfile.mkdtemp(prefix="evo_test_")
    try:
        docs.write.parquet(f"{base}/v1")
        docs.withColumn("lang", F.lit("en")).write.parquet(f"{base}/v2")
        merged = spark.read.option("mergeSchema", "true").parquet(
            f"{base}/v1", f"{base}/v2"
        )
        assert "lang" in merged.columns
        assert merged.filter(F.col("lang").isNull()).count() == 2
        assert merged.count() == 4
    finally:
        shutil.rmtree(base, ignore_errors=True)


# -------------------------------------------------------- golden record


def test_golden_record_survivorship_tiebreak(spark):
    """Longest member wins; equal lengths fall back to min id."""
    from parcialbigdata_spark.operators import graph

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    chars = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4)], ["node", "n_chars"]
    )
    cc = graph.connected_components(pairs, "id_a", "id_b")
    m = cc.join(chars, "node")
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), F.asc("node"))
    golden = (
        m.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("component", "node")
        .collect()
    )
    by_comp = {r["component"]: r["node"] for r in golden}
    # Cluster {1,2,3}: 2 and 3 tie at 9 chars -> min id 2.
    # Cluster {10,11}: tie at 4 chars -> min id 10.
    assert by_comp == {1: 2, 10: 10}


def test_partitioned_carry_matches_global_locf(spark):
    from parcialbigdata_spark.operators.scan import partitioned_carry

    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 == 0, F.col("id")).alias("v"),
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    expected = {
        (r["k"], r["locf"])
        for r in df.withColumn("locf", F.last("v", ignorenulls=True).over(w)).collect()
    }
    for p in (3, 16):
        got = {
            (r["k"], r["locf"])
            for r in partitioned_carry(df, ["k"], "v", "locf", num_partitions=p).collect()
        }
        assert got == expected, f"num_partitions={p}"


def test_partitioned_carry_descending_is_nocb(spark):
    from parcialbigdata_spark.operators.scan import partitioned_carry

    df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 11 == 3, F.col("id")).alias("v"),
    )
    w = Window.orderBy(F.col("k").desc()).rowsBetween(Window.unboundedPreceding, 0)
    expected = {
        (r["k"], r["nocb"])
        for r in df.withColumn("nocb", F.last("v", ignorenulls=True).over(w)).collect()
    }
    got = {
        (r["k"], r["nocb"])
        for r in partitioned_carry(
            df, ["k"], "v", "nocb", descending=True, num_partitions=5
        ).collect()
    }
    assert got == expected


def test_grouped_cumsum_matches_per_group_window(spark):
    from parcialbigdata_spark.operators.scan import partitioned_cumsum

    df = spark.range(0, 600).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 13 % 600).alias("k"),
        (F.col("id") % 5).alias("x"),
    )
    w = Window.partitionBy("g").orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    expected = {
        (r["g"], r["k"], r["cum"])
        for r in df.withColumn("cum", F.sum("x").over(w)).collect()
    }
    got = {
        (r["g"], r["k"], r["cum"])
        for r in partitioned_cumsum(
            df, ["k"], {"x": "cum"}, num_partitions=7, group_cols=["g"]
        ).collect()
    }
    assert got == expected


def test_quantile_normalize_identity_on_single_group(spark):
    """With one group the map is (up to rank definition) the identity:
    each value normalizes to a value of the same multiset; the
    normalized multiset equals the original multiset."""
    from parcialbigdata_spark.operators.scan import quantile_normalize

    df = spark.createDataFrame(
        [(i, "s", v) for i, v in enumerate([5, 1, 3, 3, 9, 1, 7, 5])],
        ["doc_id", "source", "n_chars"],
    )
    out = quantile_normalize(df, "doc_id", "source", "n_chars").collect()
    assert sorted(r["qn_n_chars"] for r in out) == sorted([5, 1, 3, 3, 9, 1, 7, 5])
    # And every row maps to its own within-group order statistic.
    for r in out:
        assert r["qn_n_chars"] is not None


# ------------------------------------------------------- record linkage


def test_blocked_candidates_union_dedups(spark):
    from parcialbigdata_spark.operators.linkage import blocked_candidates

    left = spark.createDataFrame([(1, "a", "x"), (2, "b", "y")], ["lid", "k1", "k2"])
    right = spark.createDataFrame([(10, "a", "x"), (11, "c", "y")], ["rid", "k1", "k2"])
    # Rule 1 (k1): (1,10). Rule 2 (k2): (1,10) again + (2,11).
    cand = blocked_candidates(left, right, "lid", "rid", [("k1", "k1"), ("k2", "k2")])
    got = {(r["lid"], r["rid"]) for r in cand.collect()}
    assert got == {(1, 10), (2, 11)}
    assert cand.count() == 2  # the duplicate (1,10) candidate collapsed


def test_score_pairs_classes(spark):
    from parcialbigdata_spark.operators.linkage import score_pairs

    pairs = spark.createDataFrame(
        [("p1", 1, 1), ("p2", 1, 0), ("p3", 0, 0)], ["pid", "f1", "f2"]
    )
    out = {
        r["pid"]: (r["score"], r["cls"])
        for r in score_pairs(
            pairs,
            [("a", F.col("f1") == 1, 6, -4), ("b", F.col("f2") == 1, 5, -5)],
            match_threshold=10,
            possible_threshold=1,
        ).collect()
    }
    assert out == {"p1": (11, "match"), "p2": (1, "possible"), "p3": (-9, "non_match")}


def test_record_linkage_full_recall_on_ground_truth(spark):
    """Every true (original, dirtied-copy) pair must land in 'match'."""
    from parcialbigdata_spark.queries import QUERIES
    from parcialbigdata_spark.sources.tables import load_table

    n_cust = load_table(spark, SF_DIR, "customer").count()
    out = QUERIES["record_linkage_customers"](spark, SF_DIR)
    true_rows = out.filter(F.col("is_true")).collect()
    assert len(true_rows) == n_cust
    assert all(r["cls"] == "match" for r in true_rows)


# -------------------------------------------------- MG heavy hitters


def test_mg_partial_prune_math(spark):
    """Batch summary = counts minus (k+1)-th largest, positives kept."""
    import os
    import shutil
    import tempfile

    from parcialbigdata_spark.streaming.sketch_store import mg_partial_applier

    base = tempfile.mkdtemp(prefix="mg_unit_")
    try:
        # Counts: a->5, b->3, c->2, d->1. k=2 -> d = 3rd largest = 2.
        rows = [("k", x) for x, n in [("a", 5), ("b", 3), ("c", 2), ("d", 1)] for _ in range(n)]
        df = spark.createDataFrame(rows, ["event_type", "user_id"])
        mg_partial_applier(base + "/store", k=2)(df, 0)
        got = {
            (r["user_id"], r["cnt"])
            for r in spark.read.parquet(base + "/store").collect()
        }
        assert got == {("a", 3), ("b", 1)}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_mg_merged_bounds_hold_across_batch_splits(spark):
    """Merged counters under-count by at most N/(k+1) and cover every
    above-bound item, for two different batch partitionings."""
    import shutil
    import tempfile

    from parcialbigdata_spark.streaming.sketch_store import (
        mg_partial_applier,
        merged_counters,
    )

    items = [("k", f"u{i % 7}") for i in range(200)] + [("k", "hot")] * 100
    k = 3
    for split in (1, 4):
        base = tempfile.mkdtemp(prefix="mg_split_")
        try:
            applier = mg_partial_applier(base + "/store", k=k)
            chunk = len(items) // split
            for b in range(split):
                part = items[b * chunk : (b + 1) * chunk] or items[:1]
                applier(spark.createDataFrame(part, ["event_type", "user_id"]), b)
            est = {
                r["user_id"]: r["est"]
                for r in merged_counters(spark, base + "/store").collect()
            }
            from collections import Counter

            exact = Counter(u for _, u in items)
            n = len(items)
            for u, c in exact.items():
                if c * (k + 1) > n:
                    assert u in est, (split, u)
                if u in est:
                    assert est[u] <= c
                    assert (c - est[u]) * (k + 1) <= n
        finally:
            shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------- incremental components


def test_incremental_components_equals_full_recompute(spark):
    """Star-collapse warm start is bit-identical to a full recompute,
    including the case where a new edge MERGES two old components."""
    from parcialbigdata_spark.operators import graph

    # Old graph: components {1,2,3} and {10,11}; 20-21 too.
    old = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], ["id_a", "id_b"]
    )
    # New edges: attach 4 to the first component, MERGE {1..3} with
    # {10,11} via 3-10, and a brand-new component {30,31}.
    new = spark.createDataFrame([(3, 4), (3, 10), (30, 31)], ["id_a", "id_b"])
    prior = graph.connected_components(old, "id_a", "id_b")
    inc = {
        (r["node"], r["component"])
        for r in graph.incremental_components(prior, new, "id_a", "id_b").collect()
    }
    full = {
        (r["node"], r["component"])
        for r in graph.connected_components(
            old.unionByName(new), "id_a", "id_b"
        ).collect()
    }
    assert inc == full
    # Merged component labeled by the global min (1), new one by 30.
    assert (10, 1) in inc and (4, 1) in inc and (31, 30) in inc
