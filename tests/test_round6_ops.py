"""Round-6 operator tests: deletion-neighborhood edit-distance
blocking (both strategy branches vs brute force), incremental
aggregate-state merge identity, deterministic stratified sampling
(partitioning invariance — the property the pre-prune must not break),
and the key-skew profiler."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_round5_ops import _brute_force_pairs


def test_editdist_deletion_path_d2_matches_brute_force(spark):
    """max_dist=2 routes to the deletion-neighborhood generator (two
    deletion levels); result must equal brute force on a vocabulary
    with pairs at distance 0-3 (the d=3 pair must NOT appear)."""
    from parcialbigdata_spark.operators.dedup import editdist_join

    names = [
        "kitten", "sitten", "sittin", "sitting",  # chain of distance-1 steps
        "mitten", "mutton",
        "ab", "b", "",  # degenerate short strings incl. empty
        "abcdef", "abcxef", "abxxef", "xbxxex",
    ]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in editdist_join(df, "name", max_dist=2).collect()
    }
    assert got == _brute_force_pairs(names, 2)
    # the chain endpoints are distance 3 — must be absent
    assert not any(a == "kitten" and b == "sitting" for a, b, _ in got)


def test_editdist_qgram_path_d3_matches_brute_force(spark):
    """max_dist=3 keeps the Ed-Join q-gram prefix path (deletion
    neighborhoods would blow up as len^3); completeness must hold
    there too, including its short-string exact bucket."""
    from parcialbigdata_spark.operators.dedup import editdist_join

    names = [
        "kitten", "sitting", "mitten", "sittin",
        "ab", "abcd", "abcdefgh", "zbcdefgh", "zbcdefghijk",
        "Customer#000000001", "Customer#000000222",
    ]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in editdist_join(df, "name", max_dist=3).collect()
    }
    assert got == _brute_force_pairs(names, 3)
    assert ("kitten", "sitting", 3) in got


def test_incremental_merge_equals_full_recompute(spark):
    """merge(agg_state(A), agg_state(B)) == agg_state(A ∪ B), including
    keys present on only one side (the full-outer + NULL-skipping
    least/greatest semantics)."""
    from parcialbigdata_spark.operators.incremental import (
        agg_state,
        merge_agg_states,
    )

    rows = [
        ("x", 10.0), ("x", 20.5), ("y", 5.25),          # base
        ("x", 1.0), ("z", 100.0), ("z", 50.0),          # delta ('z' delta-only)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    base, delta = df.limit(3), df.subtract(df.limit(3))
    # (limit/subtract is fine here: values are distinct rows)
    merged = {
        r["k"]: (r["n"], r["sum_cents"], r["min_v"], r["max_v"])
        for r in merge_agg_states(
            agg_state(base, ["k"], "v"), agg_state(delta, ["k"], "v"), ["k"]
        ).collect()
    }
    full = {
        r["k"]: (r["n"], r["sum_cents"], r["min_v"], r["max_v"])
        for r in agg_state(df, ["k"], "v").collect()
    }
    assert merged == full
    assert merged["y"][0] == 1 and merged["z"][0] == 2  # one-sided keys


def test_stratified_sample_is_partitioning_invariant(spark):
    """The partition-local pre-prune must not change the result: the
    sample drawn from a 1-partition layout equals the sample from a
    13-partition shuffle of the same rows."""
    from parcialbigdata_spark.operators.sampling import stratified_sample

    rows = [(i % 3, i) for i in range(500)]
    df = spark.createDataFrame(rows, ["stratum", "id"])
    one = {
        (r["stratum"], r["sample_rank"], r["id"])
        for r in stratified_sample(df.coalesce(1), "stratum", "id", k=4).collect()
    }
    many = {
        (r["stratum"], r["sample_rank"], r["id"])
        for r in stratified_sample(df.repartition(13), "stratum", "id", k=4).collect()
    }
    assert one == many
    assert len(one) == 12  # 3 strata × k=4
    # ranks are 1..k per stratum
    for s in range(3):
        assert sorted(rk for st, rk, _ in one if st == s) == [1, 2, 3, 4]


def test_key_skew_profile_reports_the_heavy_hitter(spark):
    from parcialbigdata_spark.operators.diagnostics import key_skew_profile

    rows = [(7,)] * 90 + [(1,)] * 5 + [(2,)] * 5
    df = spark.createDataFrame(rows, ["k"])
    p = key_skew_profile(df, "k", "t.k").collect()[0]
    assert p["rel"] == "t.k"
    assert p["n_keys"] == 3 and p["n_rows"] == 100
    assert p["max_cnt"] == 90 and p["top_key"] == "7"
    # max/mean = 90 / (100/3)
    assert abs(p["skew_ratio"] - 2.7) < 1e-9


def test_neighborhood_overlap_on_a_path_graph(spark):
    """Path 1-2-3-4: the distance-2 pairs are (1,3) and (2,4), each
    with one common neighbor; jaccard = 1/(deg_a + deg_b - 1).
    Adjacent pairs must be excluded."""
    from parcialbigdata_spark.operators.graph import neighborhood_overlap

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], ["src", "dst"]
    )
    rows = {
        (r["node_a"], r["node_b"]): (r["n_common"], r["jaccard"], r["link_rank"])
        for r in neighborhood_overlap(edges, top_k=10).collect()
    }
    assert set(rows) == {(1, 3), (2, 4)}
    assert rows[(1, 3)] == (1, 0.5, 1)  # deg1=1, deg3=2 -> 1/2; rank tie-break a asc
    assert rows[(2, 4)] == (1, 0.5, 2)
