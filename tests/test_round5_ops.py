"""Round-5 operator tests: Ed-Join edit-distance join (completeness vs
brute force, including the short-string bucket the customer fixture
never exercises) and corpus snapshot_diff status classification."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F


def _brute_force_pairs(names: list[str], max_dist: int) -> set[tuple[str, str, int]]:
    def lev(a: str, b: str) -> int:
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    out = set()
    for a, b in itertools.combinations(sorted(set(names)), 2):
        d = lev(a, b)
        if d <= max_dist:
            out.add((a, b, d))
    return out


def test_editdist_join_matches_brute_force_including_short_strings(spark):
    """The q-gram prefix filter alone is provably incomplete below
    len = q*(d+1) ("ab"/"ac" share zero trigrams at distance 1) — the
    short-string bucket must recover exactly those pairs, and the
    combined result must equal brute force on a vocabulary spanning
    both regimes."""
    from parcialbigdata_spark.operators.dedup import editdist_join

    names = [
        # short regime (< 6 chars): all-gram destruction possible
        "ab", "ac", "abc", "abd", "xbd", "ba",
        # boundary (5-6 chars)
        "gear1", "gear2", "gears", "wheel",
        # long regime: ID-like strings with rare digit tails
        "Customer#000000001", "Customer#000000002", "Customer#000000011",
        "Customer#000000101", "Supplier#000000001",
        # a long pair beyond the threshold (dist 2, must NOT appear)
        "Customer#000000022",
    ]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in editdist_join(df, "name", max_dist=1).collect()
    }
    want = _brute_force_pairs(names, 1)
    assert got == want
    # The short regime genuinely contributed pairs (the scenario the
    # gram path misses): "ab"-"ac" is distance 1 with no shared trigram.
    assert ("ab", "ac", 1) in want


def test_editdist_join_dedups_repeated_names(spark):
    """Duplicated strings cost one comparison, not n² — the distinct
    reduction happens before any join."""
    from parcialbigdata_spark.operators.dedup import editdist_join

    rows = [("widget-001",)] * 50 + [("widget-002",)] * 50
    df = spark.createDataFrame(rows, ["name"])
    out = editdist_join(df, "name", max_dist=1).collect()
    assert [(r["name_a"], r["name_b"], r["dist"]) for r in out] == [
        ("widget-001", "widget-002", 1)
    ]


def test_snapshot_diff_classifies_all_statuses(spark):
    from parcialbigdata_spark.operators.corpus import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "en"), (3, "c", "de"), (5, None, "en")],
        ["id", "text", "lang"],
    )
    new = spark.createDataFrame(
        [(1, "a", "en"), (2, "B!", "en"), (4, "d", "fr"), (5, "x", "en")],
        ["id", "text", "lang"],
    )
    got = {
        r["id"]: r["status"]
        for r in snapshot_diff(old, new, "id", ["text", "lang"]).collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "added",
        5: "changed",  # NULL -> 'x' is a change (documented contract)
    }
