"""Round-9 operators: MIN/MAX maintenance under CDC retractions
(signed_minmax_refresh), and its loud-failure/degradation contracts."""

import random

import pytest
from pyspark.sql import functions as F

from parcialbigdata_spark.operators.incremental import signed_minmax_refresh


def _recompute(base_rows, change_rows):
    """Reference: apply signed changes to the base multiset, aggregate."""
    from collections import Counter, defaultdict

    ms = defaultdict(Counter)
    for k, v in base_rows:
        ms[k][v] += 1
    for k, v, m in change_rows:
        ms[k][v] += m
    out = {}
    for k, c in ms.items():
        vals = list(c.elements())
        if vals:
            out[k] = (
                len(vals),
                sum(int(v * 100 + 0.5) for v in vals),
                min(vals),
                max(vals),
            )
    return out


def test_minmax_refresh_equals_recompute_adversarial(spark):
    # deletes include every group's current minimum AND maximum;
    # inserts land both inside and outside the surviving range.
    base_rows = [("a", float(v)) for v in [1, 2, 3, 50, 60]] + [
        ("b", float(v)) for v in [10, 20, 30]
    ]
    change_rows = [
        ("a", 1.0, -1),  # delete current min
        ("a", 60.0, -1),  # delete current max
        ("a", 0.5, 1),  # new min via insert
        ("b", 30.0, -1),  # delete current max -> runner-up 20
        ("b", 25.0, 1),
    ]
    base = spark.createDataFrame(base_rows, "k string, v double")
    ch = spark.createDataFrame(change_rows, "k string, v double, m int")
    got = {
        r.k: (r.n, r.sum_cents, r.min_v, r.max_v)
        for r in signed_minmax_refresh(base, ch, ["k"], "v", "m", heap_k=2).collect()
    }
    assert got == _recompute(base_rows, change_rows)


def test_minmax_refresh_randomized_equals_recompute(spark):
    rng = random.Random(90210)
    base_rows = [
        (f"g{rng.randrange(4)}", float(rng.randrange(1, 40)))
        for _ in range(120)
    ]
    # retract a sample of actual base rows (valid CDC), insert fresh ones
    change_rows = [(*r, -1) for r in rng.sample(base_rows, 25)] + [
        (f"g{rng.randrange(4)}", float(rng.randrange(1, 40)), 1) for _ in range(15)
    ]
    base = spark.createDataFrame(base_rows, "k string, v double")
    ch = spark.createDataFrame(change_rows, "k string, v double, m int")
    got = {
        r.k: (r.n, r.sum_cents, r.min_v, r.max_v)
        for r in signed_minmax_refresh(
            base, ch, ["k"], "v", "m", heap_k=32
        ).collect()
    }
    assert got == _recompute(base_rows, change_rows)


def test_minmax_refresh_group_vanishes(spark):
    base = spark.createDataFrame([("a", 5.0), ("b", 7.0)], "k string, v double")
    ch = spark.createDataFrame([("a", 5.0, -1)], "k string, v double, m int")
    got = signed_minmax_refresh(base, ch, ["k"], "v", "m").collect()
    assert {r.k for r in got} == {"b"}


def test_minmax_refresh_heap_degrades_but_min_stays_exact(spark):
    # heap_k=2 over a 5-row group: deleting one tracked runner-up
    # shrinks the heap to one entry, whose head is still the exact min
    # (values outside the heap are >= the old k-th smallest).
    base = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 3, 4, 5]], "k string, v double"
    )
    ch = spark.createDataFrame([("a", 1.0, -1)], "k string, v double, m int")
    row = signed_minmax_refresh(base, ch, ["k"], "v", "m", heap_k=2).collect()[0]
    assert row.min_v == 2.0 and row.min_heap == [2.0]
    assert row.max_v == 5.0 and row.max_heap == [5.0, 4.0]


def test_minmax_refresh_heap_exhaustion_raises(spark):
    # both tracked minima die while base rows remain: the true min is
    # unknowable from bounded state -> loud failure, not a wrong answer.
    base = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 3, 4, 5]], "k string, v double"
    )
    ch = spark.createDataFrame(
        [("a", 1.0, -1), ("a", 2.0, -1)], "k string, v double, m int"
    )
    with pytest.raises(Exception, match="heap exhausted"):
        signed_minmax_refresh(base, ch, ["k"], "v", "m", heap_k=2).collect()


def test_minmax_refresh_negative_count_raises(spark):
    base = spark.createDataFrame([("a", 5.0)], "k string, v double")
    ch = spark.createDataFrame(
        [("zzz", 1.0, -1)], "k string, v double, m int"
    )
    with pytest.raises(Exception, match="no matching base row"):
        signed_minmax_refresh(base, ch, ["k"], "v", "m").collect()


def test_minmax_refresh_rejects_bad_multiplicity(spark):
    base = spark.createDataFrame([("a", 5.0)], "k string, v double")
    ch = spark.createDataFrame([("a", 1.0, 2)], "k string, v double, m int")
    with pytest.raises(Exception, match="must be \\+1 or -1"):
        signed_minmax_refresh(base, ch, ["k"], "v", "m").collect()


def test_minmax_refresh_duplicate_values_multiset_semantics(spark):
    # retracting ONE instance of a duplicated value must leave the
    # other instance as the min (array_remove would drop both).
    base = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("a", 9.0)], "k string, v double"
    )
    ch = spark.createDataFrame([("a", 1.0, -1)], "k string, v double, m int")
    row = signed_minmax_refresh(base, ch, ["k"], "v", "m", heap_k=3).collect()[0]
    assert (row.n, row.min_v, row.max_v) == (2, 1.0, 9.0)
