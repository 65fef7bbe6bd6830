"""Skew mitigation for joins and aggregations (SURVEY.md §4 /
100 TB design notes).

AQE's skew-join splitting (on in ``session.py``) handles moderate skew
automatically at shuffle time. These helpers are for the pathological
case AQE can't fix — a handful of keys so hot that *any* single-task
processing of one key is too big — using the classic salting rewrite:

- ``salted_join``: replicate the small side ``salt`` times, scatter the
  big side's hot keys across ``salt`` sub-keys, join on (key, salt).
  The hot key's rows now land on ``salt`` tasks instead of one.
- ``two_phase_agg``: pre-aggregate on (key, salt) then finish on key —
  the map-side-combine idea made explicit for high-cardinality-input /
  low-cardinality-output aggregations where one output key dominates.

Both are pure DataFrame rewrites: Catalyst still picks the physical
join/agg; the rewrite only changes the shuffle key space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join resilient to hot keys on the big side.

    The big side gets a random-but-deterministic salt in [0, salt)
    (hash of its whole row → stable across retries, unlike ``rand()``
    which breaks task re-execution determinism); the small side is
    exploded ``salt``× so every (key, salt) combination exists. Output
    columns match ``big.join(small, on, how)``.

    Use when a profile shows single hot keys above ~1 task's capacity;
    cost is ``salt``× duplication of the small side's shuffle volume.
    """
    big_cols = [c for c in big.columns]
    small_cols = [c for c in small.columns if c != on]
    b = big.withColumn("__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big_cols]), F.lit(salt)))
    s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = b.join(s, [on, "__salt"], how)
    return out.select(*big_cols, *small_cols)


def two_phase_agg(
    df: DataFrame,
    key: str,
    phase1: dict[str, Column],
    phase2: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 aggregates per (key, salt) with the ``phase1`` expressions
    (name → aggregate over raw rows); phase 2 aggregates per key with
    the ``phase2`` expressions (name → combinator over the phase-1
    columns). Only re-aggregable pairs are sound: (sum, sum),
    (count, sum), (min, min), (max, max); avg = sum+count combined in
    a final select.

        two_phase_agg(ev, "event_type",
                      {"s": F.sum("value"), "n": F.count(F.lit(1))},
                      {"s": F.sum("s"),     "n": F.sum("n")})
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    p1 = salted.groupBy(key, "__salt").agg(*[e.alias(n) for n, e in phase1.items()])
    return p1.groupBy(key).agg(*[e.alias(n) for n, e in phase2.items()])
