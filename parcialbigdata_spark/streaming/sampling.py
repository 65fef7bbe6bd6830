"""Streaming reservoir sampling (bounded, deterministic, mergeable).

A classic reservoir (Vitter's Algorithm R) is sequential and
RNG-dependent — useless for a distributed replayable stream, where
micro-batch boundaries are arbitrary and a failed batch re-runs. The
distributed-native formulation is *priority sampling* (bottom-k):
assign every record a deterministic pseudo-random priority — here the
leading 32 bits of ``md5(event_id)`` — and keep the k smallest
priorities seen so far. min-k is associative and commutative, so the
final reservoir is a pure function of the SET of events: independent
of batch splits, arrival order, retries, and engine (the repo-wide
md5 recipe is byte-identical in Spark SQL, Python hashlib, and
DuckDB — which is what lets a batch SQL oracle re-derive the exact
sample a streaming drain produced).

Batch sibling: ``operators/sampling.stratified_sample`` — the same
deterministic-priority bottom-k, computed there as a two-level window
over a static table; this module is its streaming twin, maintaining
the bottom-k incrementally per key in ``applyInPandasWithState``
state (k priorities + ids per group — bounded regardless of stream
length, the whole point of a reservoir).

Scale: state is O(k) per key, the shuffle is the stateful groupBy's
key exchange only, and each batch merges locally sorted candidates —
the standard bottom-k sketch-merge cost (k log k per key per batch).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_seen", LongType()),
        StructField("sample_ids", ArrayType(LongType())),
    ]
)

# State: the current bottom-k as parallel arrays plus the monotone
# seen-counter that lets the drain pick each key's FINAL emission.
_STATE_SCHEMA = (
    "prios array<bigint>, eids array<bigint>, seen bigint"
)


def priority(event_id: int) -> int:
    """Leading 32 bits of md5(str(event_id)) — the repo-standard
    engine-portable hash (Spark: conv(substring(md5(..),1,8),16,10);
    DuckDB: ('0x'||substr(md5(..),1,8))::BIGINT)."""
    return int(hashlib.md5(str(event_id).encode()).hexdigest()[:8], 16)


def _reservoir_fn(key, pdfs, state: GroupState, k: int):
    if state.exists:
        prios, eids, seen = state.get
        pool = list(zip(prios, eids))
    else:
        pool, seen = [], 0
    for pdf in pdfs:
        ids = pdf["event_id"].tolist()
        seen += len(ids)
        pool.extend((priority(e), e) for e in ids)
    # bottom-k by (priority, id) — the id tie-break makes the order
    # total even under 32-bit priority collisions.
    pool.sort()
    pool = pool[:k]
    state.update(([p for p, _ in pool], [e for _, e in pool], seen))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_seen": [seen],
            "sample_ids": [[e for _, e in pool]],
        }
    )


def reservoir_per_type(events: DataFrame, k: int = 8) -> DataFrame:
    """Per-event-type streaming reservoir: one row per (type, batch)
    in update mode carrying the current bottom-k sample ids in
    priority order; the row with the max ``n_seen`` per key is the
    final reservoir."""

    def fn(key, pdfs, state):
        return _reservoir_fn(key, pdfs, state, k)

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
