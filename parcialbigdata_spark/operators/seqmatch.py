"""MATCH_RECOGNIZE-style sequence-pattern matching over event logs.

Spark SQL has no ``MATCH_RECOGNIZE`` keyword (SQL:2016 row-pattern
recognition; Flink CEP / Trino / Oracle ship it). The classical
reduction — and what this module implements — is *symbolize +
regex*: map each event to a one-character symbol, assemble each key's
events in time order into one compact string, and run the row pattern
as an ordinary regular expression over that string. Quantifiers
(``{3,}``), alternation, negated classes and anchors all come for
free from the regex engine, which is strictly more general than the
fixed-step funnel chain (``queries.funnel_steps_events`` — the
3-stage sibling this family generalizes: that one is a chain of
per-stage min-timestamp joins, extensible only by adding stages;
here the pattern is DATA, not plan shape).

Scale design: one shuffle — the groupBy(key) that assembles
sequences; ``collect_list`` gathers each user's events and
``array_sort`` orders them key-locally (no global sort, no window
over the raw stream). The symbol string per key is bounded by
events-per-key (constant under horizontal growth — more users, not
longer histories), so state per group is small and the regex scan is
linear JVM-side (``rlike``). Matching N patterns reuses the SAME
sequence relation: one scan, N cheap column expressions — versus N
funnel-join chains in the stage-wise formulation.

Determinism: events are ordered by (ts, event_id) — a total order
since event_id is unique — so the symbol string is reproducible on
any engine; patterns are kept inside the Java-regex ∩ RE2 dialect
(basic classes, quantifiers, anchors; no backreferences/lookaround)
so DuckDB's ``regexp_matches`` agrees byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def symbolize(
    events: DataFrame,
    mapping: dict[str, str],
    key: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    default: str = "o",
) -> DataFrame:
    """One row per ``key`` with its time-ordered symbol string ``seq``.

    ``mapping`` sends event-type values to single-character symbols;
    anything unmapped becomes ``default``. Ordering is the lexical
    sort of ``struct(order_cols..., sym)`` — ``array_sort`` on the
    collected structs, so ordering happens after the single shuffle,
    partition-locally per group.
    """
    sym: Column = F.lit(default)
    for val, ch in mapping.items():
        if len(ch) != 1:
            raise ValueError(f"symbol for {val!r} must be 1 char, got {ch!r}")
        sym = F.when(F.col(type_col) == val, F.lit(ch)).otherwise(sym)
    o1, o2 = order_cols
    return (
        events.select(F.col(key), F.col(o1), F.col(o2), sym.alias("sym"))
        .groupBy(key)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(o1, o2, "sym"))),
                    lambda s: s["sym"],
                ),
                "",
            ).alias("seq")
        )
    )


def match_counts(seq_df: DataFrame, patterns: dict[str, str]) -> DataFrame:
    """Count keys whose symbol sequence matches each pattern
    (unanchored search, like ``rlike`` / RE2 ``regexp_matches``).

    One single-row aggregate over the sequence relation (each pattern
    is a ``sum(when(rlike))`` column — one scan for all patterns),
    unpivoted to ``(pattern, n_users)`` rows. Patterns must stay in
    the Java ∩ RE2 regex dialect for cross-engine agreement.
    """
    if not patterns:
        raise ValueError("need at least one pattern")
    aggs = [
        F.sum(F.when(F.col("seq").rlike(rx), 1).otherwise(0))
        .cast("bigint")
        .alias(name)
        for name, rx in patterns.items()
    ]
    wide = seq_df.agg(*aggs)
    return wide.unpivot([], list(patterns), "pattern", "n_users")
