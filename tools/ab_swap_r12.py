"""Interleaved same-session A/B of the compaction-swap variants
(VERDICT r11 #1): `ivf_index_compact_embeddings` regressed 5.16→12.09s
r10→r11 on a round whose multijob calibration drifted 1.25×; before
accepting "machine noise" the judge asked for an interleaved A/B of

  A  r10 swap   : DROP TABLE + RENAME (2 catalog stmts), probe runs NO
                  recovery — the exact r10 code path.
  B  r11 swap   : crash-recoverable 3-rename swap_staged_table, probe
                  runs recover_staged_swap on EVERY call (3 tableExists
                  round-trips) — the exact r11 code path.
  C  r12 swap   : same swap, probe recovery memoized per (session,
                  table) with a single SHOW TABLES listing on first
                  call — the shipped r12 code path.

All three run the real registry bodies (`ivf_index_compact_embeddings`
and `ivf_index_probe_embeddings` from queries.py) with the warehouse
seams monkeypatched, interleaved ACBACB... so ambient drift within the
session hits every variant equally; min-of-N per (query, variant).

Usage: python tools/ab_swap_r12.py [n_rounds]   (default 3)
Prints one JSON line; also appended to R12_NOTES.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parcialbigdata_spark.queries import QUERIES  # noqa: E402
from parcialbigdata_spark.session import get_spark  # noqa: E402
from parcialbigdata_spark.sources import warehouse  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
QNAMES = ["ivf_index_compact_embeddings", "ivf_index_probe_embeddings"]

_real_swap = warehouse.swap_staged_table
_real_recover = warehouse.recover_staged_swap


def _r10_swap(spark, table):
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {table}__compact RENAME TO {table}")


def _no_recover(spark, table, once=False):
    return "noop"


def _r11_recover(spark, table, once=False):
    # r11 behavior: recovery every call, three tableExists round-trips.
    cat = spark.catalog
    live = cat.tableExists(table)
    old = cat.tableExists(f"{table}__old")
    stage = cat.tableExists(f"{table}__compact")
    assert live and not old and not stage  # steady state in this A/B
    return "noop"


VARIANTS = {
    "A_r10": (_r10_swap, _no_recover),
    "B_r11": (_real_swap, _r11_recover),
    "C_r12": (_real_swap, _real_recover),
}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab-swap-r12")
    # Warm-up: one untimed pass per query with the shipped code.
    for q in QNAMES:
        QUERIES[q](spark, SF_DIR).count()
        spark.catalog.clearCache()
    best: dict[str, dict[str, float]] = {q: {} for q in QNAMES}
    jvm_gc = spark.sparkContext._jvm.System.gc
    order = list(VARIANTS)
    for rnd in range(n):
        # Rotate the variant order per round so slot-in-session effects
        # (catalog growth, GC phase) hit every variant equally.
        rotated = order[rnd % len(order):] + order[: rnd % len(order)]
        for vname in rotated:
            swap, recover = VARIANTS[vname]
            warehouse.swap_staged_table = swap
            warehouse.recover_staged_swap = recover
            try:
                for q in QNAMES:
                    warehouse.reset_swap_recovery_memo()
                    t0 = time.perf_counter()
                    QUERIES[q](spark, SF_DIR).count()
                    dt = round(time.perf_counter() - t0, 3)
                    cur = best[q].get(vname)
                    best[q][vname] = dt if cur is None else min(cur, dt)
                    spark.catalog.clearCache()
                    jvm_gc()
            finally:
                warehouse.swap_staged_table = _real_swap
                warehouse.recover_staged_swap = _real_recover
    out = {"n_rounds": n, "sf_dir": SF_DIR, "min_sec": best}
    for q in QNAMES:
        a, b, c = (best[q][v] for v in ("A_r10", "B_r11", "C_r12"))
        out.setdefault("ratios", {})[q] = {
            "r11_vs_r10": round(b / a, 3),
            "r12_vs_r10": round(c / a, 3),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
