"""Write tests/plan_baseline.json: per-query physical-plan invariants.

For every registered non-streaming query, record the scale-relevant
plan facts worth locking: shuffle (exchange) count, row-Python usage,
and whether top-k compiles to TakeOrderedAndProject. The paired test
(tests/test_plan_regressions.py) fails any future change that ADDS a
shuffle or drops a query out of codegen — plan quality becomes a
regression-tested contract, not a one-time audit.

Usage: python tools/plan_baseline.py   (rewrites the baseline)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parcialbigdata_spark.plans.audit import (  # noqa: E402
    audit_build_plans,
    audit_plan,
    capture_checkpoint_builds,
)
from parcialbigdata_spark.queries import QUERIES  # noqa: E402
from parcialbigdata_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "plan_baseline.json")


def main() -> int:
    spark = get_spark("plan-baseline")
    baseline: dict[str, dict] = {}
    for name, fn in sorted(QUERIES.items()):
        if name.startswith("streaming_"):
            continue  # audited post-drain in PLANS.md; not plan-stable pre-execution
        try:
            with capture_checkpoint_builds() as probes:
                df = fn(spark, SF_DIR)
            audit = audit_plan(df)
            build = audit_build_plans(probes)
            spark.catalog.clearCache()
        except Exception as exc:  # pragma: no cover - diagnostic path
            print(f"SKIP {name}: {exc}")
            continue
        baseline[name] = {
            "n_exchanges": audit["n_exchanges"],
            "has_python_row_udf": audit["has_python_row_udf"],
            "top_k": audit["top_k"],
            # Build phases hidden behind localCheckpoint LogicalRDDs —
            # without these the gate was blind to shuffle regressions
            # in the most expensive operators' build stage.
            "n_build_probes": build["n_build_probes"],
            "n_build_exchanges": build["n_build_exchanges"],
        }
        print(
            f"{name}: exch={audit['n_exchanges']} topk={audit['top_k']} "
            f"build={build['n_build_probes']}:{build['n_build_exchanges']}"
        )
    with open(OUT, "w") as fh:
        json.dump(baseline, fh, indent=1, sort_keys=True)
    print(f"wrote {OUT} ({len(baseline)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
