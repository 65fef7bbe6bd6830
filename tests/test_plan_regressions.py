"""Plan-quality regression gate: every registered query's physical plan
must not gain shuffles, fall into row-at-a-time Python, or lose its
TakeOrderedAndProject relative to tests/plan_baseline.json.

Regenerate the baseline intentionally with `python tools/plan_baseline.py`
when a plan change is a deliberate improvement (fewer exchanges always
passes without regenerating)."""

from __future__ import annotations

import json
import pathlib

import pytest

from parcialbigdata_spark.plans.audit import audit_plan
from parcialbigdata_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
BASELINE = json.loads(
    (pathlib.Path(__file__).parent / "plan_baseline.json").read_text()
)


@pytest.mark.parametrize("name", sorted(BASELINE))
def test_plan_not_regressed(spark, name):
    expect = BASELINE[name]
    audit = audit_plan(QUERIES[name](spark, SF_DIR))
    assert audit["n_exchanges"] <= expect["n_exchanges"], (
        f"{name}: plan gained shuffles "
        f"({expect['n_exchanges']} -> {audit['n_exchanges']})"
    )
    assert not audit["has_python_row_udf"], f"{name}: fell into row-Python"
    if expect["top_k"]:
        assert audit["top_k"], f"{name}: lost TakeOrderedAndProject"


def test_every_query_in_baseline_or_streaming():
    """New queries must be added to the baseline (run tools/plan_baseline.py)."""
    missing = [
        n for n in QUERIES if n not in BASELINE and not n.startswith("streaming_")
    ]
    assert not missing, f"queries missing from plan_baseline.json: {missing}"
