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

from parcialbigdata_spark.plans.audit import (
    audit_build_plans,
    audit_executed_plan,
    audit_plan,
    capture_checkpoint_builds,
)
from parcialbigdata_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
BASELINE = json.loads(
    (pathlib.Path(__file__).parent / "plan_baseline.json").read_text()
)


@pytest.mark.parametrize("name", sorted(BASELINE))
def test_plan_not_regressed(spark, name):
    expect = BASELINE[name]
    with capture_checkpoint_builds() as probes:
        df = QUERIES[name](spark, SF_DIR)
    audit = audit_plan(df)
    build = audit_build_plans(probes)
    spark.catalog.clearCache()
    assert audit["n_exchanges"] <= expect["n_exchanges"], (
        f"{name}: plan gained shuffles "
        f"({expect['n_exchanges']} -> {audit['n_exchanges']})"
    )
    assert not audit["has_python_row_udf"], f"{name}: fell into row-Python"
    assert not build["has_build_python_row_udf"], (
        f"{name}: build phase fell into row-Python"
    )
    # The build phases a localCheckpoint hides behind a LogicalRDD —
    # the r4 gate recorded setsim_join_documents as 0 scans/0 shuffles
    # and could not catch a regression in its shingle build.
    assert build["n_build_exchanges"] <= expect.get(
        "n_build_exchanges", build["n_build_exchanges"]
    ), (
        f"{name}: build phase gained shuffles "
        f"({expect.get('n_build_exchanges')} -> {build['n_build_exchanges']})"
    )
    if expect["top_k"]:
        assert audit["top_k"], f"{name}: lost TakeOrderedAndProject"


# Representative AQE queries whose final executed plan must keep
# non-zero whole-stage-codegen coverage (pre-execution explain shows 0
# = "deferred" for every AQE plan, so only an executed audit can
# assert this).
_WSC_SAMPLE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "top_customers_revenue",
    "rollup_revenue_region_nation",
    "window_top_orders_per_customer",
    "token_budget_by_source",
    "text_metrics_by_lang",
    "asof_latest_order_before_event",
]


@pytest.mark.parametrize("name", _WSC_SAMPLE)
def test_executed_plan_keeps_codegen(spark, name):
    audit = audit_executed_plan(QUERIES[name](spark, SF_DIR))
    spark.catalog.clearCache()
    assert audit["n_codegen_spans"] > 0, (
        f"{name}: executed final plan has no WholeStageCodegen span — "
        "the hot path fell out of codegen"
    )


def test_every_query_in_baseline_or_streaming():
    """New queries must be added to the baseline (run tools/plan_baseline.py)."""
    missing = [
        n for n in QUERIES if n not in BASELINE and not n.startswith("streaming_")
    ]
    assert not missing, f"queries missing from plan_baseline.json: {missing}"
