"""Smoke tests for the TPC-H query-shape sweep (parcialbigdata_spark/tpch.py).

Full value-level verification runs against the DuckDB oracle via
tools/check_correctness.py (and the driver gate) at sf0.01; these
tests assert each query plans and executes at sf0.001 and that the
shapes with guaranteed output produce rows.
"""

from __future__ import annotations

import pytest

from parcialbigdata_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

TPCH_QUERIES = [
    "q4_order_priority",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q10_returned_items",
    "q11_important_suppliers",
    "q12_priority_by_linestatus",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q18_large_volume_orders",
    "q19_bracket_revenue",
    "q20_red_part_suppliers",
    "q21_sole_supplier_orders",
    "q22_idle_customers",
]

# Shapes whose output can be legitimately empty at tiny SF (threshold
# tuned for sf0.01): the scalar-subquery HAVING cut, the time-scoped
# anti join, and the doubly-selective nation-pair filter. Everything
# else must return rows even at sf0.001.
MAY_BE_EMPTY = {
    "q7_nation_volume",
    "q11_important_suppliers",
    "q18_large_volume_orders",
    "q22_idle_customers",
}


@pytest.mark.parametrize("name", TPCH_QUERIES)
def test_tpch_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    rows = df.collect()
    assert df.columns, name
    if name not in MAY_BE_EMPTY:
        assert rows, f"{name} returned no rows at sf0.001"


def test_q14_promo_share_bounded(spark):
    row = QUERIES["q14_promo_revenue"](spark, SF_DIR).first()
    assert 0.0 <= row["promo_revenue"] <= 100.0


def test_q15_top_supplier_is_argmax(spark):
    # Every returned supplier must hold the max revenue (ties allowed).
    rows = QUERIES["q15_top_supplier"](spark, SF_DIR).collect()
    assert rows
    revs = {r["total_revenue"] for r in rows}
    assert len(revs) == 1
