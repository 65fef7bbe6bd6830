"""Continuous oracle verification for the queries PAST the driver's
50-entry CORRECTNESS sampling window.

The driver's per-round gate checks exactly the first 50 ``queries()``
entries (the curated ``_DRIVER_WINDOW``); everything registered after
that would otherwise have no recurring hard signal. This module runs
each out-of-window query through the SAME compare protocol
(rows + schema + order-insensitive value hash vs DuckDB) at sf0.01,
so ``pytest tests/`` keeps the whole registry verified every round.

In-window queries are deliberately excluded — the driver itself checks
those — to keep suite runtime bounded.
"""

from __future__ import annotations

import os

import pytest

from parcialbigdata_spark.oracle import compare_query, duckdb_fixture_connection
from parcialbigdata_spark.queries import _DRIVER_WINDOW, ORACLES, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

OUT_OF_WINDOW = [n for n in QUERIES if n not in set(_DRIVER_WINDOW)]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"fixture dir {SF_DIR} not available"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb_fixture_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", OUT_OF_WINDOW)
def test_out_of_window_query_matches_oracle(spark, duck, name):
    problems = compare_query(spark, duck, QUERIES[name], ORACLES.get(name), SF_DIR)
    assert not problems, f"{name}: {'; '.join(problems)}"


def test_driver_window_is_exactly_the_first_50():
    """The curated window must actually occupy registry positions 1-50
    (the reorder runs at import time; a regression here silently wastes
    the driver's sampling window)."""
    assert list(QUERIES)[:50] == _DRIVER_WINDOW
    assert len(_DRIVER_WINDOW) == 50
    # Every window entry except deliberate rows-only ones carries an oracle.
    assert all(n in ORACLES for n in _DRIVER_WINDOW), [
        n for n in _DRIVER_WINDOW if n not in ORACLES
    ]


def test_compare_kernel_detects_mismatches(spark):
    """The gate itself must be falsifiable: wrong values, wrong schema,
    and wrong row counts each produce a non-empty problem list (guards
    against a silently-green compare kernel)."""
    from parcialbigdata_spark.oracle import compare_query, duckdb_fixture_connection

    con = duckdb_fixture_connection("/root/testdata/sf0.001")

    def q_ok(s, d):
        return s.createDataFrame([(1, "a")], "k long, v string")

    assert compare_query(spark, con, q_ok, "SELECT 1 AS k, 'a' AS v", "") == []
    assert compare_query(spark, con, q_ok, "SELECT 1 AS k, 'b' AS v", "") == [
        "value-hash mismatch"
    ]
    assert any(
        "schema" in p
        for p in compare_query(spark, con, q_ok, "SELECT 1 AS k, 'a' AS w", "")
    )
    assert any(
        "rows" in p
        for p in compare_query(
            spark, con, q_ok, "SELECT 1 AS k, 'a' AS v UNION ALL SELECT 2, 'c'", ""
        )
    )
