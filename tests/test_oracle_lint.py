"""Oracle-SQL lints that keep the DuckDB side of the correctness gate
compatible with the DRIVER's pandas-based kernel.

The class of bug this pins: DuckDB widens ``SUM(BIGINT)`` (plain and
windowed) to HUGEINT; pandas cannot hold HUGEINT, so the driver's
kernel materializes it as float64 and hashes ``7.0`` against Spark's
bigint ``7`` — rows and schema match, values "differ".  This cost a
red driver row in BOTH round 3 (``variant_event_props``) and round 4
(``concurrent_sessions_hourly``) while the repo's own fetchall-based
kernel stayed green, because ``fetchall()`` returns plain Python ints
for HUGEINT.  The lint makes the class impossible to reintroduce:
every registered oracle is DESCRIBE-bound against DuckDB and any
(U)HUGEINT output column fails the suite, and ``compare_query`` now
reports the same drift as a first-class problem string.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from parcialbigdata_spark.oracle import (
    compare_query,
    duckdb_fixture_connection,
    hugeint_columns,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_fixture_connection(SF_DIR)
    yield c
    c.close()


def test_no_hugeint_oracle_outputs(con):
    """Every registered oracle's declared result schema is HUGEINT-free
    (bind-only DESCRIBE across the whole registry — cheap)."""
    oracles = entry.oracle_sql()
    assert len(oracles) > 150  # the registry actually loaded
    offenders = {
        name: hug
        for name, sql in oracles.items()
        if (hug := hugeint_columns(con, sql))
    }
    assert offenders == {}, (
        "oracles with HUGEINT output columns (will hash as float64 at "
        f"the driver — CAST ... AS BIGINT): {offenders}"
    )


def test_all_oracles_describe_bindable(con):
    """DESCRIBE must actually bind for the registered oracles, so the
    HUGEINT lint above can't silently skip a mistyped statement.
    (hugeint_columns returns [] on bind failure by design; this test
    keeps that escape hatch honest.)"""
    unbound = []
    for name, sql in entry.oracle_sql().items():
        try:
            con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception:  # noqa: BLE001
            unbound.append(name)
    assert unbound == [], f"oracles DESCRIBE cannot bind: {unbound}"


def test_hugeint_lint_catches_uncast_sum(con):
    """A deliberately-uncast SUM(BIGINT) oracle trips the lint."""
    assert hugeint_columns(
        con, "SELECT SUM(o_orderkey) AS s FROM orders"
    ) == ["s: HUGEINT"]
    # Windowed sums widen too.
    assert hugeint_columns(
        con,
        "SELECT MAX(s) AS m FROM (SELECT SUM(CAST(1 AS BIGINT)) "
        "OVER (ORDER BY o_orderkey) AS s FROM orders)",
    ) == ["m: HUGEINT"]
    # And the cast fixes it.
    assert (
        hugeint_columns(
            con, "SELECT CAST(SUM(o_orderkey) AS BIGINT) AS s FROM orders"
        )
        == []
    )


def test_wide_decimal_lint_catches_r6_fingerprint_shape(con):
    """The exact oracle shape that went red in round 6
    (``table_fingerprint_reconcile``): a DECIMAL(38,0) output column
    is exact in fetchall() but float64 at the driver's pandas fetch,
    so 32205642394166 hashes as '3.22056e+13'. The widened lint now
    flags any DECIMAL with precision > 18."""
    assert hugeint_columns(
        con,
        "SELECT CAST(SUM(o_orderkey) AS DECIMAL(38,0)) AS fp FROM orders",
    ) == ["fp: DECIMAL(38,0)"]
    # Fractional wide decimals drift the same way.
    assert hugeint_columns(
        con, "SELECT CAST(1.5 AS DECIMAL(20,4)) AS x"
    ) == ["x: DECIMAL(20,4)"]
    # int64-sized decimals survive pandas exactly and stay unflagged,
    # as do BIGINT/DOUBLE casts (the sanctioned fixes).
    assert hugeint_columns(
        con, "SELECT CAST(SUM(o_totalprice) AS DECIMAL(18,2)) AS s FROM orders"
    ) == []
    assert hugeint_columns(
        con, "SELECT CAST(SUM(o_orderkey) AS BIGINT) AS s FROM orders"
    ) == []


def test_compare_query_reproduces_driver_float64_path(con, spark):
    """compare_query must hash the oracle through the driver's pandas
    dtype path: a wide-decimal fingerprint whose fetchall() value is
    the exact same integer as Spark's must STILL fail locally (it
    fails at the driver), so local green ⇒ driver green."""

    def fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from parcialbigdata_spark.sources.tables import load_table

        return load_table(spark, sf_dir, "orders").agg(
            F.sum("o_orderkey").cast("decimal(38,0)").alias("fp")
        )

    problems = compare_query(
        spark,
        con,
        fn,
        "SELECT CAST(SUM(o_orderkey) AS DECIMAL(38,0)) AS fp FROM orders",
        SF_DIR,
    )
    # Both the named lint and the behavioral hash catch it.
    assert any("float64" in p for p in problems), problems
    assert any("hash" in p for p in problems), problems


def test_compare_query_fails_on_hugeint_oracle(con, spark):
    """The full local gate — not just the standalone lint — rejects an
    uncast oracle even when rows, schema, and fetchall-values all
    match: the exact blind spot that let r3/r4 driver rows go red."""

    def fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from parcialbigdata_spark.sources.tables import load_table

        return load_table(spark, sf_dir, "orders").agg(
            F.sum("o_orderkey").alias("s")
        )

    problems = compare_query(
        spark, con, fn, "SELECT SUM(o_orderkey) AS s FROM orders", SF_DIR
    )
    assert any("HUGEINT" in p for p in problems), problems
    # With the cast, the same query is fully green.
    assert (
        compare_query(
            spark,
            con,
            fn,
            "SELECT CAST(SUM(o_orderkey) AS BIGINT) AS s FROM orders",
            SF_DIR,
        )
        == []
    )
