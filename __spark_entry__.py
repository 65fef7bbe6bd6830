"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in ``parcialbigdata_spark.queries`` — this
module only re-exports it plus a flagship ``entry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parcialbigdata_spark.queries import ORACLES, QUERIES

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1 shape (filter → partial+final hash agg) — the canonical
    full-scan aggregation, stable schema, 4-6 rows at any SF.
    """
    return QUERIES["q1_pricing_summary"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys without an oracle get the
    driver's weaker rows-only check (non-SQL-expressible ops)."""
    return dict(ORACLES)
