"""Spark SQL facade: run ad-hoc SQL over the fixture warehouse.

The engine is DataFrame-first (Catalyst sees the same plans either
way), but an analytics engine's users expect a SQL entry point:
``run_sql`` registers every fixture table as a temp view and hands the
string to ``spark.sql``. Views are lazy — registering all ten costs
only catalog entries, and unreferenced tables are never scanned, so
this is exactly as scalable as the DataFrame path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parcialbigdata_spark.sources.tables import register_views


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register fixture views for ``sf_dir`` and run ``query``."""
    register_views(spark, sf_dir)
    return spark.sql(query)
