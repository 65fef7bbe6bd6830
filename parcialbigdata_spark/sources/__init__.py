from parcialbigdata_spark.sources import binary, warehouse
from parcialbigdata_spark.sources.tables import TABLES, load_table, load_tables, register_views

__all__ = ["TABLES", "binary", "load_table", "load_tables", "register_views", "warehouse"]
