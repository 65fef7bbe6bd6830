from parcialbigdata_spark.operators import dedup, joins, similarity

__all__ = ["dedup", "joins", "similarity"]
