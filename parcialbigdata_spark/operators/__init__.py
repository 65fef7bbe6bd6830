from parcialbigdata_spark.operators import dedup, joins, similarity, skew

__all__ = ["dedup", "joins", "similarity", "skew"]
