from parcialbigdata_spark.operators import (
    dedup,
    diagnostics,
    incremental,
    joins,
    sampling,
    similarity,
    skew,
)

__all__ = [
    "dedup",
    "diagnostics",
    "incremental",
    "joins",
    "sampling",
    "similarity",
    "skew",
]
