"""Vector math over ``array<float>`` columns — pure SQL expressions.

All operations stay inside Catalyst/codegen (``F.aggregate`` /
``F.zip_with`` higher-order functions): no Python UDF, no serialization,
so they scale linearly with executor count. Elements are cast to double
before folding so results are bit-deterministic across engines
(float32 accumulation would not be).

Capability target SURVEY.md §2.10 (embedding similarity search); the
reference has no vector surface (SURVEY.md §2.7 F5 is EXT).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length float arrays, folded left-to-right
    in double precision (deterministic order → reproducible bits)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column | str) -> Column:
    """L2 norm."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe only insofar as inputs are non-null."""
    return dot(a, b) / (norm2(a) * norm2(b))
