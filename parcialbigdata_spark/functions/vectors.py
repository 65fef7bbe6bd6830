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


def quantize_int8(a: Column | str) -> Column:
    """Symmetric int8 quantization: ``q_i = floor(x_i·127/scale + 0.5)``
    with ``scale = max|x|`` per vector (zero vectors quantize to zeros).
    ``floor(v + 0.5)`` instead of ``round`` because engines disagree on
    round-half ties while floor is exact — the DuckDB oracle replays
    this formula bit-for-bit. 4× memory cut for ANN indexes; pair with
    :func:`dequantize_int8` to audit the error."""
    a = F.col(a) if isinstance(a, str) else a
    scale = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))
    return F.when(scale == 0.0, F.transform(a, lambda x: F.lit(0))).otherwise(
        F.transform(
            a,
            lambda x: F.floor(x.cast("double") * F.lit(127.0) / scale + F.lit(0.5)).cast(
                "int"
            ),
        )
    )


def dequantize_int8(q: Column | str, scale: Column) -> Column:
    """Inverse of :func:`quantize_int8`: ``x̂_i = q_i·scale/127``."""
    q = F.col(q) if isinstance(q, str) else q
    return F.transform(q, lambda v: v.cast("double") * scale / F.lit(127.0))
