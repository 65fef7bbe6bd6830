"""Similarity search over embedding columns (SURVEY.md §2.10).

Two paths:

- **Brute-force cosine top-k** — the exactness baseline. The query
  vector is a broadcast literal; scoring is a narrow codegen'd map over
  the table (``F.aggregate``/``F.zip_with`` dot product, no UDF), then
  ``TakeOrderedAndProject`` for the top-k. At 100 TB this is one full
  scan, embarrassingly parallel, zero shuffle besides the final top-k
  tree-reduce — often the right answer even at scale when k is small.
- **Random-hyperplane LSH (SimHash for vectors)** — the sub-linear
  path: 16 sign bits bucket each vector; a query probes its own bucket
  (plus optional multi-probe neighbors at Hamming 1). Candidate set
  shrinks ~2^16× before exact rescoring. Buckets are plain integers →
  the table can be written bucketed/partitioned by them, turning ANN
  lookups into partition-pruned scans.

Hyperplanes are deterministic (seeded) and embedded as literal arrays —
they are part of the index definition, not data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parcialbigdata_spark.functions import vectors as V

DEFAULT_NBITS = 16
_SEED = 42


def _planes(dim: int, nbits: int = DEFAULT_NBITS, seed: int = _SEED) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).tolist()


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. Ties broken by
    id for determinism. Plan: scan → project → TakeOrderedAndProject."""
    q = _lit_vec(query_vec)
    scored = df.select(
        F.col(id_col),
        F.round(V.cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def hyperplane_bucket(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Pack sign(v·h_i) bits into an int bucket id. Pure SQL fold."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        bit = F.when(V.dot(vec, _lit_vec(plane)) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def add_lsh_bucket(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64, nbits: int = DEFAULT_NBITS
) -> DataFrame:
    return df.withColumn("lsh_bucket", hyperplane_bucket(vec_col, _planes(dim, nbits)))


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 8,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: restrict to the query's LSH bucket (plus all
    Hamming-1 neighbor buckets when ``multiprobe``), then exact rescore.
    ``nbits=8`` → 256 buckets; tune up with corpus size. The bucket
    filter is a pushed-down integer predicate when the table is stored
    partitioned by bucket."""
    planes = _planes(len(query_vec), nbits)
    q = np.asarray(query_vec, dtype=np.float64)
    qbucket = 0
    for i, plane in enumerate(planes):
        if float(np.dot(q, np.asarray(plane))) > 0:
            qbucket |= 1 << i
    probes = [qbucket] + ([qbucket ^ (1 << i) for i in range(nbits)] if multiprobe else [])

    bucketed = df.withColumn("lsh_bucket", hyperplane_bucket(vec_col, planes))
    cand = bucketed.filter(F.col("lsh_bucket").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nbits: int = DEFAULT_NBITS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH blocking: vectors
    sharing a 16-bit hyperplane bucket are candidates (cos ≥ 0.95 pairs
    collide with high probability); exact cosine verifies. One shuffle
    on the integer bucket."""
    b = add_lsh_bucket(df.select(id_col, vec_col), vec_col, dim, nbits)
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(
            r,
            (F.col("l.lsh_bucket") == F.col("r.lsh_bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round(V.cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
