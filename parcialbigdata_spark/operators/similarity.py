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


def _seq_dot(a: list[float], b: list[float]) -> float:
    """Driver-side dot product with the SAME left-to-right double fold
    Spark's ``F.aggregate`` uses — np.dot's pairwise/SIMD summation can
    flip the sign of near-zero sums vs the sequential fold, putting the
    query in a different bucket than an identical data vector."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


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
    partitioned by bucket.

    Raises ``ValueError`` if the table's vector length differs from
    ``len(query_vec)`` — a silent mismatch would null-pad ``zip_with``,
    NULL every dot product, and drop all rows into bucket 0."""
    dim = len(query_vec)
    sample = df.select(F.size(F.col(vec_col)).alias("n")).first()
    if sample is not None and sample["n"] != dim:
        raise ValueError(
            f"query_vec has dim {dim} but {vec_col} rows have dim {sample['n']}"
        )
    planes = _planes(dim, nbits)
    qbucket = 0
    for i, plane in enumerate(planes):
        if _seq_dot(query_vec, plane) > 0:
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
    bits_per_band: int = 8,
    num_bands: int = 8,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded hyperplane LSH.

    A single wide bucket has poor recall: with 16 bits, cos=0.95 pairs
    collide with P = (1-θ/π)^16 ≈ 0.18. Instead we use ``num_bands``
    independent bands of ``bits_per_band`` hyperplanes each and take the
    OR (same banding trade as MinHash LSH): recall at cos=0.95 is
    1-(1-0.899^8)^8 ≈ 0.99 with the 8×8 defaults. Candidates sharing any
    band bucket are verified with exact cosine.

    ``max_bucket`` drops degenerate buckets (zero vectors, mode-collapsed
    embeddings) before the quadratic self-join — same cap as the MinHash
    path. Shuffle key is (band_idx, band_hash): two ints."""
    planes = _planes(dim, bits_per_band * num_bands)
    base = df.select(id_col, vec_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                hyperplane_bucket(
                    F.col(vec_col), planes[b * bits_per_band : (b + 1) * bits_per_band]
                ).alias("band_hash"),
            )
            for b in range(num_bands)
        ]
    )
    bb = base.select(F.col(id_col), F.explode(bands).alias("band")).select(
        id_col, "band.band_idx", "band.band_hash"
    )
    if max_bucket:
        counts = bb.groupBy("band_idx", "band_hash").agg(F.count(F.lit(1)).alias("__n"))
        bb = bb.join(
            counts.filter(F.col("__n") <= max_bucket).drop("__n"),
            ["band_idx", "band_hash"],
            "inner",
        )
    a, b = bb.alias("a"), bb.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    vecs = base.withColumnsRenamed({id_col: "id_a", vec_col: "__v_a"})
    vecs_b = base.withColumnsRenamed({id_col: "id_b", vec_col: "__v_b"})
    return (
        cands.join(vecs, "id_a")
        .join(vecs_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(V.cosine(F.col("__v_a"), F.col("__v_b")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
