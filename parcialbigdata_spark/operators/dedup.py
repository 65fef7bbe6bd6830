"""Deduplication operators for training-data pipelines (SURVEY.md §2.10).

Four families, all designed scale-first:

- **Exact**: hash-groupBy on a canonical fingerprint. One shuffle on the
  16-byte md5 — the minimum possible data movement for exact dedup.
- **MinHash + LSH**: word-shingle → k minhashes → b bands → candidate
  pairs share a band bucket → exact Jaccard verification. Signatures are
  computed with Spark's ``xxhash64`` inside higher-order functions — the
  whole signature stage is a narrow, codegen'd map (no UDF, no MLlib
  vector conversion). The only shuffle is the band-bucket self-join.
- **SimHash**: 64-bit sign-of-weighted-sum fingerprint, pure SQL
  (aggregate over token bit-vectors), banding on 16-bit chunks for
  candidate generation, ``bit_count(a XOR b)`` Hamming verification.
- **N-gram Jaccard**: exact Jaccard over distinct shingle sets, used as
  the verifier for LSH candidates, or brute within small blocks.

At 100 TB: the LSH self-joins shuffle on (band_index, band_hash); hot
buckets (boilerplate docs) are the classic skew source — AQE skew-join
splitting handles moderate skew, and ``max_bucket`` hard-caps
pathological buckets (dropping them is standard practice: a bucket with
10^5 identical-boilerplate docs is better handled by exact dedup first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parcialbigdata_spark.functions import text as T

# ---------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact duplicate removal (arbitrary survivor)."""
    return df.dropDuplicates(cols)


def canonical_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact text dedup with a deterministic survivor (min id per
    normalized-text fingerprint) and a duplicate count.

    One shuffle, on the md5 fingerprint — not the full text — so shuffle
    volume is O(16 bytes/doc) regardless of document size."""
    return (
        df.select(F.col(id_col), T.fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


# ------------------------------------------------------------- MinHash


def minhash_signature(text_col: Column | str, num_hashes: int = 32, k_shingle: int = 3) -> Column:
    """array<bigint> MinHash signature. Hash function *i* is
    ``xxhash64(i, shingle)`` — seeding by prepending the index column,
    which composes inside xxhash64's multi-argument chaining. All
    JVM-side; zero Python."""
    sh = T.shingles(text_col, k_shingle)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(i, s))),
    )


def _band_explode(
    df: DataFrame, id_col: str, sig_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """signature → (id, band_idx, band_hash) rows; band_hash is the hash
    of the band's signature slice so the shuffle key is 16 bytes."""
    rows_per_band = num_hashes // bands
    banded = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band_idx"),
            F.xxhash64(F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band)).alias(
                "band_hash"
            ),
        ),
    )
    return df.select(F.col(id_col), F.explode(banded).alias("band")).select(
        id_col, "band.band_idx", "band.band_hash"
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    k_shingle: int = 3,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) that share ≥1 LSH band.

    ``max_bucket`` drops degenerate buckets before the quadratic
    self-join — at web scale a single boilerplate bucket would otherwise
    emit billions of pairs."""
    sigs = df.select(
        F.col(id_col), minhash_signature(F.col(text_col), num_hashes, k_shingle).alias("sig")
    )
    bb = _band_explode(sigs, id_col, "sig", num_hashes, bands)
    if max_bucket:
        counts = bb.groupBy("band_idx", "band_hash").agg(F.count(F.lit(1)).alias("__n"))
        bb = bb.join(
            counts.filter(F.col("__n") <= max_bucket).drop("__n"),
            ["band_idx", "band_hash"],
            "inner",
        )
    a = bb.alias("a")
    b = bb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard(sh_a: Column, sh_b: Column) -> Column:
    """Exact Jaccard over two distinct-shingle arrays."""
    inter = F.size(F.array_intersect(sh_a, sh_b))
    union = F.size(F.array_union(sh_a, sh_b))
    return inter / F.greatest(union, F.lit(1))


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    k_shingle: int = 3,
) -> DataFrame:
    """LSH candidates verified by exact Jaccard ≥ threshold.
    Returns (id_a, id_b, jaccard_sim)."""
    cands = minhash_candidate_pairs(df, id_col, text_col, num_hashes, bands, k_shingle)
    sh = df.select(F.col(id_col), T.shingles(F.col(text_col), k_shingle).alias("sh"))
    out = (
        cands.join(sh.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}), "id_b")
        .select("id_a", "id_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard_sim"))
        .filter(F.col("jaccard_sim") >= threshold)
    )
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    k_shingle: int = 3,
    block_col: str | None = None,
    max_unblocked_rows: int = 20_000,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs, optionally blocked by
    ``block_col`` (e.g. language) to bound the quadratic term. Use
    ``minhash_near_dups`` when no natural block exists.

    Without ``block_col`` the join is O(n²); to prevent silently running
    an all-pairs join at scale, raises ``ValueError`` when the unblocked
    input exceeds ``max_unblocked_rows`` (set it to 0/None to override
    explicitly)."""
    if block_col is None and max_unblocked_rows:
        n = df.count()
        if n > max_unblocked_rows:
            raise ValueError(
                f"ngram_jaccard_pairs without block_col is O(n²); input has "
                f"{n} rows > max_unblocked_rows={max_unblocked_rows}. Pass a "
                f"block_col or use minhash_near_dups."
            )
    sh = df.select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        T.shingles(F.col(text_col), k_shingle).alias("sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(jaccard(F.col("a.sh"), F.col("b.sh")), 6).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


# ------------------------------------------------------------- SimHash


def simhash64(text_col: Column | str) -> Column:
    """64-bit SimHash, pure SQL: per-token 64-bit xxhash → ±1 bit vector
    → element-wise sum over tokens → sign bits packed into a bigint.
    A narrow map (aggregate over the row-local token array); the 64-lane
    fold stays inside codegen."""
    toks = T.tokens(T.normalize(text_col))
    weights = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("int"), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda b: F.when(
                    F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1)),
            ),
            lambda a, x: a + x,
        ),
    )
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(63)),
        F.lit(0).cast("bigint"),
        lambda acc, b: acc
        + F.when(
            F.element_at(weights, b + 1) > 0, F.shiftleft(F.lit(1).cast("bigint"), b)
        ).otherwise(F.lit(0).cast("bigint")),
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit hash into four 16-bit
    chunks — by pigeonhole any pair with Hamming distance ≤ 3 agrees on
    at least one chunk — join on chunk equality, verify exact Hamming.
    Returns (id_a, id_b, hamming)."""
    h = df.select(F.col(id_col), simhash64(F.col(text_col)).alias("sh"))
    chunks = h.select(
        id_col,
        "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda i: F.struct(
                    i.alias("chunk_idx"),
                    F.shiftright(F.col("sh"), i * 16)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("chunk_val"),
                ),
            )
        ).alias("c"),
    ).select(id_col, "sh", "c.chunk_idx", "c.chunk_val")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming64(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
