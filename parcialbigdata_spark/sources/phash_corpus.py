"""Deterministic 10k-image PNG corpus for phash scale measurement
(r12, VERDICT r11 #7): `png_near_dup_media` runs the banded Hamming
join on a handful of committed fixtures, which measures the decode
kernel + join OVERHEAD but not its scale behavior. This corpus is the
measured path: ~10k distinct 48×32 RGB PNGs with ~1k planted near-dup
pairs, generated on first use into a local cache (deterministic — same
bytes every run, no commit of ~25 MB of images into the repo).

Image family: per-image linear-gradient channels
``ch(x, y) = (x·a + y·b + c) mod 256`` with (a, b, c) drawn from a
seeded xxhash-style mix of the image index — visually distinct images
whose dHashes scatter across the 64-bit space. Every 10th image is a
near-dup of its predecessor (one grid-cell-sized region darkened, the
same construction as the committed `grad_a_dup` fixture — flips a few
adjacent-cell comparisons, Hamming ≤ 3 with high probability so the
4×16-band pigeonhole recall contract is exercised at corpus scale).

Correctness of the operator stays pinned by the committed small
fixtures and their full-pixel-replay DuckDB oracles; this corpus
exists to measure throughput and candidate-join behavior at 2000×
the fixture count, so it is bench-only (no registry/oracle entry —
the registry keeps zero rows-only entries)."""

from __future__ import annotations

import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession

W, H = 48, 32
DEFAULT_PATH = "/tmp/phash_corpus_10k.parquet"

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _mix(i: int, salt: int) -> int:
    # splitmix64 — deterministic, well-scattered per-image params
    z = (i * 0x9E3779B97F4A7C15 + salt) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _png_bytes(i: int, dup_of: int | None) -> bytes:
    """48×32 RGB PNG for image index ``i`` (numpy-vectorized raw
    scanlines, filter 0, default zlib level — the DECODER's general
    path, unlike the stored-block oracle fixtures)."""
    import numpy as np

    src = i if dup_of is None else dup_of
    params = [
        (
            1 + _mix(src, 1000 + ch) % 13,
            1 + _mix(src, 2000 + ch) % 11,
            _mix(src, 3000 + ch) % 256,
        )
        for ch in range(3)
    ]
    x = np.arange(W, dtype=np.int64)[None, :]
    y = np.arange(H, dtype=np.int64)[:, None]
    chans = [
        ((x * a + y * b + c) % 256).astype(np.uint8) for a, b, c in params
    ]
    img = np.stack(chans, axis=-1)  # H×W×3
    if dup_of is not None:
        # darken one ~cell-sized region — the near-dup perturbation
        x0 = (_mix(i, 4000) % (W - 8))
        y0 = (_mix(i, 5000) % (H - 6))
        region = img[y0:y0 + 6, x0:x0 + 8].astype(np.int16)
        img[y0:y0 + 6, x0:x0 + 8] = np.maximum(region - 90, 0).astype(np.uint8)
    raw = np.concatenate(
        [np.zeros((H, 1), dtype=np.uint8), img.reshape(H, W * 3)], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def ensure_phash_corpus(
    spark: SparkSession, path: str = DEFAULT_PATH, n: int = 10_000
) -> DataFrame:
    """Return the (file_name, content) corpus DataFrame, generating the
    parquet cache on first use (~25 MB, a few seconds, deterministic).
    Every ``i % 10 == 9`` image is a near-dup of image ``i-1``."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        rows = [
            (
                f"img_{i:05d}.png",
                bytearray(_png_bytes(i, i - 1 if i % 10 == 9 else None)),
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "file_name string, content binary")
        df.repartition(8).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
