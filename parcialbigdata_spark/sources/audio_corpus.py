"""Deterministic 10k-clip WAV corpus for aHash scale measurement
(r13, VERDICT r12 #5): `wav_near_dup_media` runs the banded Hamming
join on five committed fixtures, which measures the PCM decode kernel
+ join OVERHEAD but not its scale behavior. This corpus is the
measured path — the audio mirror of ``phash_corpus`` (r12, VERDICT
r11 #7): ~10k distinct mono 16-bit PCM clips (65 frames × 126 samples
at 8 kHz, the committed fixtures' exact shape) with ~1k planted
near-dup pairs, generated on first use into a local cache
(deterministic — same bytes every run, no commit of ~160 MB of audio
into the repo).

Clip family: per-clip sine tones ``s(t) = A·sin(2π·f·t/RATE + φ)``
shaped by a PER-FRAME gain ladder — 65 gains in [0.2, 1.0] drawn from
a seeded splitmix64 of (clip index, frame) — so adjacent-frame energy
comparisons are effectively independent coin flips and the 64-bit
aHashes scatter across the space (a smooth linear envelope would make
the contour monotone, collapsing 10k clips into a handful of
near-identical hashes and a quadratic candidate blowup — measured:
2.26M "pairs"). Every 10th clip is a near-dup of its
predecessor: ONE frame-sized segment boosted 1.6× with clamp (the
same construction as the committed ``tone_a_dup`` fixture — perturbs
one frame's energy, flipping at most the two adjacent contour
comparisons, Hamming ≤ 3 with high probability so the 4×16-band
pigeonhole recall contract is exercised at corpus scale). Amplitudes
are capped so the boosted segment cannot clip (A ≤ 17000, gain ≤ 1.0,
17000·1.0·1.6 < 32767).

Correctness of the operator stays pinned by the committed fixtures
and their full sample-replay DuckDB oracles; this corpus exists to
measure decode throughput and candidate-join behavior at 2000× the
fixture count, so it is bench-only (no registry/oracle entry — the
registry keeps zero rows-only entries)."""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession

RATE = 8000
N_SAMPLES = 8190  # 65 frames × 126 samples — the fixtures' shape
FRAME = 126
DEFAULT_PATH = "/tmp/audio_corpus_10k.parquet"


def _mix(i: int, salt: int) -> int:
    # splitmix64 — deterministic, well-scattered per-clip params
    z = (i * 0x9E3779B97F4A7C15 + salt) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


_HDR_FMT = struct.pack("<IHHIIHH", 16, 1, 1, RATE, RATE * 2, 2, 16)


def _wav_bytes(i: int, dup_of: "int | None") -> bytes:
    """Canonical 44-byte-header mono 16-bit PCM WAV for clip index
    ``i`` (numpy-vectorized synthesis)."""
    import numpy as np

    src = i if dup_of is None else dup_of
    f = 150.0 + _mix(src, 11) % 1200
    amp = 5000 + _mix(src, 22) % 12000
    phase = (_mix(src, 33) % 6283) / 1000.0
    # per-frame gain ladder: 65 independent gains in [0.2, 1.0] so the
    # energy contour's adjacent comparisons scatter the hash space
    gains = np.array(
        [0.2 + (_mix(src, 70 + fr) % 800) / 1000.0 for fr in range(65)]
    )
    t = np.arange(N_SAMPLES, dtype=np.float64)
    env = np.repeat(gains, FRAME)
    s = amp * np.sin(2.0 * np.pi * f * t / RATE + phase) * env
    if dup_of is not None:
        # boost one frame-sized segment — the near-dup perturbation
        k = 5 + _mix(i, 66) % 55
        s[k * FRAME:(k + 1) * FRAME] *= 1.6
    pcm = np.clip(s, -32768, 32767).astype("<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + _HDR_FMT
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


def ensure_audio_corpus(
    spark: SparkSession, path: str = DEFAULT_PATH, n: int = 10_000
) -> DataFrame:
    """Return the (file_name, content) corpus DataFrame, generating the
    parquet cache on first use (~160 MB, ~10 s, deterministic).
    Every ``i % 10 == 9`` clip is a near-dup of clip ``i-1``."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        rows = [
            (
                f"clip_{i:05d}.wav",
                bytearray(_wav_bytes(i, i - 1 if i % 10 == 9 else None)),
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "file_name string, content binary")
        df.repartition(8).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
