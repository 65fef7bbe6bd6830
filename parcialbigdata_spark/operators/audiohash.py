"""Audio perceptual-hash (energy-contour aHash) near-duplicate
detection — the AUDIO member of the multimodal dedup family (r12;
SURVEY.md §2.10 N5×N2, the WAV twin of ``operators/phash.py``'s image
dHash). PCM inside a canonical WAV is genuinely decodable with stdlib
``struct`` — unlike the deliberately-stubbed lossy codecs — so this
path is REAL end to end, like the PNG pixel pipeline.

The hash: 16-bit PCM samples map onto 65 equal time frames
(sample i → frame ``(i*65)//n`` — the 1-D analog of the dHash cell
grid), each frame's energy is the integer sum of absolute sample
values, and the 64 adjacent-frame comparisons ``energy[m] <
energy[m+1]`` pack into four 16-bit bands (bit m → band ``m//16``,
position ``15 − m%16`` — the exact packing the image hash uses, so the
banded join layer is SHARED). Properties that make it a *perceptual*
hash: invariant under uniform gain change (scaling every sample scales
every energy, preserving all comparisons — pinned by test), and stable
under local edits that move less than a frame's energy ordering, while
md5-exact dedup sees completely different bytes.

Determinism/oracle discipline: every step is integer-exact and
SQL-replayable — the committed fixtures (tools/gen_audiohash_fixtures
.py) are canonical 44-byte-header mono 16-bit WAVs whose samples a
DuckDB oracle reads straight out of the blob hex (little-endian
two's-complement reassembly) and replays through identical arithmetic.

Scale design: 8 bytes of hash state per clip; decode is
embarrassingly parallel ``mapInPandas`` (payload bytes never leave the
executor). Candidate generation REUSES :func:`phash.dhash_near_dups`
verbatim — band equality join, pigeonhole-complete at Hamming ≤ 3,
per-band ``bit_count`` verification, never an all-pairs product.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from parcialbigdata_spark.operators.phash import dhash_near_dups

N_FRAMES = 65  # 64 adjacent-energy comparisons = 4 × 16-bit bands
N_BANDS = 4

AHASH_SCHEMA = (
    "file_name string, n_samples bigint, "
    "b0 int, b1 int, b2 int, b3 int, ahash_hex string"
)


def _decode_wav_channels(b: bytes):
    """bytes -> list of per-CHANNEL int16 sample arrays, or None when
    not an uncompressed 16-bit PCM WAV (the guard: wrong magic,
    non-PCM format tag, non-16-bit width, or fewer frames than the
    65-frame contour needs).

    r14: samples come out of ONE ``np.frombuffer`` view + reshape per
    clip instead of a per-sample ``struct.unpack_from`` Python loop —
    the same little-endian two's-complement values (pinned by the
    kernel tests and the hex-replay oracles), at memcpy speed instead
    of ~1 µs/sample of interpreter dispatch. The header chunk walk
    stays a Python loop: a WAV has a handful of chunks, not millions."""
    import struct

    import numpy as np

    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        ctype = b[pos:pos + 4]
        (ln,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = b[pos + 8:pos + 8 + ln]
        if ctype == b"fmt " and ln >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_format, channels, _, _, _, bits = fmt
    if audio_format != 1 or bits != 16 or channels < 1:
        return None
    stride = 2 * channels
    n = len(data) // stride
    if n < N_FRAMES:
        return None
    frames = np.frombuffer(bytes(data[: n * stride]), dtype="<i2").reshape(
        n, channels
    )
    return [frames[:, c] for c in range(channels)]


def _decode_wav_pcm16(b: bytes):
    """bytes -> channel-0 16-bit samples, or None (the historical
    single-channel view; multi-channel callers use
    :func:`_decode_wav_channels`)."""
    chans = _decode_wav_channels(b)
    return None if chans is None else chans[0]


def wav_ahash_bands(b: bytes):
    """bytes -> (n_samples, [b0..b3]) or None. The exact integer
    pipeline the DuckDB oracle replays: frame f = (i*65)//n, energy =
    sum(abs(sample)), bit m = energy[m] < energy[m+1], band m//16
    collects bit << (15 − m%16)."""
    samples = _decode_wav_pcm16(b)
    if samples is None:
        return None
    return _bands_of(samples)


def _bands_of(samples):
    """The shared 65-frame energy-contour → 4-band packing.

    r14, vectorized with EXACT integer arithmetic: sample i belongs to
    frame ``(i·65)//n``, which is monotone in i, so frame f starts at
    ``ceil(f·n/65)`` and the 65 frame energies are one
    ``np.add.reduceat`` over the |int64| samples (bit-identical to the
    per-sample accumulation loop this replaces — int64 sums, no float
    path); the 64 adjacent comparisons pack per 16-bit band via an
    integer dot with the bit weights. n ≥ 65 (caller guard) makes the
    frame starts strictly increasing, which reduceat requires."""
    import numpy as np

    s = np.abs(np.asarray(samples, dtype=np.int64))
    n = int(s.shape[0])
    starts = (np.arange(N_FRAMES, dtype=np.int64) * n + N_FRAMES - 1) // N_FRAMES
    energy = np.add.reduceat(s, starts)
    bits = (energy[:-1] < energy[1:]).astype(np.int64)
    weights = np.int64(1) << (15 - np.arange(16, dtype=np.int64))
    bands = [int(bits[j * 16:(j + 1) * 16] @ weights) for j in range(N_BANDS)]
    return n, bands


def wav_ahash_channel_bands(b: bytes):
    """bytes -> [(channel, n_samples, [b0..b3])] — one aHash per
    CHANNEL (r14, VERDICT r13 #7): the channel-0 hash is blind to a
    stereo dupe whose channels were swapped (L↔R remaster, a common
    re-encode), so per-channel rows let the banded join catch channel
    c of one file against channel c' of another."""
    chans = _decode_wav_channels(b)
    if chans is None:
        return None
    out = []
    for c, samples in enumerate(chans):
        n, bands = _bands_of(samples)
        out.append((c, n, bands))
    return out


CHANNEL_AHASH_SCHEMA = (
    "file_name string, channel int, n_samples bigint, "
    "b0 int, b1 int, b2 int, b3 int, ahash_hex string"
)


def _ahash_channel_batches(batches: Iterator) -> Iterator:
    import pandas as pd

    cols = ["file_name", "channel", "n_samples",
            "b0", "b1", "b2", "b3", "ahash_hex"]

    def rows(name: str, content: bytes) -> "list[dict]":
        r = wav_ahash_channel_bands(bytes(content))
        if r is None:
            return []
        return [
            {
                "file_name": name, "channel": c, "n_samples": n,
                "b0": bands[0], "b1": bands[1],
                "b2": bands[2], "b3": bands[3],
                "ahash_hex": "".join(f"{v:04x}" for v in bands),
            }
            for c, n, bands in r
        ]

    for pdf in batches:
        out = []
        for n, c in zip(pdf["file_name"], pdf["content"]):
            out.extend(rows(n, c))
        yield pd.DataFrame(out, columns=cols)


def wav_ahash_channels(df: DataFrame) -> DataFrame:
    """(file_name, content, …) -> one aHash row per (file, CHANNEL) of
    each decodable 16-bit PCM WAV — the stereo-aware sibling of
    :func:`wav_ahash`. Arrow-batched ``mapInPandas``; payloads never
    leave the executor; at 100 TB this multiplies hash rows by the
    channel count (2 for stereo) while decode stays once-per-blob."""
    return df.select("file_name", "content").mapInPandas(
        _ahash_channel_batches, CHANNEL_AHASH_SCHEMA
    )


def ahash_channel_near_dups(hashes: DataFrame,
                            max_hamming: int = 3) -> DataFrame:
    """Banded Hamming near-dup pairs over PER-CHANNEL hashes:
    (file, channel) becomes the join entity — a composite key through
    the SAME shared band join (``dhash_near_dups``), split back into
    (file_a, chan_a, file_b, chan_b, hamming) — so an L/R-swapped
    stereo dupe is caught by channel 0 matching the other file's
    channel 1. Same-file cross-channel pairs (self-similar L and R)
    surface too; callers filter if unwanted."""
    ent = hashes.select(
        F.concat_ws("#", "file_name", "channel").alias("file_name"),
        "b0", "b1", "b2", "b3",
    )
    pairs = dhash_near_dups(ent, max_hamming=max_hamming)
    split_a = F.split(F.col("file_a"), "#")
    split_b = F.split(F.col("file_b"), "#")
    return pairs.select(
        F.element_at(split_a, 1).alias("file_a"),
        F.element_at(split_a, 2).cast("int").alias("chan_a"),
        F.element_at(split_b, 1).alias("file_b"),
        F.element_at(split_b, 2).cast("int").alias("chan_b"),
        "hamming",
    )


def _ahash_batches(batches: Iterator) -> Iterator:
    import pandas as pd

    def one(name: str, content: bytes) -> dict:
        r = wav_ahash_bands(bytes(content))
        if r is None:
            return {
                "file_name": name, "n_samples": None,
                "b0": None, "b1": None, "b2": None, "b3": None,
                "ahash_hex": None,
            }
        n, bands = r
        return {
            "file_name": name, "n_samples": n,
            "b0": bands[0], "b1": bands[1], "b2": bands[2], "b3": bands[3],
            "ahash_hex": "".join(f"{v:04x}" for v in bands),
        }

    for pdf in batches:
        yield pd.DataFrame(
            [one(n, c) for n, c in zip(pdf["file_name"], pdf["content"])]
        )


def wav_ahash(df: DataFrame) -> DataFrame:
    """(file_name, content, …) -> one aHash row per DECODABLE 16-bit
    PCM WAV (non-PCM, non-16-bit, or clips shorter than 65 samples
    return NULL bands and are filtered — a clip with no 65-frame
    contour has no hash, like the sub-grid image guard).
    Arrow-batched ``mapInPandas``; payloads never leave the
    executor."""
    out = df.select("file_name", "content").mapInPandas(
        _ahash_batches, AHASH_SCHEMA
    )
    return out.filter(F.col("b0").isNotNull())


def ahash_near_dups(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Banded Hamming near-dup pairs over :func:`wav_ahash` output —
    literally :func:`phash.dhash_near_dups` (the hash layer differs;
    the candidate/verify layer is shared): band equality candidates,
    pigeonhole-complete at Hamming ≤ 3 over four bands, exact Hamming
    as the sum of per-band bit_count XORs."""
    return dhash_near_dups(hashes, max_hamming=max_hamming)
