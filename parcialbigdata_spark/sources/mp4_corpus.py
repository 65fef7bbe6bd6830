"""Deterministic 10k-file FRAGMENTED-MP4 corpus for §8.8 sample-
resolution scale measurement (r14): ``mp4_fragment_sample_media`` runs
the moof/traf/trun walk on two committed fixtures, which pins
correctness via the hex-replay oracle but measures nothing at scale.
This corpus is the measured path — the container-walk mirror of
``phash_corpus`` (images) and ``audio_corpus`` (PCM): ~10k small
fragmented files generated on first use into a local parquet cache
(deterministic — same bytes every run).

File family: one video track (track_ID 1, timescale 90000) with empty
moov sample tables + trex defaults, then TWO moof/mdat fragments.
Even-indexed files carry per-sample SIZES (trun flag 0x200, duration
from the tfhd default); odd-indexed files carry per-sample DURATIONS
(flag 0x100, uniform size from the tfhd default) — both §8.8
fall-through paths stay on the measured path. Every traf carries tfdt
(fragment 2 continues the decode timeline) and a sync
first_sample_flags over the non-sync trex default, so keyframe
resolution is exercised per file.

Correctness stays pinned by the committed fixtures and their full
hex-replay DuckDB oracle; this corpus exists to measure walk
throughput at ~5000× the fixture count, so it is bench-only (no
registry/oracle entry — the registry keeps zero rows-only entries).
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession

DEFAULT_PATH = "/tmp/mp4_corpus_10k.parquet"

_PATTERN = bytes(range(256)) * 8  # cheap deterministic payload pool


def _mix(i: int, salt: int) -> int:
    z = (i * 0x9E3779B97F4A7C15 + salt) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, payload: bytes, version: int = 0,
          flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + payload)


def _moov() -> bytes:
    stbl = _box(
        b"stbl",
        _full(b"stsd", struct.pack(">I", 1)
              + _box(b"mp4v", b"\x00" * 6 + struct.pack(">H", 1)
                     + b"\x00" * 70))
        + _full(b"stts", struct.pack(">I", 0))
        + _full(b"stsc", struct.pack(">I", 0))
        + _full(b"stsz", struct.pack(">II", 0, 0))
        + _full(b"stco", struct.pack(">I", 0)),
    )
    hdlr = _full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00")
    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, 90000, 0, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl))
    tkhd = _full(b"tkhd", struct.pack(">III", 0, 0, 1) + b"\x00" * 68)
    trak = _box(b"trak", tkhd + mdia)
    mvex = _box(b"mvex", _full(b"trex", struct.pack(
        ">IIIII", 1, 1, 3000, 64, 0x10000)))
    mvhd = _full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, 0) + b"\x00" * 80)
    return _box(b"moov", mvhd + trak + mvex)


_MOOV = _moov()
_FTYP = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp41")


def _fragment(i: int, seq: int, base_dts: int,
              per_sample_sizes: bool) -> "tuple[bytes, bytes, int, int]":
    """→ (moof_with_zero_offset, mdat, n_samples, total_duration); the
    caller patches the trun data_offset (fixed position: last 4 bytes
    before first_sample_flags)."""
    n = 8 + _mix(i, seq) % 18
    if per_sample_sizes:
        sizes = [40 + _mix(i, 100 * seq + k) % 100 for k in range(n)]
        durs = [3000] * n
        # default-base-is-moof + default duration 3000
        tfhd = _full(b"tfhd", struct.pack(">II", 1, 3000),
                     flags=0x020000 | 0x8)
        tflags = 0x1 | 0x4 | 0x200
        fields = b"".join(struct.pack(">I", s) for s in sizes)
    else:
        sizes = [64] * n  # trex default size
        durs = [2000 + 400 * (_mix(i, 200 * seq + k) % 4) for k in range(n)]
        tfhd = _full(b"tfhd", struct.pack(">I", 1), flags=0x020000)
        tflags = 0x1 | 0x4 | 0x100
        fields = b"".join(struct.pack(">I", d) for d in durs)
    tfdt = _full(b"tfdt", struct.pack(">Q", base_dts), version=1)
    trun = _full(
        b"trun",
        struct.pack(">Ii", n, 0)            # count + data_offset slot
        + struct.pack(">I", 0x2000000)      # first_sample_flags: sync
        + fields,
        flags=tflags,
    )
    moof = _box(b"moof",
                _full(b"mfhd", struct.pack(">I", seq))
                + _box(b"traf", tfhd + tfdt + trun))
    total = sum(sizes)
    off = _mix(i, 7 * seq) % 200
    payload = (_PATTERN * ((total // len(_PATTERN)) + 2))[off:off + total]
    return moof, _box(b"mdat", payload), n, sum(durs)


def _patch_data_offset(moof: bytes, data_offset: int) -> bytes:
    """The trun's data_offset sits 8 bytes into the trun payload; find
    the (single) trun box and patch the slot."""
    at = moof.index(b"trun") - 4
    pos = at + 8 + 8  # header + version/flags + sample_count
    return moof[:pos] + struct.pack(">i", data_offset) + moof[pos + 4:]


def mp4_file_bytes(i: int) -> "tuple[bytes, int]":
    """→ (file bytes, expected sample-row count) for corpus index i."""
    per_sizes = i % 2 == 0
    m1, d1, n1, t1 = _fragment(i, 1, 0, per_sizes)
    m2, d2, n2, _ = _fragment(i, 2, t1, per_sizes)
    m1 = _patch_data_offset(m1, len(m1) + 8)
    m2 = _patch_data_offset(m2, len(m2) + 8)
    return _FTYP + _MOOV + m1 + d1 + m2 + d2, n1 + n2


def ensure_mp4_corpus(
    spark: SparkSession, path: str = DEFAULT_PATH, n: int = 10_000
) -> DataFrame:
    """Return the (file_name, content) corpus DataFrame, generating the
    parquet cache on first use (~25 MB, a few seconds,
    deterministic)."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        rows = [
            (f"frag_{i:05d}.mp4", bytearray(mp4_file_bytes(i)[0]))
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "file_name string, content binary")
        df.repartition(8).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
