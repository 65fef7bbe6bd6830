"""Generate REAL ISO-BMFF fixtures WITH sample tables (moov/trak/mdia/
minf/stbl — stsd/stts/stsc/stsz/stco) plus a matching mdat, for the
r12 sample-table parser: the per-sample byte-range computation every
video pipeline runs BEFORE any codec (frame extraction, k-th-frame
sampling, sample-level dedup all start from "which bytes are frame
i"). Structurally valid per ISO/IEC 14496-12 §8.5-8.7; the sample
payloads are deterministic byte patterns, not playable bitstreams —
the container math is the point, decode stays behind the gated stub.

Fixtures:
- ``video_a.mp4`` — 10 samples, sizes 20+3i, chunks of (4, 4, 2) via a
  two-entry stsc run (the run-length form the spec makes everyone
  implement), stsz with per-sample sizes.
- ``video_b.mp4`` — 7 samples in ONE chunk (single stsc run), constant
  stsz (``sample_size != 0`` — the uniform-size fast path, no table).
- ``nostbl_c.mp4`` — ftyp+mdat only (no moov): excluded by both
  engines.

Deterministic output — run once, commit the bytes:
    python tools/gen_mp4_stbl_fixtures.py
writes tests/fixtures/mp4stbl/*.mp4 and prints the per-sample
(offset, size, md5) table the pytest pins.
"""

from __future__ import annotations

import hashlib
import pathlib
import struct

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "mp4stbl"


def box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def full(btype: bytes, payload: bytes, version: int = 0) -> bytes:
    return box(btype, struct.pack(">I", version << 24) + payload)


def ftyp() -> bytes:
    return box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp41")


def sample_bytes(i: int, size: int) -> bytes:
    return bytes((i * 41 + j * 7 + 13) % 256 for j in range(size))


def build(name: str, sizes: "list[int]", chunking: "list[tuple[int, int]]",
          uniform: int = 0) -> bytes:
    """``chunking`` = stsc runs [(first_chunk, samples_per_chunk)];
    ``uniform`` != 0 writes stsz's constant-size form."""
    n = len(sizes)
    # expand chunking to per-chunk sample counts
    per_chunk: list[int] = []
    total = 0
    run = 0
    chunk = 1
    while total < n:
        if run + 1 < len(chunking) and chunk >= chunking[run + 1][0]:
            run += 1
        spc = min(chunking[run][1], n - total)
        per_chunk.append(spc)
        total += spc
        chunk += 1

    stsd = full(b"stsd", struct.pack(">I", 1)
                + box(b"mp4v", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70))
    stts = full(b"stts", struct.pack(">III", 1, n, 1))
    stsc = full(b"stsc", struct.pack(">I", len(chunking))
                + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in chunking))
    if uniform:
        stsz = full(b"stsz", struct.pack(">II", uniform, n))
    else:
        stsz = full(b"stsz", struct.pack(">II", 0, n)
                    + b"".join(struct.pack(">I", s) for s in sizes))
    # stco needs absolute mdat payload offsets — two-pass: build moov
    # with zeroed stco, measure, rebuild with real offsets.
    chunk_sizes = []
    s = 0
    for spc in per_chunk:
        chunk_sizes.append(sum(sizes[s:s + spc]))
        s += spc

    def moov(stco_offsets: "list[int]") -> bytes:
        stco = full(b"stco", struct.pack(">I", len(stco_offsets))
                    + b"".join(struct.pack(">I", o) for o in stco_offsets))
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", stbl)
        hdlr = full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00")
        mdhd = full(b"mdhd", struct.pack(">IIIIHH", 0, 0, 1000, n, 0x55C4, 0))
        mdia = box(b"mdia", mdhd + hdlr + minf)
        tkhd = full(b"tkhd", struct.pack(">III", 0, 0, 1) + b"\x00" * 68)
        trak = box(b"trak", tkhd + mdia)
        mvhd = full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, n) + b"\x00" * 80)
        return box(b"moov", mvhd + trak)

    head_len = len(ftyp()) + len(moov([0] * len(per_chunk))) + 8  # + mdat hdr
    offs = []
    acc = head_len
    for cs in chunk_sizes:
        offs.append(acc)
        acc += cs
    mdat = box(b"mdat", b"".join(sample_bytes(i, sz) for i, sz in enumerate(sizes)))
    blob = ftyp() + moov(offs) + mdat
    return blob


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    a_sizes = [20 + 3 * i for i in range(10)]
    b_sizes = [32] * 7
    files = {
        "video_a.mp4": build("a", a_sizes, [(1, 4), (3, 2)]),
        "video_b.mp4": build("b", b_sizes, [(1, 7)], uniform=32),
        "nostbl_c.mp4": box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
        + box(b"mdat", bytes(range(48))),
    }
    for name, data in files.items():
        (OUT / name).write_bytes(data)
        print(f"wrote {OUT / name} ({len(data)} bytes)")
    # pin table for the pytest: per-sample (offset, size, md5-of-hex)
    for name, sizes, chunks in (
        ("video_a.mp4", a_sizes, [4, 4, 2]),
        ("video_b.mp4", b_sizes, [7]),
    ):
        blob = (OUT / name).read_bytes()
        s = 0
        print(name)
        for ci, spc in enumerate(chunks):
            # recompute chunk offset by scanning stco is the parser's
            # job; here trust the generator's own math via mdat scan
            pass
        # brute force: locate each sample's bytes inside mdat by
        # regenerating them
        mdat_payload = b"".join(sample_bytes(i, sz) for i, sz in enumerate(sizes))
        base = blob.index(mdat_payload)
        off = base
        for i, sz in enumerate(sizes):
            md5 = hashlib.md5(blob[off:off + sz].hex().upper().encode()).hexdigest()
            print(f"  sample {i + 1}: off={off} size={sz} md5={md5}")
            off += sz


if __name__ == "__main__":
    main()
