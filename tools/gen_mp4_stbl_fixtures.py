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
- ``video_kf.mp4`` (r13) — 9 samples, chunks of (3,3,3), stss sync
  table marking samples {1,4,7} as keyframes, avc1 sample entry with
  an avcC decoder-configuration child (profile 100 / level 31 /
  4-byte NAL lengths / 1 SPS), two-run stts ladder (3×400 then 6×500
  ticks at timescale 1000 — dts seconds 0,0,0,1,1,2,2,3,3).
- ``video_mt.mp4`` (r13) — TWO traks sharing one mdat (the common
  audio+video shape): trak 1 video, 6 uniform-size samples in chunks
  of (2,2,2) with stss {1,3}, 512-tick stts at timescale 600 (the
  non-1000 case); trak 2 audio (mp4a entry), 5 per-size samples in
  one chunk via 64-bit co64 offsets, NO stss (every sample is a sync
  sample per §8.6.2).

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


def _expand_chunking(chunking: "list[tuple[int, int]]", n: int) -> "list[int]":
    per_chunk: list[int] = []
    total, run, chunk = 0, 0, 1
    while total < n:
        if run + 1 < len(chunking) and chunk >= chunking[run + 1][0]:
            run += 1
        spc = min(chunking[run][1], n - total)
        per_chunk.append(spc)
        total += spc
        chunk += 1
    return per_chunk


def _avcc() -> bytes:
    """avcC decoder configuration (ISO/IEC 14496-15 §5.3.3): version 1,
    profile 100 (High), level 31, 4-byte NAL length prefixes, 1 SPS +
    1 PPS with deterministic placeholder bodies."""
    sps, pps = b"\x67\x64\x00\x1f", b"\x68\xee"
    return box(
        b"avcC",
        bytes([1, 100, 0, 31, 0xFF, 0xE1])
        + struct.pack(">H", len(sps)) + sps
        + b"\x01" + struct.pack(">H", len(pps)) + pps,
    )


def _stsd_entry(codec: str) -> bytes:
    if codec == "mp4v":
        return box(b"mp4v", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70)
    if codec == "avc1":
        # VisualSampleEntry fixed part (78 bytes) + avcC child
        fixed = (
            b"\x00" * 6 + struct.pack(">H", 1)          # reserved + dri
            + b"\x00" * 16                               # pre_defined/reserved
            + struct.pack(">HH", 640, 360)               # width, height
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + b"\x00" * 4 + struct.pack(">H", 1)          # reserved + frames
            + b"\x00" * 32                               # compressorname
            + struct.pack(">Hh", 24, -1)                 # depth, pre_defined
        )
        assert len(fixed) == 78
        return box(b"avc1", fixed + _avcc())
    if codec == "mp4a":
        # AudioSampleEntry fixed part (28 bytes), no children needed
        fixed = (
            b"\x00" * 6 + struct.pack(">H", 1)
            + b"\x00" * 8
            + struct.pack(">HHHH", 2, 16, 0, 0)
            + struct.pack(">I", 44100 << 16)
        )
        assert len(fixed) == 28
        return box(b"mp4a", fixed)
    raise ValueError(codec)


def build_multi(traks: "list[dict]") -> bytes:
    """Multi-trak builder (r13): each spec dict carries sizes,
    chunking, and optional uniform / sync (stss sample numbers) /
    codec / handler / base_i (payload-content seed). All traks share
    one mdat; chunks are laid out trak-by-trak in file order."""
    per_chunk = [_expand_chunking(t["chunking"], len(t["sizes"])) for t in traks]

    def trak_box(t: dict, stco_offsets: "list[int]") -> bytes:
        n = len(t["sizes"])
        stsd = full(b"stsd", struct.pack(">I", 1)
                    + _stsd_entry(t.get("codec", "mp4v")))
        # stts decoding deltas: explicit (count, delta) runs, or the
        # single delta-1 run covering all samples
        tts_runs = t.get("stts_runs", [(n, 1)])
        assert sum(c for c, _ in tts_runs) == n
        stts = full(b"stts", struct.pack(">I", len(tts_runs))
                    + b"".join(struct.pack(">II", c, d) for c, d in tts_runs))
        stsc = full(b"stsc", struct.pack(">I", len(t["chunking"]))
                    + b"".join(struct.pack(">III", fc, spc, 1)
                               for fc, spc in t["chunking"]))
        uniform = t.get("uniform", 0)
        if uniform:
            stsz = full(b"stsz", struct.pack(">II", uniform, n))
        else:
            stsz = full(b"stsz", struct.pack(">II", 0, n)
                        + b"".join(struct.pack(">I", s) for s in t["sizes"]))
        if t.get("co64"):
            stco = full(b"co64", struct.pack(">I", len(stco_offsets))
                        + b"".join(struct.pack(">Q", o) for o in stco_offsets))
        else:
            stco = full(b"stco", struct.pack(">I", len(stco_offsets))
                        + b"".join(struct.pack(">I", o) for o in stco_offsets))
        extra = b""
        if t.get("sync") is not None:
            extra = full(b"stss", struct.pack(">I", len(t["sync"]))
                         + b"".join(struct.pack(">I", s) for s in t["sync"]))
        if t.get("ctts_runs") is not None:
            # composition offsets, version 1 (SIGNED offsets — the
            # B-frame case where presentation precedes decode order)
            runs = t["ctts_runs"]
            assert sum(c for c, _ in runs) == n
            extra += full(b"ctts", struct.pack(">I", len(runs))
                          + b"".join(struct.pack(">Ii", c, o)
                                     for c, o in runs), version=1)
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco + extra)
        minf = box(b"minf", stbl)
        handler = t.get("handler", b"vide")
        hname = b"video\x00" if handler == b"vide" else b"sound\x00"
        hdlr = full(b"hdlr", b"\x00" * 4 + handler + b"\x00" * 12 + hname)
        mdhd = full(b"mdhd", struct.pack(
            ">IIIIHH", 0, 0, t.get("timescale", 1000), n, 0x55C4, 0))
        mdia = box(b"mdia", mdhd + hdlr + minf)
        tkhd = full(b"tkhd", struct.pack(">III", 0, 0, 1) + b"\x00" * 68)
        return box(b"trak", tkhd + mdia)

    def moov(all_offsets: "list[list[int]]") -> bytes:
        total = sum(len(t["sizes"]) for t in traks)
        mvhd = full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, total) + b"\x00" * 80)
        return box(b"moov", mvhd + b"".join(
            trak_box(t, offs) for t, offs in zip(traks, all_offsets)
        ))

    chunk_sizes: list[list[int]] = []
    for t, pcs in zip(traks, per_chunk):
        s, css = 0, []
        for spc in pcs:
            css.append(sum(t["sizes"][s:s + spc]))
            s += spc
        chunk_sizes.append(css)

    head_len = len(ftyp()) + len(moov([[0] * len(c) for c in chunk_sizes])) + 8
    acc, all_offsets = head_len, []
    for css in chunk_sizes:
        offs = []
        for cs in css:
            offs.append(acc)
            acc += cs
        all_offsets.append(offs)
    mdat_payload = b"".join(
        sample_bytes(t.get("base_i", 0) + i, sz)
        for t in traks
        for i, sz in enumerate(t["sizes"])
    )
    return ftyp() + moov(all_offsets) + box(b"mdat", mdat_payload)


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    a_sizes = [20 + 3 * i for i in range(10)]
    b_sizes = [32] * 7
    kf_sizes = [24 + 5 * i for i in range(9)]
    mt_video = {"sizes": [40] * 6, "chunking": [(1, 2)], "uniform": 40,
                "sync": [1, 3], "codec": "avc1", "handler": b"vide",
                # 512-tick deltas at timescale 600: dts seconds
                # 0,0,1,2,3,4 — exercises a non-1000 timescale
                "stts_runs": [(6, 512)], "timescale": 600}
    mt_audio = {"sizes": [11 + 2 * i for i in range(5)], "chunking": [(1, 5)],
                "codec": "mp4a", "handler": b"soun", "base_i": 100,
                # 64-bit chunk offsets (co64, §8.7.5) on the audio trak
                "co64": True}
    files = {
        "video_a.mp4": build("a", a_sizes, [(1, 4), (3, 2)]),
        "video_b.mp4": build("b", b_sizes, [(1, 7)], uniform=32),
        "nostbl_c.mp4": box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
        + box(b"mdat", bytes(range(48))),
        "video_kf.mp4": build_multi([
            {"sizes": kf_sizes, "chunking": [(1, 3)], "sync": [1, 4, 7],
             "codec": "avc1", "base_i": 50,
             # two-run stts ladder: dts 0,400,800 | 1200,1700,...,3700
             # → seconds 0,0,0,1,1,2,2,3,3 at timescale 1000
             "stts_runs": [(3, 400), (6, 500)],
             # ctts v1 signed composition offsets: pts
             # 800,300,700 | 1300,1800,2300,2800,3300,3800 — samples
             # 2-3 PRESENT before sample 1 (the B-frame reorder)
             "ctts_runs": [(1, 800), (2, -100), (6, 100)]},
        ]),
        "video_mt.mp4": build_multi([mt_video, mt_audio]),
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
