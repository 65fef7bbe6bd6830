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
- ``video_large.mp4`` (r14, ADVICE r13) — the mdat comes FIRST with a
  ``size == 1`` 64-bit largesize header (the form every >4 GiB file
  uses), so reaching the moov requires the §4.2-complete box walk;
  a trailing ``size == 0`` (extends-to-EOF) free box exercises the
  third header form. stss {1,4}.
- ``video_stss0.mp4`` (r14, ADVICE r13) — a PRESENT-but-EMPTY stss
  (entry_count 0): per §8.6.2 the absence of stss means every sample
  is sync, but an empty stss means NO sample is — both engines must
  agree (kernel: sync = {}; oracle: stss presence from the leaf row).

Fragmented twin (tests/fixtures/mp4frag — ISO 14496-12 §8.8, the
CMAF/DASH layout where sample tables live in moof/traf/trun):
- ``frag_av.mp4`` — moov with EMPTY stbls + mvex/trex defaults for a
  90000-timescale video trak (id 1) and a 48000-timescale audio trak
  (id 2), then three fragments: moof1 video (tfhd default-base-is-
  moof + default size/flags, tfdt v1, trun v0 with data_offset +
  first_sample_flags + per-sample durations, then a SECOND trun v1
  with NO data_offset — the continue rule — carrying per-sample sizes
  and SIGNED composition offsets), moof2 audio (tfhd with explicit
  64-bit base_data_offset, tfdt v0, one trun where every field falls
  through to the trex defaults), moof3 video (trex flag fallback +
  tfhd default duration/size, cross-fragment dts via tfdt).
- ``frag_skip.mp4`` — a moof with no traf, a traf with no tfhd, and a
  traf whose track has no moov trak (no timescale): all contribute
  ZERO rows on both engines.
- ``frag_sidx.mp4`` (r14) — the canonical HIERARCHICAL DASH segment
  index (§8.16.3): a v1 top sidx whose two type=1 references point at
  per-subsegment child sidx boxes, each child a v0 sidx with one
  type=0 reference covering its moof+mdat pair; child 1 carries a
  nonzero first_offset skipping a free box. Reference byte ranges
  tile the file exactly (pytest-pinned against the actual moof
  positions). No moov, and the moofs are mfhd-only — the fragment
  SAMPLE query yields zero rows for this file on both engines.
- ``frag_av.mp4`` additionally ends with an ``mfra`` (§8.8.9-8.8.11):
  one v1 tfra for the video track (1-byte traf/trun/sample numbers)
  pointing at its two keyframes, one v0 tfra for the audio track with
  WIDENED number fields (2/1/4 bytes — the variable-width encoding),
  and the closing mfro whose size equals the whole mfra box. The
  entries' moof offsets are pinned against the actual moof positions
  by pytest.

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


def build_multi(traks: "list[dict]", mdat_first_largesize: bool = False,
                trailer: bytes = b"") -> bytes:
    """Multi-trak builder (r13): each spec dict carries sizes,
    chunking, and optional uniform / sync (stss sample numbers) /
    codec / handler / base_i (payload-content seed). All traks share
    one mdat; chunks are laid out trak-by-trak in file order.

    ``mdat_first_largesize`` (r14) lays the file out as
    ftyp | mdat(64-bit largesize header) | moov | trailer — the shape
    of a real >4 GiB capture, where the moov is only reachable by a
    walker that understands §4.2's size==1 form. ``trailer`` appends
    raw bytes after the moov (e.g. a size==0 to-EOF box)."""
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

    mdat_payload = b"".join(
        sample_bytes(t.get("base_i", 0) + i, sz)
        for t in traks
        for i, sz in enumerate(t["sizes"])
    )
    if mdat_first_largesize:
        # ftyp | largesize mdat | moov | trailer — chunk offsets are
        # independent of the moov length, no two-pass needed
        base = len(ftyp()) + 16
        acc, all_offsets = base, []
        for css in chunk_sizes:
            offs = []
            for cs in css:
                offs.append(acc)
                acc += cs
            all_offsets.append(offs)
        mdat = (struct.pack(">I", 1) + b"mdat"
                + struct.pack(">Q", 16 + len(mdat_payload)) + mdat_payload)
        return ftyp() + mdat + moov(all_offsets) + trailer
    head_len = len(ftyp()) + len(moov([[0] * len(c) for c in chunk_sizes])) + 8
    acc, all_offsets = head_len, []
    for css in chunk_sizes:
        offs = []
        for cs in css:
            offs.append(acc)
            acc += cs
        all_offsets.append(offs)
    return ftyp() + moov(all_offsets) + box(b"mdat", mdat_payload) + trailer


# ---------------------------------------------------------------------
# Fragmented MP4 (§8.8) builders — r14
# ---------------------------------------------------------------------
FRAG_OUT = OUT.parent / "mp4frag"


def fullf(btype: bytes, payload: bytes, version: int = 0,
          flags: int = 0) -> bytes:
    return box(btype, struct.pack(">I", (version << 24) | flags) + payload)


def _empty_stbl(codec: str) -> bytes:
    """The empty sample table a fragmented file's moov carries — every
    table present but zero-entry (samples live in the fragments)."""
    return box(
        b"stbl",
        full(b"stsd", struct.pack(">I", 1) + _stsd_entry(codec))
        + full(b"stts", struct.pack(">I", 0))
        + full(b"stsc", struct.pack(">I", 0))
        + full(b"stsz", struct.pack(">II", 0, 0))
        + full(b"stco", struct.pack(">I", 0)),
    )


def _frag_trak(tid: int, timescale: int, codec: str, handler: bytes) -> bytes:
    hname = b"video\x00" if handler == b"vide" else b"sound\x00"
    hdlr = full(b"hdlr", b"\x00" * 4 + handler + b"\x00" * 12 + hname)
    mdhd = full(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, 0, 0x55C4, 0))
    mdia = box(b"mdia", mdhd + hdlr + box(b"minf", _empty_stbl(codec)))
    tkhd = full(b"tkhd", struct.pack(">III", 0, 0, tid) + b"\x00" * 68)
    return box(b"trak", tkhd + mdia)


def _trex(tid: int, ddur: int, dsize: int, dflags: int) -> bytes:
    return full(b"trex", struct.pack(">IIIII", tid, 1, ddur, dsize, dflags))


def _tfhd(tid: int, flags: int, fields: bytes = b"") -> bytes:
    return fullf(b"tfhd", struct.pack(">I", tid) + fields, flags=flags)


def _tfdt(base: int, version: int = 1) -> bytes:
    return fullf(b"tfdt",
                 struct.pack(">Q" if version == 1 else ">I", base),
                 version=version)


def _trun(version: int, flags: int, samples: "list[dict]",
          data_offset: "int | None" = None,
          first_flags: "int | None" = None) -> bytes:
    payload = struct.pack(">I", len(samples))
    if flags & 0x1:
        payload += struct.pack(">i", data_offset)
    if flags & 0x4:
        payload += struct.pack(">I", first_flags)
    for smp in samples:
        if flags & 0x100:
            payload += struct.pack(">I", smp["duration"])
        if flags & 0x200:
            payload += struct.pack(">I", smp["size"])
        if flags & 0x400:
            payload += struct.pack(">I", smp["flags"])
        if flags & 0x800:
            payload += struct.pack(">i" if version == 1 else ">I",
                                   smp["cto"])
    return fullf(b"trun", payload, version=version, flags=flags)


def _tfra(version: int, tid: int, widths: "tuple[int, int, int]",
          entries: "list[tuple[int, int, int, int, int]]") -> bytes:
    """TrackFragmentRandomAccessBox (§8.8.10); widths = the
    length_size_of_* fields (0-3 → 1-4 bytes); entries =
    [(time, moof_offset, traf_number, trun_number, sample_number)]."""
    wt, wr, ws = widths
    body = struct.pack(">II", tid, (wt << 4) | (wr << 2) | ws)
    body += struct.pack(">I", len(entries))
    for time, moof_off, traf_n, trun_n, sample_n in entries:
        body += struct.pack(">QQ" if version == 1 else ">II",
                            time, moof_off)
        for val, w in ((traf_n, wt), (trun_n, wr), (sample_n, ws)):
            body += val.to_bytes(w + 1, "big")
    return fullf(b"tfra", body, version=version)


def _mfra(tfras: "list[bytes]") -> bytes:
    """mfra container + the closing mfro whose size field equals the
    WHOLE mfra box (§8.8.11) — players find it by reading the last 16
    bytes of the file."""
    inner = b"".join(tfras)
    total = 8 + len(inner) + 16  # mfra header + tfras + mfro box
    return box(b"mfra", inner + fullf(b"mfro", struct.pack(">I", total)))


def build_frag_av() -> bytes:
    """Three-fragment audio+video file; see module docstring."""
    moov = box(
        b"moov",
        full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, 0) + b"\x00" * 80)
        + _frag_trak(1, 90000, "avc1", b"vide")
        + _frag_trak(2, 48000, "mp4a", b"soun")
        + box(b"mvex", _trex(1, 3000, 0, 0x10000) + _trex(2, 1024, 24, 0)),
    )
    v1_sizes = [100] * 4
    v2_sizes = [50, 60, 70]
    a_sizes = [24] * 5
    v3_sizes = [80] * 3
    mdat1 = box(b"mdat", b"".join(
        sample_bytes(i, s) for i, s in enumerate(v1_sizes + v2_sizes)))
    mdat2 = box(b"mdat", b"".join(
        sample_bytes(100 + i, s) for i, s in enumerate(a_sizes)))
    mdat3 = box(b"mdat", b"".join(
        sample_bytes(200 + i, s) for i, s in enumerate(v3_sizes)))

    def moof1(do1: int) -> bytes:
        return box(
            b"moof",
            fullf(b"mfhd", struct.pack(">I", 1))
            + box(
                b"traf",
                # default-base-is-moof | default_sample_size 100 |
                # default_sample_flags 0x10000 (non-sync)
                _tfhd(1, 0x020000 | 0x10 | 0x20,
                      struct.pack(">II", 100, 0x10000))
                + _tfdt(0, version=1)
                # trun 1: data_offset + first_sample_flags (sync) +
                # per-sample durations; sizes/flags from tfhd defaults
                + _trun(0, 0x1 | 0x4 | 0x100,
                        [{"duration": d} for d in (3000, 3000, 3000, 3600)],
                        data_offset=do1, first_flags=0x2000000)
                # trun 2: NO data_offset (the continue rule) —
                # per-sample sizes + v1 SIGNED composition offsets;
                # durations fall through tfhd(absent) to trex 3000
                + _trun(1, 0x200 | 0x800,
                        [{"size": s, "cto": c}
                         for s, c in zip(v2_sizes, (0, -3000, 3000))]),
            ),
        )

    def moof2(base2: int) -> bytes:
        return box(
            b"moof",
            fullf(b"mfhd", struct.pack(">I", 2))
            + box(
                b"traf",
                # explicit 64-bit base_data_offset; everything else
                # (duration 1024, size 24, flags 0=sync) from trex
                _tfhd(2, 0x1, struct.pack(">Q", base2))
                + _tfdt(2048, version=0)
                + _trun(0, 0x1, [{}] * 5, data_offset=0),
            ),
        )

    def moof3(do3: int) -> bytes:
        return box(
            b"moof",
            fullf(b"mfhd", struct.pack(">I", 3))
            + box(
                b"traf",
                # tfhd default duration 2400 + size 80; flags fall
                # through to trex 0x10000 (non-sync), first sample
                # overridden sync by first_sample_flags
                _tfhd(1, 0x020000 | 0x8 | 0x10,
                      struct.pack(">II", 2400, 80))
                # video dts continues: moof1 total = 3*3000 + 3600
                # + 3*3000 (trex) = 21600
                + _tfdt(21600, version=1)
                + _trun(0, 0x1 | 0x4, [{}] * 3, data_offset=do3,
                        first_flags=0x2000000),
            ),
        )

    m1 = moof1(0)
    do1 = len(m1) + 8
    m3 = moof3(0)
    do3 = len(m3) + 8
    head = len(ftyp()) + len(moov)
    base2 = head + len(m1) + len(mdat1) + len(moof2(0)) + 8
    moof1_at = head
    moof2_at = head + len(m1) + len(mdat1)
    moof3_at = moof2_at + len(moof2(0)) + len(mdat2)
    # mfra random-access index (§8.8.10): video keyframes (samples 1
    # of moof 1 and 3), audio all-sync first sample; the audio tfra
    # exercises v0 32-bit fields AND widened traf/trun/sample numbers
    mfra = _mfra([
        _tfra(1, 1, (0, 0, 0), [
            (0, moof1_at, 1, 1, 1),
            (21600, moof3_at, 1, 1, 1),
        ]),
        _tfra(0, 2, (1, 0, 3), [
            (2048, moof2_at, 1, 1, 1),
        ]),
    ])
    return (ftyp() + moov + moof1(do1) + mdat1 + moof2(base2) + mdat2
            + moof3(do3) + mdat3 + mfra)


def _sidx(version: int, ref_id: int, timescale: int, ept: int,
          first_offset: int, refs: "list[tuple[int, int, int, int, int, int]]"
          ) -> bytes:
    """SegmentIndexBox (§8.16.3); refs = [(type, size, duration,
    starts_with_sap, sap_type, sap_delta)]."""
    if version == 1:
        head = struct.pack(">IIQQ", ref_id, timescale, ept, first_offset)
    else:
        head = struct.pack(">IIII", ref_id, timescale, ept, first_offset)
    body = head + struct.pack(">HH", 0, len(refs))
    for rtype, size, dur, sap, sap_type, delta in refs:
        body += struct.pack(
            ">III",
            (rtype << 31) | size,
            dur,
            (sap << 31) | (sap_type << 28) | delta,
        )
    return fullf(b"sidx", body, version=version)


def build_frag_sidx() -> bytes:
    """Hierarchical DASH segment index; see module docstring."""
    def bare_moof(seq: int, n_pay: int) -> "tuple[bytes, bytes]":
        return (box(b"moof", fullf(b"mfhd", struct.pack(">I", seq))),
                box(b"mdat", bytes((seq * 31 + j) % 256
                                   for j in range(n_pay))))

    m1, d1 = bare_moof(1, 96)
    m2, d2 = bare_moof(2, 64)
    free = box(b"free", b"\x00" * 8)  # 16 bytes child-1 skips over
    # child sidx sizes are layout-independent (1 reference each)
    c1 = _sidx(0, 1, 90000, 0, len(free), [
        (0, len(m1) + len(d1), 12600, 1, 1, 0)])
    c2 = _sidx(0, 1, 90000, 12600, 0, [
        (0, len(m2) + len(d2), 9000, 1, 1, 300)])
    top = _sidx(1, 1, 90000, 0, 0, [
        (1, len(c1) + len(free) + len(m1) + len(d1), 12600, 1, 1, 0),
        (1, len(c2) + len(m2) + len(d2), 9000, 0, 0, 0),
    ])
    return ftyp() + top + c1 + free + m1 + d1 + c2 + m2 + d2


def build_frag_skip() -> bytes:
    """Malformed-fragment file: every traf is dropped by both engines
    (no traf / no tfhd / no matching moov trak → no timescale)."""
    m1 = box(b"moof", fullf(b"mfhd", struct.pack(">I", 1)))
    m2 = box(b"moof", fullf(b"mfhd", struct.pack(">I", 2))
             + box(b"traf", _trun(0, 0x1, [{}] * 2, data_offset=0)))
    m3 = box(b"moof", fullf(b"mfhd", struct.pack(">I", 3))
             + box(b"traf", _tfhd(9, 0x0) + _tfdt(0)
                   + _trun(0, 0x1, [{}], data_offset=0)))
    return ftyp() + m1 + m2 + m3 + box(b"mdat", bytes(range(32)))


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    FRAG_OUT.mkdir(parents=True, exist_ok=True)
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
        # r14 (ADVICE r13): §4.2 header-form coverage + empty stss
        "video_large.mp4": build_multi(
            [{"sizes": [30] * 5, "chunking": [(1, 5)], "sync": [1, 4],
              "base_i": 70}],
            mdat_first_largesize=True,
            trailer=struct.pack(">I", 0) + b"free" + b"\x00" * 8,
        ),
        "video_stss0.mp4": build_multi(
            [{"sizes": [18, 22, 26, 30], "chunking": [(1, 2)], "sync": [],
              "base_i": 90}],
        ),
    }
    frag_files = {
        "frag_av.mp4": build_frag_av(),
        "frag_skip.mp4": build_frag_skip(),
        "frag_sidx.mp4": build_frag_sidx(),
    }
    for name, data in files.items():
        (OUT / name).write_bytes(data)
        print(f"wrote {OUT / name} ({len(data)} bytes)")
    for name, data in frag_files.items():
        (FRAG_OUT / name).write_bytes(data)
        print(f"wrote {FRAG_OUT / name} ({len(data)} bytes)")
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
