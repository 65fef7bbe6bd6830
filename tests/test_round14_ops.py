"""Round-14 operator tests: fragmented MP4 (moof/traf/trun, ISO/IEC
14496-12 §8.8 — VERDICT r13 #3), the §4.2-complete box-header walk
(largesize / to-EOF forms, ADVICE r13), and present-but-empty stss
semantics (ADVICE r13)."""

from __future__ import annotations

import importlib.util
import pathlib
import struct

import pandas as pd
import pytest

MP4STBL = "/root/repo/tests/fixtures/mp4stbl"
MP4FRAG = "/root/repo/tests/fixtures/mp4frag"


def _gen_module():
    """Load the fixture generator for in-test fragment assembly."""
    path = (
        pathlib.Path(__file__).resolve().parent.parent
        / "tools" / "gen_mp4_stbl_fixtures.py"
    )
    spec = importlib.util.spec_from_file_location("gen_mp4_stbl", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _frag_rows(blobs):
    """Run the fragment kernel directly over (name, bytes) blobs."""
    from parcialbigdata_spark.sources.binary import (
        _parse_mp4_fragments_batches,
    )

    pdf = pd.DataFrame(
        {"file_name": [n for n, _ in blobs],
         "content": [b for _, b in blobs]}
    )
    out = pd.concat(list(_parse_mp4_fragments_batches(iter([pdf]))))
    return out.to_dict("records")


# -------------------- fragmented MP4: §8.8 resolution --------------------


def test_mp4_fragment_full_resolution(spark):
    """frag_av.mp4 end to end through the Spark op: both tracks, all
    three fragments, every §8.8 mechanism pinned."""
    from parcialbigdata_spark.sources.binary import (
        parse_mp4_fragments,
        read_binary_dir,
    )

    raw = read_binary_dir(spark, MP4FRAG, glob="*.mp4")
    rows = parse_mp4_fragments(raw).collect()
    assert {r.file_name for r in rows} == {"frag_av.mp4"}  # skip twin: 0 rows
    v = sorted((r for r in rows if r.track_id == 1),
               key=lambda r: r.sample_idx)
    a = sorted((r for r in rows if r.track_id == 2),
               key=lambda r: r.sample_idx)
    assert len(v) == 10 and len(a) == 5

    # trun 1: tfhd default size 100, per-sample durations, first-
    # sample-flags sync override over the tfhd non-sync default
    assert [r.sample_size for r in v[:4]] == [100] * 4
    assert [r.duration for r in v[:4]] == [3000, 3000, 3000, 3600]
    assert [r.is_keyframe for r in v[:4]] == [True, False, False, False]
    assert [r.dts for r in v[:4]] == [0, 3000, 6000, 9000]

    # trun 2 (NO data_offset — continue rule): starts where trun 1
    # ended, per-sample sizes, trex default duration 3000, v1 SIGNED
    # composition offsets shifting pts both ways
    assert v[4].byte_offset == v[3].byte_offset + v[3].sample_size
    assert [r.sample_size for r in v[4:7]] == [50, 60, 70]
    assert [r.duration for r in v[4:7]] == [3000] * 3
    assert [r.dts for r in v[4:7]] == [12600, 15600, 18600]
    assert [r.pts for r in v[4:7]] == [12600, 12600, 21600]

    # moof3: cross-fragment dts via tfdt, tfhd default duration/size,
    # trex non-sync default + first-sample override
    assert [r.moof_seq for r in v[7:]] == [3] * 3
    assert [r.dts for r in v[7:]] == [21600, 24000, 26400]
    assert [r.sample_size for r in v[7:]] == [80] * 3
    assert [r.is_keyframe for r in v[7:]] == [True, False, False]

    # audio traf: explicit 64-bit base_data_offset, EVERY per-sample
    # field from the trex defaults (duration 1024, size 24, sync)
    assert [r.sample_size for r in a] == [24] * 5
    assert [r.dts for r in a] == [2048 + 1024 * i for i in range(5)]
    assert all(r.is_keyframe for r in a)
    assert {r.timescale for r in v} == {90000}
    assert {r.timescale for r in a} == {48000}

    # byte ranges tile without overlap inside each mdat
    spans = sorted((r.byte_offset, r.byte_offset + r.sample_size)
                   for r in rows)
    assert all(spans[i][1] <= spans[i + 1][0]
               for i in range(len(spans) - 1))


def test_mp4_fragment_skip_malformed():
    """No-traf / no-tfhd / unknown-track fragments yield zero rows."""
    blob = open(f"{MP4FRAG}/frag_skip.mp4", "rb").read()
    assert _frag_rows([("frag_skip.mp4", blob)]) == []


def test_mp4_fragment_absent_tfdt_accumulates():
    """Without tfdt the decode timeline continues from the track's
    accumulated end (kernel contract; the committed fixtures always
    carry tfdt so the oracle replay never needs this rule)."""
    g = _gen_module()
    moov = g.box(
        b"moov",
        g.full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, 0) + b"\x00" * 80)
        + g._frag_trak(1, 1000, "mp4v", b"vide")
        + g.box(b"mvex", g._trex(1, 10, 4, 0)),
    )

    def moof(seq, do):
        return g.box(
            b"moof",
            g.fullf(b"mfhd", struct.pack(">I", seq))
            + g.box(b"traf", g._tfhd(1, 0x0)
                    + g._trun(0, 0x1, [{}] * 3, data_offset=do)),
        )

    m = moof(1, 0)
    do = len(m) + 8
    mdat = g.box(b"mdat", bytes(24))
    blob = (g.ftyp() + moov + moof(1, do) + mdat
            + moof(2, do) + mdat)
    rows = _frag_rows([("x.mp4", blob)])
    assert [r["dts"] for r in rows] == [0, 10, 20, 30, 40, 50]
    assert [r["sample_idx"] for r in rows] == [1, 2, 3, 4, 5, 6]
    assert [r["moof_seq"] for r in rows] == [1, 1, 1, 2, 2, 2]


def test_mp4_fragment_v0_unsigned_cto():
    """trun VERSION-0 composition offsets are UNSIGNED (§8.8.8) — a
    large v0 offset stays positive, unlike the v1 two's-complement
    path the committed fixture exercises."""
    g = _gen_module()
    moov = g.box(
        b"moov",
        g.full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, 0) + b"\x00" * 80)
        + g._frag_trak(1, 1000, "mp4v", b"vide")
        + g.box(b"mvex", g._trex(1, 10, 4, 0)),
    )

    def moof(do):
        return g.box(
            b"moof",
            g.fullf(b"mfhd", struct.pack(">I", 1))
            + g.box(b"traf", g._tfhd(1, 0x0) + g._tfdt(0)
                    + g._trun(0, 0x1 | 0x800,
                              [{"cto": 0}, {"cto": 2_500_000_000 % 2**32},
                               {"cto": 30}],
                              data_offset=do)),
        )

    m = moof(0)
    blob = (g.ftyp() + moov + moof(len(m) + 8)
            + g.box(b"mdat", bytes(12)))
    rows = _frag_rows([("v0cto.mp4", blob)])
    assert [r["dts"] for r in rows] == [0, 10, 20]
    # v0: the 2.5e9 offset is NOT reinterpreted as negative
    assert [r["pts"] for r in rows] == [0, 10 + 2_500_000_000, 50]


def test_mp4_fragment_hostile_mutations():
    """Truncation / hostile counts drop the traf, never crash."""
    blob = bytearray(open(f"{MP4FRAG}/frag_av.mp4", "rb").read())
    base = _frag_rows([("frag_av.mp4", bytes(blob))])
    assert len(base) == 15

    # inflate the first trun's sample_count so its records run past
    # the box end — that traf contributes nothing, the others survive
    tr = bytes(blob).index(b"trun")
    hostile = bytearray(blob)
    hostile[tr + 8:tr + 12] = struct.pack(">I", 10_000)
    rows = _frag_rows([("h.mp4", bytes(hostile))])
    assert {r["track_id"] for r in rows} == {1, 2}
    assert len([r for r in rows if r["moof_seq"] == 1]) == 0
    assert len(rows) == 8  # audio 5 + moof3 video 3

    # truncating the file mid-moof walks cleanly to the cut
    assert isinstance(_frag_rows([("t.mp4", bytes(blob[:len(blob) // 2]))]),
                      list)

    # zero out a tfhd's track_id → no moov trak matches → traf dropped
    th = bytes(blob).index(b"tfhd")
    unk = bytearray(blob)
    unk[th + 8:th + 12] = struct.pack(">I", 77)
    rows = _frag_rows([("u.mp4", bytes(unk))])
    assert len([r for r in rows if r["moof_seq"] == 1]) == 0


# -------------------- §4.2 header forms + empty stss --------------------


def test_mp4_largesize_and_to_eof_boxes(spark):
    """video_large.mp4: the mdat comes FIRST with a 64-bit largesize
    header and a size==0 free box trails the moov — the moov-ladder
    parser must walk past both (ADVICE r13)."""
    from parcialbigdata_spark.sources.binary import (
        parse_mp4_samples,
        read_binary_dir,
    )

    raw = read_binary_dir(spark, MP4STBL, glob="video_large.mp4")
    rows = sorted(parse_mp4_samples(raw).collect(),
                  key=lambda r: r.sample_idx)
    assert len(rows) == 5
    # ftyp(24 bytes in this generator) + 16-byte largesize header
    assert rows[0].byte_offset == 24 + 16
    assert [r.is_keyframe for r in rows] == [True, False, False, True, False]


def test_mp4_empty_stss_means_no_keyframes(spark):
    """A PRESENT-but-empty stss (entry_count 0) means NO sample is a
    sync sample — distinct from no stss at all, where every sample is
    (§8.6.2). Both engines agree via the leaf-presence rule."""
    from parcialbigdata_spark.sources.binary import (
        parse_mp4_samples,
        read_binary_dir,
    )

    raw = read_binary_dir(spark, MP4STBL, glob="video_stss0.mp4")
    rows = parse_mp4_samples(raw).collect()
    assert len(rows) == 4
    assert not any(r.is_keyframe for r in rows)


def test_mp4_sidx_hierarchy_resolves_ground_truth(spark):
    """sidx references must resolve to the ACTUAL byte spans of the
    boxes they index — anchor + first_offset + cumulative sizes
    checked against a direct top-level box walk of the fixture."""
    from parcialbigdata_spark.sources.binary import (
        parse_mp4_sidx,
        read_binary_dir,
    )

    blob = open(f"{MP4FRAG}/frag_sidx.mp4", "rb").read()
    spans = []
    pos = 0
    while pos + 8 <= len(blob):
        (sz,) = struct.unpack(">I", blob[pos:pos + 4])
        spans.append((blob[pos + 4:pos + 8].decode(), pos, pos + sz))
        pos += sz
    moofs = [(s, e) for t, s, e in spans if t == "moof"]
    mdats = [(s, e) for t, s, e in spans if t == "mdat"]
    sidxs = [(s, e) for t, s, e in spans if t == "sidx"]

    raw = read_binary_dir(spark, MP4FRAG, glob="*.mp4")
    rows = parse_mp4_sidx(raw).collect()
    assert {r.file_name for r in rows} == {"frag_sidx.mp4"}
    top = sorted((r for r in rows if r.sidx_idx == 1),
                 key=lambda r: r.ref_idx)
    # v1 top: two hierarchical references, each starting at its child
    # sidx and ending at its mdat end
    assert [r.version for r in top] == [1, 1]
    assert all(r.is_sidx_ref for r in top)
    assert (top[0].ref_start, top[0].ref_end) == (sidxs[1][0], mdats[0][1])
    assert (top[1].ref_start, top[1].ref_end) == (sidxs[2][0], mdats[1][1])
    # v0 children: leaf references tile exactly moof..mdat-end;
    # child 1's nonzero first_offset skips the free box
    (c1,) = [r for r in rows if r.sidx_idx == 2]
    (c2,) = [r for r in rows if r.sidx_idx == 3]
    assert not c1.is_sidx_ref and not c2.is_sidx_ref
    assert c1.first_offset == 16
    assert (c1.ref_start, c1.ref_end) == (moofs[0][0], mdats[0][1])
    assert (c2.ref_start, c2.ref_end) == (moofs[1][0], mdats[1][1])
    assert c2.earliest_pts == 12600 and c2.sap_delta == 300
    assert c1.starts_with_sap and c1.sap_type == 1


def test_mp4_tfra_seek_map_ground_truth(spark):
    """tfra entries must point at the ACTUAL moof byte offsets, with
    both the v1 64-bit form and v0 + widened variable-width number
    fields decoding identically."""
    from parcialbigdata_spark.sources.binary import (
        parse_mp4_tfra,
        read_binary_dir,
    )

    blob = open(f"{MP4FRAG}/frag_av.mp4", "rb").read()
    moofs = []
    pos = 0
    while pos + 8 <= len(blob):
        (sz,) = struct.unpack(">I", blob[pos:pos + 4])
        if blob[pos + 4:pos + 8] == b"moof":
            moofs.append(pos)
        pos += sz
    assert len(moofs) == 3

    raw = read_binary_dir(spark, MP4FRAG, glob="*.mp4")
    rows = parse_mp4_tfra(raw).collect()
    assert {r.file_name for r in rows} == {"frag_av.mp4"}
    video = sorted((r for r in rows if r.track_id == 1),
                   key=lambda r: r.entry_idx)
    (audio,) = [r for r in rows if r.track_id == 2]
    # v1 video: both keyframes, at moof 1 and moof 3
    assert [(r.version, r.time, r.moof_offset) for r in video] == [
        (1, 0, moofs[0]), (1, 21600, moofs[2])
    ]
    # v0 audio with 2/1/4-byte widened fields still decodes 1/1/1
    assert (audio.version, audio.time, audio.moof_offset) == (
        0, 2048, moofs[1])
    assert (audio.traf_number, audio.trun_number,
            audio.sample_number) == (1, 1, 1)
    # the closing mfro's size field equals the whole mfra box
    mfra_at = blob.index(b"mfra") - 4
    (mfra_sz,) = struct.unpack(">I", blob[mfra_at:mfra_at + 4])
    (mfro_sz,) = struct.unpack(">I", blob[-4:])
    assert mfro_sz == mfra_sz and mfra_at + mfra_sz == len(blob)


def test_mp4_corpus_determinism_and_resolution():
    """The bench corpus is deterministic and the kernel resolves every
    generated sample on both trun field variants (per-sample sizes on
    even files, per-sample durations on odd)."""
    from parcialbigdata_spark.sources.mp4_corpus import mp4_file_bytes

    assert mp4_file_bytes(13)[0] == mp4_file_bytes(13)[0]
    total = 0
    blobs = []
    for i in range(40):
        b, n = mp4_file_bytes(i)
        total += n
        blobs.append((f"frag_{i:05d}.mp4", b))
    rows = _frag_rows(blobs)
    assert len(rows) == total
    by_file: dict = {}
    for r in rows:
        by_file.setdefault(r["file_name"], []).append(r)
    for fn, rs in by_file.items():
        rs.sort(key=lambda r: r["sample_idx"])
        # dts strictly increases across both fragments (tfdt continues)
        assert all(rs[k]["dts"] < rs[k + 1]["dts"]
                   for k in range(len(rs) - 1)), fn
        # exactly the two first_sample_flags samples are keyframes
        assert [r["sample_idx"] for r in rs if r["is_keyframe"]] == [
            1, next(r["sample_idx"] for r in rs if r["moof_seq"] == 2)
        ], fn
        assert {r["timescale"] for r in rs} == {90000}


# -------------------- WebVTT caption extraction --------------------


def test_webvtt_cue_extraction(spark):
    """One row per cue: NOTE blocks skipped by the numbering, hour and
    short timestamp forms, identifier lines, cue settings, multi-line
    payloads; no-magic files contribute nothing."""
    from parcialbigdata_spark.sources.binary import (
        parse_webvtt,
        read_binary_dir,
    )

    raw = read_binary_dir(spark, "/root/repo/tests/fixtures/webvtt",
                          glob="*.vtt")
    rows = parse_webvtt(raw).collect()
    assert {r.file_name for r in rows} == {"talk_a.vtt", "talk_b.vtt"}
    a = sorted((r for r in rows if r.file_name == "talk_a.vtt"),
               key=lambda r: r.cue_idx)
    b = sorted((r for r in rows if r.file_name == "talk_b.vtt"),
               key=lambda r: r.cue_idx)
    # the NOTE block did not become cue 1
    assert len(a) == 4
    assert a[0].text == "Hello and welcome to the talk."
    assert (a[0].start_ms, a[0].end_ms) == (1000, 4250)
    assert a[1].cue_id == "intro-2"
    assert a[1].settings == "align:start position:10%"
    # voice tags kept verbatim; hour-form timestamp exact
    assert a[2].text.startswith("<v Ana>")
    assert a[3].start_ms == ((1 * 60 + 2) * 60 + 3) * 1000 + 500
    # short-form timestamps + newline-preserved multi-line payload
    assert b[0].start_ms == 7000
    assert b[0].text == "Short-form timestamps\nwork without hours."
    assert b[1].cue_id == "42"
    assert all(r.duration_ms == r.end_ms - r.start_ms for r in rows)


def test_webvtt_malformed_inputs():
    """Bad timing lines and non-UTF8 bytes are skipped, not fatal."""
    from parcialbigdata_spark.sources.binary import _parse_webvtt_batches

    def run(blob):
        pdf = pd.DataFrame({"file_name": ["x.vtt"], "content": [blob]})
        return pd.concat(list(_parse_webvtt_batches(iter([pdf]))))

    # a block with --> but an unparseable timing line is skipped AND
    # does not consume a cue index
    txt = ("WEBVTT\n\nnot a --> timing line\n\n"
           "00:00:01.000 --> 00:00:02.000\nreal cue\n")
    out = run(txt.encode())
    assert list(out["cue_idx"]) == [1] and list(out["text"]) == ["real cue"]
    assert len(run(b"\xff\xfe invalid utf8")) == 0
    assert len(run(b"WEBVTT\n\n")) == 0


# -------------------- per-channel audio aHash (stereo swap) --------------------


def test_stereo_channel_swap_caught_by_banded_join(spark):
    """An L/R-swapped stereo dupe is invisible to the channel-0 hash
    but caught by per-channel rows through the shared banded join
    (VERDICT r13 #7)."""
    from parcialbigdata_spark.operators.audiohash import (
        ahash_channel_near_dups,
        wav_ahash_channels,
    )
    from parcialbigdata_spark.sources.binary import read_binary_dir

    raw = read_binary_dir(spark, "/root/repo/tests/fixtures/audiostereo",
                          glob="*.wav")
    hashes = wav_ahash_channels(raw)
    rows = hashes.collect()
    # 3 stereo files × 2 channels
    assert len(rows) == 6
    assert {(r.file_name, r.channel) for r in rows} == {
        (f, c) for f in ("st_pan_a.wav", "st_pan_a_swap.wav", "st_far_b.wav")
        for c in (0, 1)
    }
    pairs = ahash_channel_near_dups(hashes, max_hamming=3).collect()
    got = {(r.file_a, r.chan_a, r.file_b, r.chan_b): r.hamming
           for r in pairs}
    # exactly the two swap orientations — nothing else is near
    assert set(got) == {
        ("st_pan_a.wav", 0, "st_pan_a_swap.wav", 1),
        ("st_pan_a.wav", 1, "st_pan_a_swap.wav", 0),
    }
    assert all(1 <= h <= 3 for h in got.values())


def test_stereo_kernel_channels_and_gain_invariance():
    """Per-channel decode: channel 1 of the swap file hashes exactly
    like a gain-perturbed channel 0 of the original; uniform gain on
    one channel leaves that channel's hash unchanged."""
    from parcialbigdata_spark.operators.audiohash import (
        wav_ahash_channel_bands,
    )

    a = open("/root/repo/tests/fixtures/audiostereo/st_pan_a.wav",
             "rb").read()
    chans = wav_ahash_channel_bands(a)
    assert [c for c, _, _ in chans] == [0, 1]
    (_, n0, b0), (_, n1, b1) = chans
    assert n0 == n1 and b0 != b1
    # mono kernel == channel 0 of the stereo kernel on a mono file
    from parcialbigdata_spark.operators.audiohash import wav_ahash_bands

    mono = open("/root/repo/tests/fixtures/audiohash/tone_a.wav",
                "rb").read()
    n, bands = wav_ahash_bands(mono)
    [(c, nc, bc)] = wav_ahash_channel_bands(mono)
    assert (c, nc, bc) == (0, n, bands)


def test_iter_boxes_header_forms():
    """_iter_boxes: 32-bit, size==1 largesize, size==0 to-EOF, and the
    malformed stops (short largesize header, size past the end)."""
    from parcialbigdata_spark.sources.binary import _iter_boxes

    b32 = struct.pack(">I", 12) + b"abcd" + b"1234"
    large = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 20) + b"xxxx"
    eof = struct.pack(">I", 0) + b"free" + b"tail"
    blob = b32 + large + eof
    got = list(_iter_boxes(blob, 0, len(blob)))
    assert [(t, bs, ps, be) for t, bs, ps, be in got] == [
        (b"abcd", 0, 8, 12),
        (b"mdat", 12, 28, 32),
        (b"free", 32, 40, 44),
    ]
    # largesize header truncated → stop, no crash
    assert list(_iter_boxes(struct.pack(">I", 1) + b"mdat" + b"\x00" * 4,
                            0, 12)) == []
    # declared size overruns the container → stop
    assert list(_iter_boxes(struct.pack(">I", 99) + b"abcd", 0, 8)) == []
