"""Round-13 operator tests.

1. ``_sn_bucketize`` LCP-strip fix (VERDICT r12 #1 / top_next): on
   common-prefix key domains (every TPC-H ``c_name`` starts
   ``Customer#``) the un-stripped 7-byte proxy was CONSTANT — every
   quantile cut equal, every row in bucket 0, pass 1 degenerating to
   the single-partition global sort the operator exists to avoid.
   The fix strips the domain's longest common prefix (one binary
   min/max agg + driver-side byte compare) before the 7-byte window.
   Tests pin: >1 populated bucket on ``Customer#NNNNN``-style keys at
   sf0.1 scale, pass-1 window parallelism > 1, and byte-for-byte
   equality with the single-reducer global run (exactness must
   survive the proxy change).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from parcialbigdata_spark.operators.linkage import (
    _sn_bucketize,
    sorted_neighborhood_pairs,
    sorted_neighborhood_pairs_global,
)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _pairset(df):
    return {
        (r.id_a, r.id_b, r.key_a, r.key_b, r.pos_gap) for r in df.collect()
    }


def test_sn_bucketize_multi_bucket_on_common_prefix_keys(spark):
    # The degeneracy fixture: formatted-ID keys sharing a long prefix.
    rows = [(i, f"Customer#{i:09d}") for i in range(5000)]
    df = spark.createDataFrame(rows, "id bigint, k string").repartition(8)
    b = _sn_bucketize(df, "id", "k", num_buckets=8)
    pops = b.groupBy("__bucket").count().collect()
    assert len(pops) > 1, "common-prefix keys must spread across buckets"
    # balanced-ish: no bucket holds more than half the rows
    assert max(r["count"] for r in pops) < 5000 * 0.5


def test_sn_bucketize_multi_bucket_on_sf01_customer(spark):
    cust = spark.read.parquet(os.path.join(SF01, "customer.parquet"))
    b = _sn_bucketize(cust, "c_custkey", "c_name", num_buckets=8)
    pops = b.groupBy("__bucket").count().collect()
    n = sum(r["count"] for r in pops)
    assert len(pops) >= 6, f"sf0.1 c_name must populate ~8 buckets, got {len(pops)}"
    assert max(r["count"] for r in pops) < n * 0.5


def test_sn_global_no_single_partition_window_on_prefix_keys(spark):
    # The scale contract: with >1 populated bucket, the pass-1 window
    # partitions by __bucket so its sort runs on >1 task. Count the
    # actual partitions carrying rows after the window's exchange.
    rows = [(i, f"Customer#{i:09d}") for i in range(4000)]
    df = spark.createDataFrame(rows, "id bigint, k string").repartition(8)
    b = _sn_bucketize(df, "id", "k", num_buckets=8)
    shuffled = b.repartition(32, "__bucket")  # the window's exchange shape
    nonempty = (
        shuffled.rdd.mapPartitions(lambda it: [1] if next(it, None) else [])
        .count()
    )
    assert nonempty > 1, "pass-1 sort must not land on a single task"


def test_sn_global_exact_on_prefix_keys(spark):
    # Exactness must survive the LCP strip: byte-for-byte equality
    # with the single-reducer global run on the degeneracy fixture.
    rows = [(i, f"Customer#{(i * 37) % 900:09d}") for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, k string").repartition(7)
    ref = _pairset(sorted_neighborhood_pairs(df, "id", "k", window=3))
    got = _pairset(
        sorted_neighborhood_pairs_global(df, "id", "k", window=3, num_buckets=6)
    )
    assert got == ref
    assert len(ref) > 0


def test_sn_bucketize_all_equal_keys_single_bucket(spark):
    # Degenerate DATA (every key identical) is genuinely one bucket:
    # the LCP is the whole key, the stripped proxy is 0 everywhere,
    # and correctness still holds via the single populated bucket.
    rows = [(i, "same-key") for i in range(50)]
    df = spark.createDataFrame(rows, "id bigint, k string")
    b = _sn_bucketize(df, "id", "k", num_buckets=4)
    assert b.select("__bucket").distinct().count() == 1
    ref = _pairset(sorted_neighborhood_pairs(df, "id", "k", window=2))
    got = _pairset(
        sorted_neighborhood_pairs_global(df, "id", "k", window=2, num_buckets=4)
    )
    assert got == ref


# -------------------- MP4 ladder r13: keyframes, multi-trak, avcC,
# malformed-table robustness (ADVICE r12)

MP4STBL = "/root/repo/tests/fixtures/mp4stbl"


def _mp4_rows(spark, blobs):
    """Run the sample kernel over in-memory (name, bytes) blobs."""
    from parcialbigdata_spark.sources.binary import parse_mp4_samples

    df = spark.createDataFrame(
        [(n, bytearray(b)) for n, b in blobs], "file_name string, content binary"
    )
    return parse_mp4_samples(df).collect()


def test_mp4_keyframes_and_multitrak(spark):
    from parcialbigdata_spark.sources.binary import (
        parse_mp4_samples,
        read_binary_dir,
    )

    raw = read_binary_dir(spark, MP4STBL, glob="*.mp4")
    rows = parse_mp4_samples(raw).collect()
    kf = {
        (r.track_idx, r.sample_idx): r.is_keyframe
        for r in rows
        if r.file_name == "video_kf.mp4"
    }
    assert [s for (t, s), k in sorted(kf.items()) if k] == [1, 4, 7]
    mt = [r for r in rows if r.file_name == "video_mt.mp4"]
    assert {r.track_idx for r in mt} == {1, 2}
    # video trak: stss {1,3}; audio trak: no stss → all keyframes
    assert sorted(
        r.sample_idx for r in mt if r.track_idx == 1 and r.is_keyframe
    ) == [1, 3]
    assert all(r.is_keyframe for r in mt if r.track_idx == 2)
    # both traks' byte ranges resolve into the shared mdat with no overlap
    spans = sorted((r.byte_offset, r.byte_offset + r.sample_size) for r in mt)
    assert all(spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1))


def test_mp4_codec_config(spark):
    from parcialbigdata_spark.sources.binary import (
        parse_mp4_codec,
        read_binary_dir,
    )

    raw = read_binary_dir(spark, MP4STBL, glob="*.mp4")
    rows = {
        (r.file_name, r.track_idx): r for r in parse_mp4_codec(raw).collect()
    }
    v = rows[("video_kf.mp4", 1)]
    assert (v.entry_format, v.width, v.height) == ("avc1", 640, 360)
    assert (v.avc_profile, v.avc_level, v.nal_length_size, v.num_sps) == (
        100, 31, 4, 1,
    )
    a = rows[("video_mt.mp4", 2)]
    assert a.entry_format == "mp4a"
    assert a.width is None and a.avc_profile is None


def _mutate(blob: bytes, needle: bytes, patch: bytes, at: int = 0) -> bytes:
    i = blob.index(needle)
    start = i + 4 + at  # needle = 4cc; payload starts after version/flags
    return blob[:start] + patch + blob[start + len(patch):]


def test_mp4_malformed_tables_degrade_to_no_rows(spark):
    """ADVICE r12: hostile count fields / non-covering stsc must not
    crash the job — the malformed trak contributes no rows, like every
    other kernel in the module."""
    import struct

    good = open(f"{MP4STBL}/video_a.mp4", "rb").read()

    # stsz per-size count far beyond the table body
    bad_stsz = _mutate(good, b"stsz", struct.pack(">II", 0, 0x7FFFFFFF), at=4)
    # stsc whose single run starts at chunk 2 (chunk 1 uncovered —
    # the empty-max() crash in the r12 kernel)
    bad_stsc = _mutate(good, b"stsc", struct.pack(">III", 2, 4, 1), at=8)
    # stsc run count larger than the box holds
    bad_runs = _mutate(good, b"stsc", struct.pack(">I", 1000), at=4)
    # stco chunk count larger than the box holds
    bad_stco = _mutate(good, b"stco", struct.pack(">I", 0x00FFFFFF), at=4)
    # uniform stsz whose n*uniform cannot fit in the file
    bad_uniform = _mutate(good, b"stsz", struct.pack(">II", 1 << 20, 1 << 20), at=4)
    # truncated-to-nothing stss appended case: malformed sync table
    rows = _mp4_rows(
        spark,
        [
            ("bad_stsz.mp4", bad_stsz),
            ("bad_stsc.mp4", bad_stsc),
            ("bad_runs.mp4", bad_runs),
            ("bad_stco.mp4", bad_stco),
            ("bad_uniform.mp4", bad_uniform),
            ("good.mp4", good),
        ],
    )
    by_file = {}
    for r in rows:
        by_file.setdefault(r.file_name, []).append(r)
    assert set(by_file) == {"good.mp4"}
    assert len(by_file["good.mp4"]) == 10


def test_jpeg_fill_bytes_skipped(spark):
    """ADVICE r12: 0xFF fill bytes before a marker code are legal
    padding (ITU-T T.81 §B.1.1.2); the walk must skip them instead of
    reading a bogus segment length."""
    from parcialbigdata_spark.sources.binary import (
        parse_jpeg,
        read_binary_dir,
    )

    raw = read_binary_dir(spark, "/root/repo/tests/fixtures/jpeg", glob="*")
    rows = {r.file_name: r for r in parse_jpeg(raw).collect()}
    p = rows["padded_j.jpg"]
    assert (p.width, p.height, p.n_components) == (24, 12, 1)
    assert p.structure_ok and not p.progressive
    assert p.n_quant_tables == 1 and p.n_huffman_tables == 1
    # unpadded fixtures keep parsing as before
    g = rows["gray_e.jpg"]
    assert (g.width, g.height, g.structure_ok) == (16, 8, True)


# -------------------- streaming media store: intra-batch pairs +
# reused-pairs_dir scoping (ADVICE r12)


def _phash_stream(spark, base, batches):
    """Write ordered micro-batch files from lists of fixture names."""
    import os
    import time as _time

    from parcialbigdata_spark.queries import _write_stream_file
    from parcialbigdata_spark.sources.binary import read_binary_dir

    raw = read_binary_dir(spark, "/root/repo/tests/fixtures/phash", glob="*.png")
    stream_dir = os.path.join(base, "stream")
    os.makedirs(stream_dir, exist_ok=True)
    now = _time.time()
    for i, names in enumerate(batches):
        part = raw.filter(F.col("file_name").isin(list(names)))
        _write_stream_file(base, stream_dir, part, f"b{i}", now - 600 + 60 * i)
    return stream_dir


def test_media_store_intra_batch_pairs_and_pairs_dir_scoping(spark):
    import os
    import shutil
    import tempfile

    from parcialbigdata_spark.streaming.media_store import (
        run_streaming_phash_index,
    )

    bands_t = "r13_media_store_test"
    base = tempfile.mkdtemp(prefix="r13-mediastore-")
    pairs_dir = os.path.join(base, "pairs")
    os.makedirs(pairs_dir)
    try:
        # Run 1: grad_a AND its dup land in the SAME seed batch —
        # r12 reported them unique; r13 must emit the pair from the
        # in-batch self-join, oriented later-name → new_file.
        s1 = os.path.join(base, "run1")
        os.makedirs(s1)
        d1 = _phash_stream(
            spark, s1,
            [["grad_a.png", "grad_a_dup.png", "noise_c.png"],
             ["checker_b.png"]],
        )
        got1 = {
            (r.new_file, r.old_file)
            for r in run_streaming_phash_index(
                spark, d1, bands_t, pairs_dir=pairs_dir
            ).collect()
        }
        assert ("grad_a_dup.png", "grad_a.png") in got1
        # Run 2 reuses pairs_dir with FEWER epochs: run 1's stale
        # epoch_1 output must not leak into the result.
        s2 = os.path.join(base, "run2")
        os.makedirs(s2)
        d2 = _phash_stream(spark, s2, [["noise_c.png", "rgba_d.png"]])
        got2 = {
            (r.new_file, r.old_file)
            for r in run_streaming_phash_index(
                spark, d2, bands_t, pairs_dir=pairs_dir
            ).collect()
        }
        assert got2 == set()  # noise/rgba are not near-dups; no stale pairs
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {bands_t}")
        spark.sql(f"DROP TABLE IF EXISTS {bands_t}__compact")
        shutil.rmtree(base, ignore_errors=True)


def test_audio_corpus_wav_bytes_deterministic_and_decodable():
    """The 10k-clip bench corpus (r13, the audio mirror of the r12
    phash corpus) must be deterministic and every clip decodable by
    the real aHash kernel. Spot-check a base clip and its planted
    near-dup: identical across calls, Hamming ≤ 3 between the pair
    (the 4-band pigeonhole recall contract)."""
    from parcialbigdata_spark.operators.audiohash import wav_ahash_bands
    from parcialbigdata_spark.sources.audio_corpus import _wav_bytes

    base = _wav_bytes(8, None)
    assert base == _wav_bytes(8, None)
    dup = _wav_bytes(9, 8)
    assert dup == _wav_bytes(9, 8) and dup != base
    rb = wav_ahash_bands(base)
    rd = wav_ahash_bands(dup)
    assert rb is not None and rd is not None
    (_, bb), (_, bd) = rb, rd
    hamming = sum(bin(a ^ b).count("1") for a, b in zip(bb, bd))
    assert hamming <= 3
    # hashes must scatter: two unrelated clips differ by far more
    (_, bo) = wav_ahash_bands(_wav_bytes(30, None))
    far = sum(bin(a ^ b).count("1") for a, b in zip(bb, bo))
    assert far > 3


def test_mp4_timing_dts_timescale_co64(spark):
    """r13 timing rung: stts run expansion, version-aware mdhd
    timescale, and co64 64-bit chunk offsets."""
    from parcialbigdata_spark.sources.binary import (
        parse_mp4_samples,
        read_binary_dir,
    )

    raw = read_binary_dir(spark, MP4STBL, glob="*.mp4")
    rows = parse_mp4_samples(raw).collect()
    kf = sorted(
        (r.sample_idx, r.dts) for r in rows if r.file_name == "video_kf.mp4"
    )
    # two-run ladder: 3 samples at delta 400, then 6 at delta 500
    assert [d for _, d in kf] == [0, 400, 800, 1200, 1700, 2200, 2700, 3200, 3700]
    mt = [r for r in rows if r.file_name == "video_mt.mp4"]
    assert {r.timescale for r in mt if r.track_idx == 1} == {600}
    assert {r.timescale for r in mt if r.track_idx == 2} == {1000}
    # audio trak uses co64 — its offsets still land inside the file
    blob_len = len(open(f"{MP4STBL}/video_mt.mp4", "rb").read())
    for r in mt:
        if r.track_idx == 2:
            assert 0 < r.byte_offset < blob_len
    # single-delta fixtures: dts == sample_idx - 1
    a = [r for r in rows if r.file_name == "video_a.mp4"]
    assert all(r.dts == r.sample_idx - 1 for r in a)


def test_mp4_time_sample_first_per_second(spark):
    from parcialbigdata_spark.queries import QUERIES

    rows = QUERIES["mp4_time_sample_media"](spark, "unused").collect()
    kf = {
        (r.sec, r.sample_idx)
        for r in rows
        if r.file_name == "video_kf.mp4"
    }
    # seconds 0,0,0,1,1,2,2,3,3 → first of each second = samples 1,4,6,8
    assert kf == {(0, 1), (1, 4), (2, 6), (3, 8)}
    mtv = {
        (r.sec, r.sample_idx)
        for r in rows
        if r.file_name == "video_mt.mp4" and r.track_idx == 1
    }
    # dts 0,512,1024,1536,2048,2560 at timescale 600 → secs 0,0,1,2,3,4
    assert mtv == {(0, 1), (1, 3), (2, 4), (3, 5), (4, 6)}


def test_mp4_ctts_pts_and_reorder(spark):
    """r13 pts rung: ctts v1 signed composition offsets shift pts off
    dts; samples without ctts keep pts == dts."""
    from parcialbigdata_spark.queries import QUERIES
    from parcialbigdata_spark.sources.binary import (
        parse_mp4_samples,
        read_binary_dir,
    )

    raw = read_binary_dir(spark, MP4STBL, glob="*.mp4")
    rows = parse_mp4_samples(raw).collect()
    kf = {r.sample_idx: r for r in rows if r.file_name == "video_kf.mp4"}
    # offsets +800 (s1), -100 (s2-3), +100 (s4-9)
    assert [kf[i].pts for i in range(1, 10)] == [
        800, 300, 700, 1300, 1800, 2300, 2800, 3300, 3800,
    ]
    assert all(
        r.pts == r.dts for r in rows if r.file_name != "video_kf.mp4"
    )
    ranked = QUERIES["mp4_pts_order_media"](spark, "unused").collect()
    kfr = {
        r.sample_idx: r for r in ranked if r.file_name == "video_kf.mp4"
    }
    # pts order: s2(300) s3(700) s1(800) s4.. → ranks 3,1,2,4,5,...
    assert (kfr[1].pts_rank, kfr[2].pts_rank, kfr[3].pts_rank) == (3, 1, 2)
    assert kfr[1].reordered and kfr[2].reordered and kfr[3].reordered
    assert not kfr[4].reordered
    # ctts-free traks are never flagged
    assert not any(
        r.reordered for r in ranked if r.file_name != "video_kf.mp4"
    )


def test_wav_stereo_channel0_stride():
    """_decode_wav_pcm16 takes channel 0 of multi-channel PCM; a
    stereo file with distinct L/R content must hash like its
    mono-left twin (stride logic, not interleaved garbage)."""
    import struct

    from parcialbigdata_spark.operators.audiohash import wav_ahash_bands
    from parcialbigdata_spark.sources.audio_corpus import _wav_bytes

    mono = _wav_bytes(3, None)
    data = mono[44:]
    left = [struct.unpack_from("<h", data, 2 * i)[0] for i in range(len(data) // 2)]
    # interleave: right channel is a loud square wave (different hash
    # if the stride were wrong)
    inter = b"".join(
        struct.pack("<hh", s, 30000 if i % 2 else -30000)
        for i, s in enumerate(left)
    )
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(inter)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", len(inter))
    )
    r_mono = wav_ahash_bands(mono)
    r_stereo = wav_ahash_bands(hdr + inter)
    assert r_mono is not None and r_stereo is not None
    assert r_mono[1] == r_stereo[1], "channel-0 extraction must ignore R"


def test_mp4_mdhd_version1_timescale(spark):
    """mdhd v1 stores 64-bit ctime/mtime, pushing timescale to payload
    offset 20 — the kernel's version-aware read."""
    import struct

    good = open(f"{MP4STBL}/video_a.mp4", "rb").read()
    i = good.index(b"mdhd")
    # v0 box = 32 bytes: size(4) 4cc(4) ver/flags(4) ctime(4) mtime(4)
    # timescale(4) duration(4) lang+pre(4)
    old_box = good[i - 4:i + 28]
    (ts0,) = struct.unpack(">I", good[i + 4 + 12:i + 4 + 16])
    assert ts0 == 1000
    v1_payload = (
        b"\x01\x00\x00\x00"              # version 1
        + b"\x00" * 16                    # 64-bit ctime + mtime
        + struct.pack(">I", 2500)         # timescale
        + struct.pack(">Q", 10)           # 64-bit duration
        + good[i + 4 + 20:i + 4 + 24]     # lang/pre
    )
    new_box = struct.pack(">I", 8 + len(v1_payload)) + b"mdhd" + v1_payload
    # same-size swap keeps every other offset valid? v1 box is 12
    # bytes longer — so instead splice and accept that only mdhd-
    # dependent fields change: the container walk tolerates the size
    # change because every enclosing box size must grow too; patch
    # them all (moov > trak > mdia enclose mdhd).
    blob = good
    grow = len(new_box) - len(old_box)
    pos_mdhd = i - 4
    blob = blob[:pos_mdhd] + new_box + blob[pos_mdhd + len(old_box):]
    for btype in (b"mdia", b"trak", b"moov"):
        j = blob.index(btype)
        (sz,) = struct.unpack(">I", blob[j - 4:j])
        blob = blob[:j - 4] + struct.pack(">I", sz + grow) + blob[j:]
    rows = _mp4_rows(spark, [("v1.mp4", blob)])
    # stco offsets now point `grow` bytes early — byte ranges shift,
    # but the timescale read is what this test pins
    assert rows and all(r.timescale == 2500 for r in rows)
