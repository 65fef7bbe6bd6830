"""Multimodal binary-column tests: binaryFile scan, fake-decoder
feature extraction, frame sampling, and the real-codec stub contract."""

from __future__ import annotations

import hashlib

import pytest

from parcialbigdata_spark.sources.binary import (
    _fake_decode,
    extract_features,
    frame_sample_stub,
    read_binary_dir,
    real_decode,
)

MEDIA_DIR = "/root/repo/tests/fixtures/media"


def test_read_binary_dir(spark):
    rows = {r.file_name: r for r in read_binary_dir(spark, MEDIA_DIR).collect()}
    assert set(rows) == {
        "img_001.fakeimg",
        "img_002.fakeimg",
        "aud_001.fakeaud",
        "vid_001.fakevid",
    }
    img = rows["img_001.fakeimg"]
    assert img.length == 264
    raw = open(f"{MEDIA_DIR}/img_001.fakeimg", "rb").read()
    assert bytes(img.content) == raw
    assert img.md5_hex == hashlib.md5(raw.hex().upper().encode()).hexdigest()


def test_fake_decode_headers():
    img = open(f"{MEDIA_DIR}/img_001.fakeimg", "rb").read()
    meta = _fake_decode(img)
    assert meta["kind"] == "image" and (meta["width"], meta["height"]) == (64, 48)
    aud = open(f"{MEDIA_DIR}/aud_001.fakeaud", "rb").read()
    meta = _fake_decode(aud)
    assert meta["kind"] == "audio" and meta["sample_rate"] == 16000
    vid = open(f"{MEDIA_DIR}/vid_001.fakevid", "rb").read()
    meta = _fake_decode(vid)
    assert meta["kind"] == "video" and meta["n_frames"] == 10
    assert len(meta["feature"]) == 8
    assert all(0.0 <= x <= 1.0 for x in meta["feature"])


def test_extract_features_df(spark):
    raw = spark.read.format("binaryFile").load(MEDIA_DIR)
    feats = {r.file_name: r for r in extract_features(raw).collect()}
    assert feats["img_002.fakeimg"].width == 32
    assert feats["aud_001.fakeaud"].sample_rate == 16000
    assert feats["vid_001.fakevid"].kind == "video"
    assert len(feats["img_001.fakeimg"].feature) == 8


def test_frame_sample_stub(spark):
    raw = spark.read.format("binaryFile").load(MEDIA_DIR)
    frames = frame_sample_stub(raw, every_n=4).collect()
    # vid_001 has 10 frames → sampled 0, 4, 8
    assert sorted(r.frame_idx for r in frames) == [0, 4, 8]
    assert all(r.file_name == "vid_001.fakevid" for r in frames)


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        real_decode(b"FIMG\x00\x01\x00\x01")


def test_parse_png_real_files_and_corruption(spark, tmp_path):
    """The committed fixtures are REAL PNGs: parse recovers IHDR fields
    and every-chunk CRC validates. A flipped payload byte must flip
    crc_ok; truncation and non-PNG bytes degrade gracefully."""
    import shutil

    from parcialbigdata_spark.sources.binary import parse_png, read_binary_dir

    src = "/root/repo/tests/fixtures/png"
    rows = {
        r.file_name: r
        for r in parse_png(read_binary_dir(spark, src, glob="*.png")).collect()
    }
    red = rows["red_7x5.png"]
    assert (red.width, red.height, red.bit_depth, red.color_type) == (7, 5, 8, 2)
    assert red.chunk_types == "IHDR,IDAT,IEND" and red.crc_ok
    gray = rows["gray_16x9.png"]
    assert (gray.width, gray.height, gray.color_type) == (16, 9, 0)
    assert gray.chunk_types == "IHDR,tEXt,IDAT,IEND" and gray.crc_ok
    assert rows["rgba_4x4.png"].color_type == 6
    assert all(r.idat_bytes > 0 for r in rows.values())

    # corrupt: flip one IDAT payload byte; truncate; garbage
    bad = tmp_path / "bad"
    bad.mkdir()
    orig = (pathlib := __import__("pathlib")).Path(src) / "red_7x5.png"
    data = bytearray(orig.read_bytes())
    data[-20] ^= 0xFF
    (bad / "flipped.png").write_bytes(bytes(data))
    (bad / "truncated.png").write_bytes(orig.read_bytes()[:40])
    (bad / "noise.png").write_bytes(b"not a png at all, clearly")
    shutil.copy(orig, bad / "good.png")
    got = {
        r.file_name: r
        for r in parse_png(read_binary_dir(spark, str(bad), glob="*.png")).collect()
    }
    assert got["good.png"].crc_ok
    assert not got["flipped.png"].crc_ok          # CRC catches the bit flip
    assert got["flipped.png"].width == 7          # header still parses
    assert not got["truncated.png"].crc_ok
    assert not got["noise.png"].crc_ok and got["noise.png"].chunk_count == 0


def test_parse_wav_real_files_and_corruption(spark, tmp_path):
    """Committed fixtures are genuine PCM WAVs; fmt fields, frame math
    and the RIFF size equality must hold. A wrong RIFF size field or a
    truncated chunk flips riff_size_ok."""
    import pathlib
    import shutil

    from parcialbigdata_spark.sources.binary import parse_wav, read_binary_dir

    src = "/root/repo/tests/fixtures/wav"
    rows = {
        r.file_name: r
        for r in parse_wav(read_binary_dir(spark, src, glob="*.wav")).collect()
    }
    mono = rows["tone_8k_mono.wav"]
    assert (mono.channels, mono.sample_rate, mono.bits_per_sample) == (1, 8000, 16)
    assert mono.audio_format == 1 and mono.chunk_types == "fmt,data"
    assert mono.n_frames == 160 and mono.duration_ms == 160 * 1000 // 8000
    stereo = rows["tone_16k_stereo.wav"]
    assert (stereo.channels, stereo.sample_rate) == (2, 16000)
    assert stereo.data_bytes == 200 * 2 * 2
    assert rows["tone_22k_8bit.wav"].bits_per_sample == 8
    assert all(r.riff_size_ok for r in rows.values())

    bad = tmp_path / "bad"
    bad.mkdir()
    orig = pathlib.Path(src) / "tone_8k_mono.wav"
    data = bytearray(orig.read_bytes())
    data[4] ^= 0x01  # corrupt the RIFF size field
    (bad / "badsize.wav").write_bytes(bytes(data))
    (bad / "truncated.wav").write_bytes(orig.read_bytes()[:50])
    shutil.copy(orig, bad / "good.wav")
    got = {
        r.file_name: r
        for r in parse_wav(read_binary_dir(spark, str(bad), glob="*.wav")).collect()
    }
    assert got["good.wav"].riff_size_ok
    assert not got["badsize.wav"].riff_size_ok
    assert got["badsize.wav"].sample_rate == 8000  # fields still parse
    assert not got["truncated.wav"].riff_size_ok


def test_parse_png_roundtrips_generator_parameters(spark):
    """Property: for a grid of generated (width, height, color_type)
    PNGs, the parser must recover exactly the parameters the generator
    was called with — parser and generator are independent codepaths
    (struct-pack vs struct-unpack)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from gen_png_fixtures import png

    from parcialbigdata_spark.sources.binary import parse_png

    cases = [
        (w, h, ct, px)
        for (w, h) in ((1, 1), (3, 7), (31, 2))
        for (ct, px) in ((2, b"\x01\x02\x03"), (0, b"\x7f"), (6, b"\x01\x02\x03\x04"))
    ]
    rows = [
        (f"{w}x{h}-{ct}.png", bytearray(png(w, h, ct, 8, px)))
        for w, h, ct, px in cases
    ]
    df = spark.createDataFrame(rows, "file_name string, content binary")
    got = {r.file_name: r for r in parse_png(df).collect()}
    for w, h, ct, _px in cases:
        r = got[f"{w}x{h}-{ct}.png"]
        assert (r.width, r.height, r.color_type, r.bit_depth) == (w, h, ct, 8)
        assert r.crc_ok and r.chunk_types == "IHDR,IDAT,IEND"


def test_parse_mp4_box_forms_and_corruption(spark, tmp_path):
    """All three ISO-BMFF size forms parse; corrupt structures fail the
    exact-tiling check but salvage what they can."""
    import pathlib
    import shutil
    import struct
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from parcialbigdata_spark.sources.binary import parse_mp4, read_binary_dir

    src = "/root/repo/tests/fixtures/mp4"
    rows = {
        r.file_name: r
        for r in parse_mp4(read_binary_dir(spark, src, glob="*.mp4")).collect()
    }
    plain = rows["plain.mp4"]
    assert plain.major_brand == "isom" and plain.compatible_brands == "isom,mp41"
    assert plain.box_types == "ftyp,free,mdat" and plain.mdat_bytes == 64
    assert plain.structure_ok and not plain.uses_largesize
    large = rows["largesize.mp4"]
    assert large.uses_largesize and large.mdat_bytes == 40 and large.structure_ok
    toend = rows["toend.mp4"]
    assert toend.major_brand == "mp42" and toend.mdat_bytes == 24 and toend.structure_ok

    bad = tmp_path / "bad"
    bad.mkdir()
    orig = pathlib.Path(src) / "plain.mp4"
    data = bytearray(orig.read_bytes())
    struct.pack_into(">I", data, 24, 10_000)  # free box claims 10kB
    (bad / "oversize.mp4").write_bytes(bytes(data))
    (bad / "truncated.mp4").write_bytes(orig.read_bytes()[:30])
    shutil.copy(orig, bad / "good.mp4")
    got = {
        r.file_name: r
        for r in parse_mp4(read_binary_dir(spark, str(bad), glob="*.mp4")).collect()
    }
    assert got["good.mp4"].structure_ok
    over = got["oversize.mp4"]
    assert not over.structure_ok and over.box_types == "ftyp"  # walk stops at the lie
    assert over.major_brand == "isom"
    assert not got["truncated.mp4"].structure_ok
