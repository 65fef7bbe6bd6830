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
