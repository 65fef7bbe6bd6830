"""Generate minimal structurally-valid JPEG (JFIF) fixtures for the
marker-segment parser (r12) — stdlib ``struct`` only, no codec.

A JPEG is SOI (FFD8) followed by marker segments (FF xx + big-endian
2-byte length including itself + payload) up to SOS (FFDA), whose
header is followed by entropy-coded data the HEADER parser does not
decode (that is the honest ``real_decode`` stub's job); the stream
ends with EOI (FFD9). The fixtures' entropy bytes contain no 0xFF, so
the segment walk's stop-at-SOS + trailing-EOI check is exact and the
DuckDB oracle can replay it from the blob hex.

Fixtures:
- ``gray_e.jpg``        — baseline SOF0, 1 component, 16×8, 1 DQT/DHT
- ``rgb_f.jpg``         — baseline SOF0, 3 components, 64×48, 2 DQT,
                          2 DHT, APP0 + APP1(Exif stub)
- ``progressive_g.jpg`` — SOF2 (progressive), 3 components, 32×32
- ``trunc_h.jpg``       — EOI missing (structure_ok = false)
- ``notjpeg_i.bin``     — wrong magic: excluded by both engines
- ``padded_j.jpg``      — r13 (ADVICE r12): 0xFF FILL BYTES before
                          several marker codes (ITU-T T.81 §B.1.1.2
                          allows any number) — spec-valid padding both
                          engines must skip without misreading a
                          length

Deterministic output — run once, commit the bytes:
    python tools/gen_jpeg_fixtures.py
writes tests/fixtures/jpeg/*
"""

from __future__ import annotations

import pathlib
import struct

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "jpeg"

SOI, EOI = b"\xff\xd8", b"\xff\xd9"


def seg(code: int, payload: bytes) -> bytes:
    return bytes([0xFF, code]) + struct.pack(">H", len(payload) + 2) + payload


def app0() -> bytes:
    return seg(0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 72, 72) + b"\x00\x00")


def app1_exif() -> bytes:
    return seg(0xE1, b"Exif\x00\x00" + b"II*\x00" + b"\x08\x00\x00\x00" + b"\x00\x00")


def dqt(table_id: int) -> bytes:
    return seg(0xDB, bytes([table_id]) + bytes((i * 7 + 3) % 255 + 1 for i in range(64)))


def dht(table_id: int) -> bytes:
    counts = bytes([0, 1] + [0] * 14)  # one 2-bit code
    return seg(0xC4, bytes([table_id]) + counts + bytes([0]))


def sof(code: int, w: int, h: int, ncomp: int) -> bytes:
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(ncomp))
    return seg(code, bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp]) + comps)


def sos(ncomp: int) -> bytes:
    comps = b"".join(bytes([i + 1, 0]) for i in range(ncomp))
    return seg(0xDA, bytes([ncomp]) + comps + bytes([0, 63, 0]))


def entropy(n: int) -> bytes:
    # no 0xFF anywhere → the stop-at-SOS walk and EOI check are exact
    return bytes((i * 37 + 11) % 255 for i in range(n))


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    gray = SOI + app0() + dqt(0) + sof(0xC0, 16, 8, 1) + dht(0) + sos(1) + entropy(40) + EOI
    rgb = (
        SOI + app0() + app1_exif() + dqt(0) + dqt(1)
        + sof(0xC0, 64, 48, 3) + dht(0) + dht(1) + sos(3) + entropy(200) + EOI
    )
    prog = SOI + app0() + dqt(0) + sof(0xC2, 32, 32, 3) + dht(0) + sos(3) + entropy(90) + EOI
    trunc = gray[:-2]  # EOI missing
    fill = b"\xff"  # T.81 B.1.1.2 fill byte: FF FF .. FF <code>
    padded = (
        SOI + fill + app0() + dqt(0) + fill * 3 + sof(0xC0, 24, 12, 1)
        + dht(0) + fill * 2 + sos(1) + entropy(40) + EOI
    )
    files = {
        "gray_e.jpg": gray, "rgb_f.jpg": rgb, "progressive_g.jpg": prog,
        "trunc_h.jpg": trunc, "notjpeg_i.bin": b"NOPE" + entropy(30),
        "padded_j.jpg": padded,
    }
    for name, data in files.items():
        (OUT / name).write_bytes(data)
        print(f"wrote {OUT / name} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
