"""Generate minimal REAL ISO-BMFF (MP4 family) box streams as
multimodal fixtures for the box-walk parser — structurally valid per
ISO/IEC 14496-12 (ftyp/free/mdat boxes, correct big-endian sizes,
including the size==1 largesize and size==0 to-end forms), though not
playable media (no moov — the container layer is the point).

Deterministic output — run once, commit the bytes:
    python tools/gen_mp4_fixtures.py
writes tests/fixtures/mp4/*.mp4
"""

from __future__ import annotations

import pathlib
import struct

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "mp4"


def box(btype: bytes, payload: bytes, *, large: bool = False, to_end: bool = False) -> bytes:
    if to_end:
        return struct.pack(">I", 0) + btype + payload
    if large:
        return struct.pack(">I", 1) + btype + struct.pack(">Q", 16 + len(payload)) + payload
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def ftyp(major: bytes, brands: "list[bytes]") -> bytes:
    return box(b"ftyp", major + struct.pack(">I", 0x200) + b"".join(brands))


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    files = {
        "plain.mp4": ftyp(b"isom", [b"isom", b"mp41"])
        + box(b"free", b"\x00" * 16)
        + box(b"mdat", bytes(range(64))),
        "largesize.mp4": ftyp(b"isom", [b"isom"])
        + box(b"mdat", b"\xab" * 40, large=True),
        "toend.mp4": ftyp(b"mp42", [b"mp42", b"isom"])
        + box(b"mdat", b"\xcd" * 24, to_end=True),
    }
    for name, data in files.items():
        (OUT / name).write_bytes(data)
        print(f"wrote {OUT / name} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
