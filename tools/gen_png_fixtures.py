"""Generate small REAL PNG files (stdlib-only: struct + zlib) as
multimodal fixtures for the PNG header/chunk parser.

Deterministic output — run once, commit the bytes:
    python tools/gen_png_fixtures.py
writes tests/fixtures/media/png/*.png
"""

from __future__ import annotations

import pathlib
import struct
import zlib

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "png"

SIG = b"\x89PNG\r\n\x1a\n"


def chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png(width: int, height: int, color_type: int, bit_depth: int, pixel: bytes, extra=()) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    nchan = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    row = b"\x00" + pixel * (width * nchan // len(pixel))
    idat = zlib.compress(row * height, 6)
    body = [chunk(b"IHDR", ihdr)]
    body += [chunk(t, d) for t, d in extra]
    body += [chunk(b"IDAT", idat), chunk(b"IEND", b"")]
    return SIG + b"".join(body)


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    files = {
        # 7x5 RGB solid red
        "red_7x5.png": png(7, 5, 2, 8, b"\xff\x00\x00"),
        # 16x9 grayscale checker byte, with a tEXt ancillary chunk
        "gray_16x9.png": png(
            16, 9, 0, 8, b"\x55\xaa", extra=((b"tEXt", b"Comment\x00fixture"),)
        ),
        # 4x4 RGBA gradient-ish
        "rgba_4x4.png": png(4, 4, 6, 8, b"\x10\x20\x30\xff"),
    }
    for name, data in files.items():
        (OUT / name).write_bytes(data)
        print(f"wrote {OUT / name} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
