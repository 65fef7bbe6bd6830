"""Generate REAL PNG fixtures for the perceptual-hash (dHash) near-dup
family (r11, VERDICT #5) — stdlib struct + zlib only.

Two constraints make these images ORACLE-DECODABLE in pure SQL:

- zlib level 0 → the deflate stream is a single STORED block, so the
  raw filtered scanlines sit at a fixed offset inside the IDAT chunk
  and DuckDB can read them straight out of the blob's hex;
- filter type 0 (None) on every scanline → the filtered bytes ARE the
  pixel bytes.

The Spark kernel (operators/phash.py) handles the general case
(compressed streams, all five PNG filters); the encoding-invariance
pytest pins that the general path produces the identical hash for the
same pixels re-encoded with compression and nontrivial filters.

Planted structure: two near-identical pairs (grad_a / grad_a_dup,
checker_b / checker_b_dup — a small region tweaked, Hamming ≤ 3 so the
4×16-band pigeonhole guarantees banded recall) and two distinct images
(noise_c, rgba_d) far from everything. tiny_e is below the 9×8 grid
and must be excluded by the size guard.

Deterministic output — run once, commit the bytes:
    python tools/gen_phash_fixtures.py
writes tests/fixtures/phash/*.png
"""

from __future__ import annotations

import pathlib
import struct
import zlib

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "phash"

SIG = b"\x89PNG\r\n\x1a\n"


def chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_stored(width: int, height: int, color_type: int, pix) -> bytes:
    """Filter-0 scanlines, zlib level 0 (single stored deflate block).

    ``pix(x, y) -> tuple of channel bytes``.
    """
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter: None
        for x in range(width):
            px = pix(x, y)
            assert len(px) == nch
            raw.extend(px)
    idat = zlib.compress(bytes(raw), 0)
    assert len(raw) < 65_000, "must stay a single stored block"
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


W, H = 36, 24


def grad_a(x: int, y: int):
    return ((x * 7) % 256, (x * 5 + y * 3) % 256, (y * 9) % 256)


def grad_a_dup(x: int, y: int):
    # darken one cell-sized region (cell_x=4, cell_y=3): x in [16,20),
    # y in [9,12) — flips a couple of adjacent-cell comparisons.
    if 16 <= x < 20 and 9 <= y < 12:
        r, g, b = grad_a(x, y)
        return (max(r - 120, 0), max(g - 120, 0), max(b - 120, 0))
    return grad_a(x, y)


def checker_b(x: int, y: int):
    return (200 if (x // 6 + y // 6) % 2 == 0 else 40,)


def checker_b_dup(x: int, y: int):
    # brighten one dark square slightly
    if 12 <= x < 18 and 6 <= y < 12:
        return (90,)
    return checker_b(x, y)


def noise_c(x: int, y: int):
    return ((x * 31 + y * 17) % 251, (x * 13 + y * 29) % 251, (x * 3 + y * 41) % 251)


def rgba_d(x: int, y: int):
    return ((x * 11) % 256, (y * 11) % 256, ((x + y) * 6) % 256, 255)


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    files = {
        "grad_a.png": png_stored(W, H, 2, grad_a),
        "grad_a_dup.png": png_stored(W, H, 2, grad_a_dup),
        "checker_b.png": png_stored(W, H, 0, checker_b),
        "checker_b_dup.png": png_stored(W, H, 0, checker_b_dup),
        "noise_c.png": png_stored(W, H, 2, noise_c),
        "rgba_d.png": png_stored(W, H, 6, rgba_d),
        "tiny_e.png": png_stored(6, 6, 0, lambda x, y: ((x * y) % 256,)),
    }
    for name, data in files.items():
        (OUT / name).write_bytes(data)
        print(f"wrote {OUT / name} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
