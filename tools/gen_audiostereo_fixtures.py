"""Generate STEREO WAV fixtures for the per-channel aHash near-dup
path (r14, VERDICT r13 #7): a stereo dupe whose channels were SWAPPED
(L↔R remaster — a common re-encode) is invisible to the channel-0
hash, but per-channel rows let the shared banded join catch channel 0
of one file against channel 1 of the other.

Canonical layout keeps them ORACLE-DECODABLE in pure SQL: stdlib
``wave`` emits the classic 44-byte header for 2-channel 16-bit PCM;
interleaved samples put channel c of frame i at byte 44 + 4·i + 2·c.

Planted structure (build-time VERIFIED with the real kernel):

- ``st_pan_a``       — L carries a rising-envelope tone, R a
  falling-envelope sweep (the two contours are > 3 bits apart, so L/R
  do NOT self-pair).
- ``st_pan_a_swap``  — channels SWAPPED and each perturbed in one
  frame-sized segment: byte-different, channel-0 hash far from
  st_pan_a's channel 0, but (a, ch0) ~ (swap, ch1) and (a, ch1) ~
  (swap, ch0) at Hamming ≤ 3.
- ``st_far_b``       — jagged-envelope stereo noise, far from
  everything on both channels.

Deterministic output — run once, commit the bytes:
    python tools/gen_audiostereo_fixtures.py
writes tests/fixtures/audiostereo/*.wav
"""

from __future__ import annotations

import math
import os
import pathlib
import struct
import sys
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parcialbigdata_spark.operators.audiohash import (  # noqa: E402
    wav_ahash_channel_bands,
)

OUT = (pathlib.Path(__file__).resolve().parent.parent
       / "tests" / "fixtures" / "audiostereo")

RATE = 8000
N = 8190  # 65 frames × 126 samples


def write_stereo(path: pathlib.Path, left: "list[int]",
                 right: "list[int]") -> None:
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(RATE)
        w.writeframes(b"".join(
            struct.pack("<hh", l, r) for l, r in zip(left, right)))


def tone() -> "list[int]":
    return [
        int(12000 * math.sin(2 * math.pi * 440.0 * i / RATE)
            * (0.3 + 0.7 * (i / N)))
        for i in range(N)
    ]


def sweep() -> "list[int]":
    return [
        int(9000 * math.sin(2 * math.pi * (200.0 + 800.0 * i / N) * i / RATE)
            * (1.0 - 0.6 * (i / N)))
        for i in range(N)
    ]


def perturb(s: "list[int]", frame: int, gain: float) -> "list[int]":
    out = list(s)
    for i in range(frame * 126, (frame + 1) * 126):
        out[i] = max(min(int(out[i] * gain), 32767), -32768)
    return out


def noise(seed: int, phase: int = 0) -> "list[int]":
    """Jagged-envelope noise; ``phase`` flips the alternating envelope
    so the two channels of the noise clip do NOT share a contour."""
    out = []
    for i in range(N):
        z = (i * 0x9E3779B97F4A7C15 + seed) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        v = (z >> 40) % 20000 - 10000
        frame = (i * 65) // N
        out.append(int(v * (1.0 if (frame + phase) % 2 == 0 else 0.2)))
    return out


def _h(a, b) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    t, s = tone(), sweep()
    write_stereo(OUT / "st_pan_a.wav", t, s)
    # swap + one-segment perturbation per channel: byte-different,
    # hash-near across the swap
    write_stereo(OUT / "st_pan_a_swap.wav",
                 perturb(s, 40, 0.4), perturb(t, 20, 1.6))
    write_stereo(OUT / "st_far_b.wav", noise(7), noise(11, phase=1))

    hashes = {}
    for f in sorted(OUT.glob("*.wav")):
        for c, n, bands in wav_ahash_channel_bands(f.read_bytes()):
            hashes[(f.stem, c)] = bands
    # the swap pairs are near
    ha = _h(hashes[("st_pan_a", 0)], hashes[("st_pan_a_swap", 1)])
    hb = _h(hashes[("st_pan_a", 1)], hashes[("st_pan_a_swap", 0)])
    assert 1 <= ha <= 3, f"L→R swap Hamming {ha} outside (0, 3]"
    assert 1 <= hb <= 3, f"R→L swap Hamming {hb} outside (0, 3]"
    # same-channel comparison is blind to the swap (the r13 gap)
    blind = _h(hashes[("st_pan_a", 0)], hashes[("st_pan_a_swap", 0)])
    assert blind > 3, f"channel-0 Hamming {blind} should be far"
    # L and R within a file do not self-pair; noise is far from all
    assert _h(hashes[("st_pan_a", 0)], hashes[("st_pan_a", 1)]) > 3
    assert _h(hashes[("st_far_b", 0)], hashes[("st_far_b", 1)]) > 3
    for k, v in hashes.items():
        if k[0] == "st_far_b":
            continue
        for c in (0, 1):
            assert _h(v, hashes[("st_far_b", c)]) > 3, (k, c)
    for f in sorted(OUT.glob("*.wav")):
        print(f"wrote {f} ({f.stat().st_size} bytes)")
    print("swap Hammings:", ha, hb, "channel-0 blind:", blind)


if __name__ == "__main__":
    main()
