"""Generate REAL WAV fixtures for the audio perceptual-hash (aHash)
near-dup family (r12) — stdlib ``wave`` + ``math`` only.

Canonical layout makes them ORACLE-DECODABLE in pure SQL: the stdlib
``wave`` writer emits the classic 44-byte header (RIFF + 16-byte fmt +
data) for mono 16-bit PCM, so the DuckDB oracle can anchor samples at
byte 44 and reassemble little-endian two's-complement values from the
blob hex (guarded — a blob with a different layout is dropped and the
row-count compare fails loudly, the phash-IDAT discipline).

Planted structure (build-time VERIFIED with the real kernel):

- ``tone_a`` / ``tone_a_dup``   — 440 Hz tone; dup boosts one
  frame-sized segment's amplitude (byte-different, Hamming ≤ 3).
- ``sweep_b`` / ``sweep_b_dup`` — rising sweep; dup attenuates one
  segment (byte-different, Hamming ≤ 3).
- ``noise_c``                    — deterministic pseudo-noise, far
  from both pairs (Hamming > 3 to everything).
- ``short_d``                    — 40 samples, below the 65-frame
  guard: must be excluded by both engines.

Deterministic output — run once, commit the bytes:
    python tools/gen_audiohash_fixtures.py
writes tests/fixtures/audiohash/*.wav
"""

from __future__ import annotations

import math
import os
import pathlib
import struct
import sys
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parcialbigdata_spark.operators.audiohash import wav_ahash_bands  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "audiohash"

RATE = 8000
N = 8190  # 65 frames × 126 samples


def write_wav(path: pathlib.Path, samples: list[int]) -> None:
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(RATE)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))


def tone_a() -> list[int]:
    return [
        int(12000 * math.sin(2 * math.pi * 440.0 * i / RATE)
            * (0.3 + 0.7 * (i / N)))          # rising envelope → monotone-ish contour
        for i in range(N)
    ]


def tone_a_dup() -> list[int]:
    s = tone_a()
    # boost one frame-sized segment (frame 20: samples 2520..2646)
    for i in range(2520, 2646):
        s[i] = max(min(int(s[i] * 1.6), 32767), -32768)
    return s


def sweep_b() -> list[int]:
    return [
        int(9000 * math.sin(2 * math.pi * (200.0 + 800.0 * i / N) * i / RATE)
            * (1.0 - 0.6 * (i / N)))          # falling envelope
        for i in range(N)
    ]


def sweep_b_dup() -> list[int]:
    s = sweep_b()
    for i in range(5040, 5166):               # frame 40 attenuated
        s[i] = int(s[i] * 0.4)
    return s


def noise_c() -> list[int]:
    # splitmix-style integer noise with a jagged alternating envelope —
    # an energy contour unlike either planted pair
    out = []
    for i in range(N):
        z = (i * 0x9E3779B97F4A7C15 + 7) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        v = (z >> 40) % 20000 - 10000
        frame = (i * 65) // N
        out.append(int(v * (1.0 if frame % 2 == 0 else 0.2)))
    return out


def short_d() -> list[int]:
    return [1000] * 40


def hamming(a, b) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a[1], b[1]))


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    clips = {
        "tone_a": tone_a(), "tone_a_dup": tone_a_dup(),
        "sweep_b": sweep_b(), "sweep_b_dup": sweep_b_dup(),
        "noise_c": noise_c(), "short_d": short_d(),
    }
    for name, samples in clips.items():
        write_wav(OUT / f"{name}.wav", samples)
    hashes = {
        name: wav_ahash_bands((OUT / f"{name}.wav").read_bytes())
        for name in clips
    }
    assert hashes["short_d"] is None, "guard fixture must be excluded"
    del hashes["short_d"]
    assert all(h is not None for h in hashes.values())
    ha = hamming(hashes["tone_a"], hashes["tone_a_dup"])
    hb = hamming(hashes["sweep_b"], hashes["sweep_b_dup"])
    assert 1 <= ha <= 3, f"tone pair Hamming {ha} outside (0, 3]"
    assert 1 <= hb <= 3, f"sweep pair Hamming {hb} outside (0, 3]"
    for x in ("tone_a", "tone_a_dup", "sweep_b", "sweep_b_dup"):
        for y in ("noise_c",):
            d = hamming(hashes[x], hashes[y])
            assert d > 3, f"{x}~{y} Hamming {d} too close"
    cross = [hamming(hashes[x], hashes[y])
             for x in ("tone_a", "tone_a_dup") for y in ("sweep_b", "sweep_b_dup")]
    assert min(cross) > 3, f"cross-pair Hamming {cross} too close"
    for f in sorted(OUT.glob("*.wav")):
        print(f"wrote {f} ({f.stat().st_size} bytes)")
    print("planted Hammings:", ha, hb, "cross:", cross)


if __name__ == "__main__":
    main()
