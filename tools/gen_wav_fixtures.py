"""Generate small REAL WAV files (stdlib-only: wave + math) as
multimodal fixtures for the RIFF container parser.

Deterministic output — run once, commit the bytes:
    python tools/gen_wav_fixtures.py
writes tests/fixtures/wav/*.wav
"""

from __future__ import annotations

import math
import pathlib
import struct
import wave

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "wav"


def tone(path: pathlib.Path, rate: int, channels: int, width: int, n: int, freq: float) -> None:
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        amp = (1 << (8 * width - 1)) - 1
        frames = bytearray()
        for i in range(n):
            v = int(amp * 0.5 * math.sin(2 * math.pi * freq * i / rate))
            s = struct.pack("<h" if width == 2 else "<b", v)
            frames += s * channels
        w.writeframes(bytes(frames))


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    tone(OUT / "tone_8k_mono.wav", 8000, 1, 2, 160, 440.0)
    tone(OUT / "tone_16k_stereo.wav", 16000, 2, 2, 200, 1000.0)
    tone(OUT / "tone_22k_8bit.wav", 22050, 1, 1, 120, 220.0)
    for f in sorted(OUT.glob("*.wav")):
        print(f"wrote {f} ({f.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
