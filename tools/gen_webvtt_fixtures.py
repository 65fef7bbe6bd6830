"""Generate WebVTT caption fixtures (r14) — the TEXT track of web
video: caption extraction is a first-class training-data op (ASR
alignment, caption-LM corpora, subtitle translation pairs) and needs
no codec, so the path is REAL end to end like PNG/WAV/VTT.

Files (deterministic; run once, commit):
- ``talk_a.vtt``   — header with trailing metadata text, a NOTE block
  (must be SKIPPED by cue numbering), 4 cues: identifier-less, an
  identified cue, cue settings after the end timestamp, a voice-tag
  payload, and an HOUR-form timestamp (01:02:03.500).
- ``talk_b.vtt``   — MM:SS.mmm short-form timestamps, a multi-line
  payload (two payload lines in one cue), and a cue whose identifier
  line is numeric.
- ``bad_c.vtt``    — no WEBVTT magic: contributes zero rows on both
  engines.

    python tools/gen_webvtt_fixtures.py
writes tests/fixtures/webvtt/*.vtt
"""

from __future__ import annotations

import pathlib

OUT = (pathlib.Path(__file__).resolve().parent.parent
       / "tests" / "fixtures" / "webvtt")

TALK_A = """WEBVTT - talk A captions

NOTE
This block is a comment and must not become a cue.

00:00:01.000 --> 00:00:04.250
Hello and welcome to the talk.

intro-2
00:00:04.500 --> 00:00:09.000 align:start position:10%
Today we cover distributed joins.

00:00:09.250 --> 00:01:02.750
<v Ana>Let's begin with shuffles.</v>

01:02:03.500 --> 01:02:59.999
An hour in, still going.
"""

TALK_B = """WEBVTT

00:07.000 --> 00:11.300
Short-form timestamps
work without hours.

42
00:12.000 --> 00:15.500
A numeric identifier line.
"""

BAD_C = """Not a vtt file at all
00:00:01.000 --> 00:00:02.000
should never appear
"""


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    for name, text in (("talk_a.vtt", TALK_A), ("talk_b.vtt", TALK_B),
                       ("bad_c.vtt", BAD_C)):
        (OUT / name).write_text(text, encoding="utf-8")
        print(f"wrote {OUT / name} ({len(text)} chars)")


if __name__ == "__main__":
    main()
