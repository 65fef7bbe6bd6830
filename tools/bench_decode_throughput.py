"""Measure DECODE-ONLY throughput (MB/s/core) for the media hash
kernels (r14, VERDICT r13 #4): the 10k-corpus bench entries time the
full near-dup op (decode + banded join); the 100 TB ingest math needs
the decode constant alone — every blob is decoded exactly once ever,
so bytes/sec/core × cores is the fleet's ingest rate.

Method: the PNG dHash and WAV aHash ``mapInPandas`` kernels run over
the generated 10k corpora (32 partitions on local[32] so every core
is busy), terminated by a count() of the hash rows (a few int columns
— the collect is negligible next to the decode). min-of-3 per kernel
to shed JIT/Arrow warm-up; the FIRST pass is also reported so the
warm-up cost stays visible.

Usage: python tools/bench_decode_throughput.py
Prints one JSON line per kernel; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parcialbigdata_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def measure(name: str, df_hashes, total_bytes: int) -> dict:
    times = []
    for _ in range(3):
        t0 = time.monotonic()
        n = df_hashes.count()
        times.append(time.monotonic() - t0)
    best = min(times)
    mb = total_bytes / 1e6
    return {
        "kernel": name,
        "rows": n,
        "total_mb": round(mb, 1),
        "first_s": round(times[0], 2),
        "best_s": round(best, 2),
        "mb_per_s": round(mb / best, 1),
        "mb_per_s_per_core": round(mb / best / CPUS, 2),
        "cores": CPUS,
    }


def main() -> None:
    import pyspark.sql.functions as F

    from parcialbigdata_spark.operators.audiohash import wav_ahash
    from parcialbigdata_spark.operators.phash import png_dhash
    from parcialbigdata_spark.sources.audio_corpus import ensure_audio_corpus
    from parcialbigdata_spark.sources.binary import parse_mp4_fragments
    from parcialbigdata_spark.sources.mp4_corpus import ensure_mp4_corpus
    from parcialbigdata_spark.sources.phash_corpus import ensure_phash_corpus

    spark = get_spark("decode-throughput")
    out = []
    for name, ensure, kernel in (
        ("png_dhash_decode", ensure_phash_corpus, png_dhash),
        ("wav_ahash_decode", ensure_audio_corpus, wav_ahash),
        ("mp4_fragment_walk", ensure_mp4_corpus, parse_mp4_fragments),
    ):
        corpus = ensure(spark).repartition(CPUS).cache()
        total = corpus.select(
            F.sum(F.length("content")).alias("b")).collect()[0]["b"]
        corpus.count()  # materialize the cache before timing
        out.append(measure(name, kernel(corpus), int(total)))
        print(json.dumps(out[-1]))
        corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
