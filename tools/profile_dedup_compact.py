"""Phase profile of `dedup_index_compact_documents` (r13, VERDICT r12
#3): the registry entry's wall time is the WHOLE index lifecycle —
seed ingest + probe(batch1) + 2 replayed appends + compact +
probe(batch2) — so its 7.0× sf1→sf10 slope (the index family's
highest) needs a per-phase breakdown before concluding anything about
the compaction itself.

Usage:
    python tools/profile_dedup_compact.py [sf1_dir sf10_dir [n]]

defaults /tmp/sf1 /tmp/sf10 (tools/gen_scaled_fixture outputs), n=2
(min-of-n per phase chain; phases within one run are sequential so a
chain is internally consistent). Prints one JSON line; numbers land
in R13_NOTES.md / SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parcialbigdata_spark.operators import dedup  # noqa: E402
from parcialbigdata_spark.session import get_spark  # noqa: E402
from parcialbigdata_spark.sources.tables import load_table  # noqa: E402


def run_once(spark, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    mod = F.col("doc_id") % 10
    history = docs.filter(mod <= 5)
    batch1 = docs.filter(mod.isin(6, 7))
    batch2 = docs.filter(mod.isin(8, 9))
    bands_t, sets_t = "prof_dedup_bands", "prof_dedup_sets"
    import shutil

    warehouse_dir = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for t in (bands_t, sets_t, f"{bands_t}__compact", f"{sets_t}__compact"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse_dir, t), ignore_errors=True)
    phases: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        phases[name] = round(time.perf_counter() - t0, 2)

    handle: list = []
    try:
        timed("ingest_seed", lambda: dedup.minhash_index_ingest(
            history, "doc_id", "text", bands_t, sets_t, k_shingle=2))
        timed("probe_batch1", lambda: dedup.minhash_index_probe(
            batch1, "doc_id", "text", bands_t, sets_t, threshold=0.2,
            k_shingle=2, unpersist_handle=handle).count())
        timed("append_x2", lambda: [
            dedup.minhash_index_ingest(
                batch1, "doc_id", "text", bands_t, sets_t, k_shingle=2,
                append=True)
            for _ in range(2)
        ])
        # compact, split into its two halves
        from parcialbigdata_spark.operators.dedup import _cap_buckets
        from parcialbigdata_spark.sources.warehouse import (
            swap_staged_table,
            write_bucketed,
        )

        timed("compact_bands", lambda: write_bucketed(
            _cap_buckets(spark.table(bands_t).distinct(), 10_000),
            f"{bands_t}__compact", "band_hash", num_buckets=8))
        timed("compact_sets", lambda: write_bucketed(
            spark.table(sets_t).distinct(), f"{sets_t}__compact",
            "doc_id", num_buckets=8))
        timed("swap", lambda: [
            swap_staged_table(spark, t) for t in (bands_t, sets_t)])
        timed("probe_batch2", lambda: dedup.minhash_index_probe(
            batch2, "doc_id", "text", bands_t, sets_t, threshold=0.2,
            k_shingle=2, unpersist_handle=handle).count())
        for cached in handle:
            cached.unpersist()
        phases["total"] = round(sum(phases.values()), 2)
        return phases
    finally:
        for t in (bands_t, sets_t, f"{bands_t}__compact", f"{sets_t}__compact"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("profile-dedup-compact")
    out: dict = {}
    for label, d in (("sf1", sf1), ("sf10", sf10)):
        best: dict | None = None
        for _ in range(n):
            r = run_once(spark, d)
            if best is None or r["total"] < best["total"]:
                best = r
        out[label] = best
    out["slope"] = {
        k: round(out["sf10"][k] / out["sf1"][k], 2)
        for k in out["sf1"]
        if out["sf1"][k] > 0
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
