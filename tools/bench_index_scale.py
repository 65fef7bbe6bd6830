"""sf1 → sf10 scale datapoints for the index-maintenance family
(VERDICT r11 #5): the heaviest bench entries — the cross-run
minhash/IVF index stores and their compactions — had sf1 numbers but
no sf10 slope, and they are the 100 TB-critical ops.

Two kinds of runs:

- **Dedup (minhash) family** — the registry bodies scale with
  ``sf_dir`` directly (`documents` modulo split), so
  `dedup_index_probe_documents`, `dedup_index_compact_documents` and
  `streaming_dedup_index_documents` run as-is at each sf.
- **IVF family** — the registry bodies pin the planted-cluster
  FIXTURE (recall attestation), so their wall time never scales; the
  scale datapoint here runs the OPERATORS over the sf `embeddings`
  table (20k rows at sf1, 200k at sf10, dim 64): history =
  vec_id%10 ≤ 7 ingested once, delta %10 == 8 appended twice (replay),
  compact, probe batch %10 == 9 with k=5, nprobe=2 — the exact shape
  of `ivf_index_compact_embeddings` at corpus size.
  **n_centroids scales as √N** (nlist ≈ √N, the standard IVF sizing:
  per-query candidates ≈ nprobe·N/nlist ≈ nprobe·√N). The first run
  of this harness kept nlist=16 fixed and measured 72.6 s at sf1 —
  a 35× slope that is the MISCONFIGURATION signature (linear
  candidate growth per query × linear queries = quadratic), not the
  operator's: the index stores any nlist; sizing it is the index
  definition, exactly like choosing LSH band counts.

Min-of-N (default 2) per (op, sf). Usage:

    python tools/bench_index_scale.py [sf1_dir sf10_dir [n [ops]]]

defaults /tmp/sf1 /tmp/sf10 2 all-ops (fixtures from
tools/gen_scaled_fixture at factors 10 / 100 over
/root/testdata/sf0.1); ``ops`` is a comma-separated OPS-key filter for
re-running one family. Prints one JSON line; numbers land in
R12_NOTES.md / SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parcialbigdata_spark.operators import dedup, similarity  # noqa: E402
from parcialbigdata_spark.queries import QUERIES  # noqa: E402
from parcialbigdata_spark.session import get_spark  # noqa: E402
from parcialbigdata_spark.sources.tables import load_table  # noqa: E402


def _ivf_run(spark, sf_dir: str, compact: bool) -> int:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mod = F.col("vec_id") % 10
    history = emb.filter(mod <= 7)
    delta = emb.filter(mod == 8)
    # FIXED batch (200 queries at every sf): the scale question is
    # "does probing one arriving batch stay cheap as HISTORY grows
    # 10x?" — a batch that grows with the corpus makes the workload
    # intrinsically N^1.5 (queries x candidates = (N/10)·nprobe·√N)
    # and the slope then measures the experiment design, not the
    # engine: measured 7.2 s -> 302.6 s (42x, vs 31.6x intrinsic)
    # with batch = the full %10==9 slice. vec_id < 2000 selects the
    # SAME 200 vectors at every sf (replicated fixtures offset ids
    # upward, so the original sf0.1 id range is a stable prefix).
    batch = emb.filter((mod == 9) & (F.col("vec_id") < 2000))
    cells_t = "r12_scale_ivf_cells"
    # A killed previous run can leave the warehouse DIRECTORY behind
    # with no catalog entry (the in-memory catalog died with the
    # session) — saveAsTable then fails with LOCATION_ALREADY_EXISTS.
    import shutil

    warehouse_dir = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for t in (cells_t, f"{cells_t}__compact"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse_dir, t), ignore_errors=True)
    try:
        n_hist = history.count()
        nlist = max(16, int(n_hist ** 0.5))
        centroids = similarity.ivf_fit_centroids(history, n_centroids=nlist)
        similarity.ivf_index_ingest(history, cells_t, centroids)
        if compact:
            for _ in range(2):  # replayed append
                similarity.ivf_index_ingest(delta, cells_t, centroids, append=True)
            similarity.ivf_index_compact(spark, cells_t)
        out = similarity.ivf_index_probe(batch, cells_t, centroids, k=5, nprobe=2)
        return out.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {cells_t}")
        spark.sql(f"DROP TABLE IF EXISTS {cells_t}__compact")


OPS = {
    "dedup_index_probe": lambda s, d: QUERIES["dedup_index_probe_documents"](s, d).count(),
    "dedup_index_compact": lambda s, d: QUERIES["dedup_index_compact_documents"](s, d).count(),
    "streaming_dedup_index": lambda s, d: QUERIES["streaming_dedup_index_documents"](s, d).count(),
    "ivf_index_probe": lambda s, d: _ivf_run(s, d, compact=False),
    "ivf_index_compact": lambda s, d: _ivf_run(s, d, compact=True),
    "streaming_ivf_index": lambda s, d: QUERIES["streaming_ivf_index_embeddings"](s, d).count(),
}
# streaming_ivf_index stays fixture-pinned (its harness writes stream
# files from the clustered fixture) — included as the fixed-cost
# reference row so the table says so explicitly rather than omitting it.

SFS = {"sf0.1": "/root/testdata/sf0.1"}


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else set(OPS)
    SFS["sf1"] = sf1
    SFS["sf10"] = sf10
    spark = get_spark("bench-index-scale")
    from parcialbigdata_spark.sources.warehouse import reset_swap_recovery_memo

    out: dict[str, dict] = {}
    for op, fn in OPS.items():
        if op not in only:
            continue
        rec: dict = {}
        for sf, d in SFS.items():
            best, rows = float("inf"), None
            for _ in range(n):
                reset_swap_recovery_memo()
                t0 = time.monotonic()
                rows = fn(spark, d)
                best = min(best, time.monotonic() - t0)
                spark.catalog.clearCache()
            rec[sf] = {"sec": round(best, 2), "rows": rows}
            print(f"{op} @ {sf}: {rec[sf]}", file=sys.stderr)
        rec["slope_sf1_sf10"] = round(
            rec["sf10"]["sec"] / max(rec["sf1"]["sec"], 1e-9), 2
        )
        out[op] = rec
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
