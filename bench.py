"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
exactly ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with a cheap count-style action (the driver
cares about end-to-end plan execution time, not row transfer to the
driver), timed individually after one warm-up of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

from parcialbigdata_spark.queries import QUERIES
from parcialbigdata_spark.session import get_spark

# Headline set: the most expensive/representative plans, one per family.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top_customers_revenue",
    "asof_latest_order_before_event",
    "window_top_orders_per_customer",
    "rollup_revenue_region_nation",
    "sessionization_events",
    "json_event_props",
    "minhash_near_dups_documents",
    "simhash_near_dups_documents",
    "canonical_dedup_documents",
    "cosine_topk_embeddings",
    "embedding_near_dup_pairs",
    "text_metrics_by_lang",
    "training_corpus_prep",
    "knn_join_embeddings",
    "q6_forecast_revenue",
    "q17_small_quantity_revenue",
    "scd2_order_price_history",
    "grouping_sets_revenue",
    "tfidf_top_terms",
    "winnow_overlap_documents",
    "q13_customer_distribution",
    "q18_large_volume_orders",
    "q21_sole_supplier_orders",
    "variant_event_props",
    "embedding_centroids",
    "decontaminate_documents",
    "chunk_documents",
    "semantic_dedup_embeddings",
    "hot_ngram_documents",
    "vocab_stats_by_source",
    "embedding_outliers",
    "quality_classifier_documents",
    "shared_substring_documents",
    "snapshot_diff_documents",
    "upsert_latest_events",
    "funnel_click_purchase",
    "cohort_retention_events",
    "pq_topk_embeddings",
    # r3: the 5-8-table TPC-H join sweeps — the heaviest shuffle/join
    # plans in the registry (VERDICT r2 bench-set hygiene item).
    "q8_market_share",
    "q9_profit_by_nation_year",
    # r3 new operators: segment-dedup agg+join-back, iterative PR.
    "boilerplate_prune_documents",
    "pagerank_trade_graph",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("parcialbigdata-bench")
    # Derive a numeric sf from the dir name (sf0.1 → 0.1); best-effort.
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = None

    # Warm up with one untimed pass over the full set so per-query
    # timings measure steady-state plan execution — not JVM JIT of the
    # codegen paths, parquet footer reads, or session start, none of
    # which a long-lived cluster pays per query. Then time two passes
    # and keep the per-query minimum: in a single long-session pass a
    # multi-second GC/ContextCleaner pause can land on an arbitrary
    # query (observed 2s→20s flukes); min-of-2 measures the plan, not
    # the pause.
    names = [n for n in BENCH_QUERIES if n in QUERIES]
    jvm_gc = spark.sparkContext._jvm.System.gc  # type: ignore[attr-defined]
    for name in names:
        QUERIES[name](spark, sf_dir).count()
        spark.catalog.clearCache()
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in names:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            # Execute the full plan; write nothing, pull back the count.
            df.count()
            elapsed = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, elapsed), elapsed)
            # Operator-internal persists (LSH band/shingle relations) are
            # per-query state — clear so queries don't inherit cache from
            # earlier ones and storage stays flat. Outside the timer:
            # cache teardown and the GC nudge are harness overhead, not
            # query cost.
            spark.catalog.clearCache()
            jvm_gc()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
