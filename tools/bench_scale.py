"""Scale check: run the heaviest headline queries at sf0.1 and at the
replicated sf1 fixture (tools/gen_scaled_fixture.py), comparing
wall-times and EXECUTED plan shapes (final AQE join strategies,
shuffle counts) across the 10x data jump.

Usage: python tools/bench_scale.py [sf1_dir]   (default /tmp/sf1)

Prints one JSON line: per-query {sf01_sec, sf1_sec, ratio, plan flips}.
A ratio well above the replication factor, or a join-strategy flip
that shouldn't happen (a fixed-size dim falling out of broadcast),
is a scale bug to fix — not a number to report.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parcialbigdata_spark.plans.audit import audit_plan  # noqa: E402
from parcialbigdata_spark.queries import QUERIES  # noqa: E402
from parcialbigdata_spark.session import get_spark  # noqa: E402

HEAVY = [
    "ppr_seed_customer_purchases",
    "setsim_join_documents",
    "simhash_near_dups_documents",
    "pagerank_trade_graph",
    "minhash_near_dups_documents",
    "winnow_overlap_documents",
    "top_customers_revenue",
    "shared_substring_documents",
    "copurchase_part_pairs",
    "pq_topk_embeddings",
    "q18_large_volume_orders",
    "concurrent_sessions_hourly",
    # r6: the re-blocked edit-distance join (VERDICT r5 #6) and the
    # heaviest of the new wave.
    "editdist_join_customers",
    "sliding_distinct_users_daily",
    "link_prediction_suppliers",
    "bpe_merge_pairs_documents",
    # r7: every family rotated into the driver window this round gets
    # a 10x datapoint (VERDICT r6 item 7).
    "association_rules_parts",
    "concentration_gini_customers",
    "attribution_time_decay",
    "keyset_pagination_orders",
    "weighted_median_lineitem",
    "daily_streaks_users",
    "ab_lift_events",
    # r7b: the heaviest of the new families — clustering+survivorship,
    # the bucketed band join (ingest write + zero-exchange self-join),
    # and the two distributed-scan consumers.
    "golden_record_documents",
    "minhash_bucketed_near_dups_documents",
    "ks_2sample_order_values",
    "quantile_normalize_documents",
    "record_linkage_customers",
    # r8: families rotated into the driver window this round (VERDICT
    # r7 item 6 invariant: every window family has a 10x datapoint)
    # plus the heaviest of the new r8 families.
    "rrf_hybrid_ranking_documents",
    "partition_pruned_events_daily",
    "schema_evolution_documents",
    "incremental_clusters_documents",
    "host_profile_documents",
    "zorder_scan_orders",
    "interval_overlap_clicks_errors",
    "streaming_left_outer_join_events",
    # r8b/r8c: the second-rotation window entrants (invariant: every
    # window family has a 10x datapoint).
    "ngram_lm_quality_documents",
    "compaction_plan_documents",
    "bloom_prejoin_lineitem_parts",
    "incremental_join_orders_customers",
    "cdc_agg_orders",
    "cdc_minmax_orders",
    "cdc_extract_apply_orders",
    "dedup_index_probe_documents",
    "containment_pairs_documents",
    "community_lpa_suppliers",
    "calibration_audit_documents",
    "cl_diversity_audit_customers",
    "streaming_dedup_index_documents",
    "theilsen_trend_orders",
    "ivf_index_probe_embeddings",
    "streaming_ivf_index_embeddings",
    "cusum_changepoint_orders",
    "seasonal_decompose_orders",
    "acf_daily_orders",
    "sorted_neighborhood_customers",
    "dedup_index_compact_documents",
    "phrase_search_documents",
    "ivf_index_compact_embeddings",
    "isotonic_calibration_documents",
]


def run_one(spark, name: str, sf_dir: str) -> dict:
    t0 = time.monotonic()
    df = QUERIES[name](spark, sf_dir)
    n = len(df.collect())
    sec = time.monotonic() - t0
    a = audit_plan(df)  # post-collect: final AQE shapes
    spark.catalog.clearCache()
    return {
        "sec": round(sec, 3),
        "rows": n,
        "joins_bhj": a["n_broadcast_joins"],
        "joins_smj": a["n_sortmerge_joins"],
        "exchanges": a["n_exchanges"],
    }


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark("bench-scale")
    out = {}
    for name in HEAVY:
        r01 = run_one(spark, name, "/root/testdata/sf0.1")
        r1 = run_one(spark, name, sf1)
        out[name] = {
            "sf01_sec": r01["sec"],
            "sf1_sec": r1["sec"],
            "ratio": round(r1["sec"] / max(r01["sec"], 1e-9), 2),
            "rows_sf01": r01["rows"],
            "rows_sf1": r1["rows"],
            # Output-normalized ratio (VERDICT r7 item 7): when the
            # result legitimately grows faster than the input (pair
            # emitters like record_linkage: the replicated sf1 copies
            # ARE near-duplicates, so output grows ~100x for 10x
            # input), raw sec-ratio conflates engine cost with result
            # size; sec per 1k emitted rows separates them.
            "sec_per_1k_rows_sf01": round(r01["sec"] * 1000 / max(r01["rows"], 1), 4),
            "sec_per_1k_rows_sf1": round(r1["sec"] * 1000 / max(r1["rows"], 1), 4),
            "bhj": f"{r01['joins_bhj']}->{r1['joins_bhj']}",
            "smj": f"{r01['joins_smj']}->{r1['joins_smj']}",
            "exch": f"{r01['exchanges']}->{r1['exchanges']}",
        }
        print(
            f"{name}: {r01['sec']:.1f}s -> {r1['sec']:.1f}s "
            f"(x{out[name]['ratio']}) bhj {out[name]['bhj']} "
            f"smj {out[name]['smj']} exch {out[name]['exch']}",
            file=sys.stderr,
        )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
