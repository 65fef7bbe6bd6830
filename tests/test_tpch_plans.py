"""Physical-plan audits for the TPC-H sweep — the scale contract.

Correct rows are necessary but not sufficient: these tests pin the
plan properties that decide whether each shape survives a 100×
scale-up (semi/anti joins instead of nested loops, filters pushed to
the parquet scan, pruned read schemas, top-k as TakeOrderedAndProject).
"""

from __future__ import annotations

from parcialbigdata_spark.plans.audit import audit_plan, physical_plan
from parcialbigdata_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_q4_exists_plans_semi_join_not_nested_loop(spark):
    plan = physical_plan(QUERIES["q4_order_priority"](spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q4_date_filter_pushed_to_scan(spark):
    df = QUERIES["q4_order_priority"](spark, SF_DIR)
    audit = audit_plan(df)
    assert audit["n_scans_with_pushed_filters"] >= 1
    # Only the columns the query touches reach the orders scan.
    assert any("o_orderdate" in s and "o_totalprice" not in s for s in audit["read_schemas"])


def test_q16_not_in_plans_anti_join(spark):
    plan = physical_plan(QUERIES["q16_supplier_cnt"](spark, SF_DIR))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q19_or_brackets_push_single_side_conjuncts(spark):
    """Catalyst must extract the union-of-brackets conjuncts
    (p_brand IN / l_quantity bounds) below the join."""
    plan = physical_plan(QUERIES["q19_bracket_revenue"](spark, SF_DIR))
    audit = audit_plan(QUERIES["q19_bracket_revenue"](spark, SF_DIR))
    # Both scans carry pushed filters: lineitem gets the quantity
    # bracket union, part gets the brand/size bracket union.
    assert audit["n_scans_with_pushed_filters"] == 2, plan


def test_q10_topk_is_take_ordered(spark):
    audit = audit_plan(QUERIES["q10_returned_items"](spark, SF_DIR))
    assert audit["top_k"]
    assert audit["n_scans_with_pushed_filters"] >= 2  # date + returnflag


def test_q21_semi_anti_pair(spark):
    plan = physical_plan(QUERIES["q21_sole_supplier_orders"](spark, SF_DIR))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q22_anti_join_and_scalar_broadcast(spark):
    plan = physical_plan(QUERIES["q22_idle_customers"](spark, SF_DIR))
    assert "LeftAnti" in plan
    # The 1-row average joins by broadcast, never by shuffle.
    assert "BroadcastExchange" in plan


def test_q1_scan_schema_pruned(spark):
    audit = audit_plan(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    # 7 needed columns, not the full 11-column lineitem schema.
    schema = audit["read_schemas"][0]
    assert "l_orderkey" not in schema and "l_partkey" not in schema
    assert audit["n_scans_with_pushed_filters"] == 1


def test_stratified_sample_is_shuffle_free(spark):
    audit = audit_plan(QUERIES["stratified_sample_documents"](spark, SF_DIR))
    assert audit["n_exchanges"] == 0
    assert not audit["has_python_row_udf"]


def test_no_query_uses_row_at_a_time_python(spark):
    """No registered TPC-H query may fall off the codegen path into
    row-at-a-time Python."""
    for name in [
        "q4_order_priority",
        "q7_nation_volume",
        "q8_market_share",
        "q9_profit_by_nation_year",
        "q12_priority_by_linestatus",
        "q13_customer_distribution",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q18_large_volume_orders",
        "q19_bracket_revenue",
        "q20_red_part_suppliers",
    ]:
        audit = audit_plan(QUERIES[name](spark, SF_DIR))
        assert not audit["has_python_row_udf"], name


def test_chunk_documents_plan_is_shuffle_free(spark):
    """Chunking must stay a narrow map + generate: any Exchange here
    would shuffle full document text at corpus scale."""
    audit = audit_plan(QUERIES["chunk_documents"](spark, SF_DIR))
    assert audit["n_exchanges"] == 0


def test_decontaminate_plan_broadcasts_benchmark(spark):
    """The eval-set gram side must broadcast — a sort-merge join here
    would shuffle the full corpus gram stream against a tiny side."""
    plan = physical_plan(QUERIES["decontaminate_documents"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_redact_pii_plan_is_shuffle_free_codegen(spark):
    audit = audit_plan(QUERIES["redact_pii_documents"](spark, SF_DIR))
    assert audit["n_exchanges"] == 0
    assert audit["has_python_row_udf"] is False


def test_shuffle_order_has_no_global_sort(spark):
    """The training-order shuffle must be per-shard (hash exchange +
    in-partition sort), never a single-range global sort."""
    plan = physical_plan(QUERIES["shuffle_order_documents"](spark, SF_DIR))
    assert "rangepartitioning" not in plan.lower()
    assert "SinglePartition" not in plan


def test_mixture_and_length_bounds_broadcast_their_stat_pass(spark):
    """Two-pass curation queries must broadcast the catalog-bounded
    stats table back, not shuffle the corpus against it."""
    for name in ("mixture_resample_documents", "length_bounds_by_lang"):
        plan = physical_plan(QUERIES[name](spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_semantic_dedup_joins_on_cluster_key(spark):
    """The quadratic term must be bounded by the cluster: the self-join
    carries the label equi-key (never a nested-loop all-pairs)."""
    plan = physical_plan(QUERIES["semantic_dedup_embeddings"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_heavy_hitter_topk_is_take_ordered(spark):
    audit = audit_plan(QUERIES["heavy_hitter_terms"](spark, SF_DIR))
    assert audit["top_k"]
    assert not audit["has_python_row_udf"]


def test_snapshot_diff_shuffles_fingerprints_not_text(spark):
    """The full-outer diff join must consume md5-projected sides — the
    text column must not survive into the join's read schema beyond
    the fingerprint projection (shuffle carries ~24 B/row)."""
    df = QUERIES["snapshot_diff_documents"](spark, SF_DIR)
    audit = audit_plan(df)
    plan = physical_plan(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    # Both scans read only (doc_id, text) — no wider schema leaks in.
    assert all("lang" not in s and "source" not in s for s in audit["read_schemas"])


def test_upsert_latest_single_window_exchange(spark):
    """row_number and the version count share one window partition →
    exactly one exchange in the whole compaction plan."""
    df = QUERIES["upsert_latest_events"](spark, SF_DIR)
    assert audit_plan(df)["n_exchanges"] == 1


def test_embedding_outliers_broadcasts_centroids_no_self_join(spark):
    df = QUERIES["embedding_outliers"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_quality_classifier_is_codegen_no_python(spark):
    audit = audit_plan(QUERIES["quality_classifier_documents"](spark, SF_DIR))
    assert not audit["has_python_row_udf"]
    assert not audit["has_arrow_udf"]


def test_dq_checks_single_scan_for_scalar_metrics(spark):
    """Four scan metrics come from ONE aggregate: at most two scans of
    orders total (metrics pass + anti-join probe side) plus customer."""
    df = QUERIES["dq_checks_orders"](spark, SF_DIR)
    assert audit_plan(df)["n_parquet_scans"] <= 3
    assert "LeftAnti" in physical_plan(df)


def test_shared_substring_caps_before_join(spark):
    """The window-digest self-join must see the count-capped relation:
    a Window (bucket count) precedes the join in the plan."""
    df = QUERIES["shared_substring_documents"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_drift_psi_single_scan_conditional_agg(spark):
    """Both drift sides come from ONE orders scan via conditional
    aggregation — no self-join/union of the table; totals come from a
    window over the 10-row bucket frame, not a second scan."""
    df = QUERIES["drift_psi_orders"](spark, SF_DIR)
    assert audit_plan(df)["n_parquet_scans"] == 1
