"""Round-7 operator tests: MATCH_RECOGNIZE-style sequence matching
(symbolize order + quantifier semantics), streaming reservoir
sampling (batch-split invariance of the bottom-k state merge),
the bucketed exchange-free band self-join (plan audit + parity with
the shuffled path), and RRF fusion ordering."""

from __future__ import annotations

import pandas as pd

from parcialbigdata_spark.plans.audit import audit_plan

SF_DIR = "/root/testdata/sf0.001"


# ----------------------------------------------------------------- seqmatch


def _seq_of(spark, rows):
    """rows: (user_id, ts_str, event_id, event_type)"""
    from parcialbigdata_spark.operators.seqmatch import symbolize

    df = spark.createDataFrame(
        [(u, pd.Timestamp(t).to_pydatetime(), e, k) for u, t, e, k in rows],
        ["user_id", "ts", "event_id", "event_type"],
    )
    mapping = {"view": "v", "click": "c", "purchase": "p", "error": "e"}
    return {
        r["user_id"]: r["seq"]
        for r in symbolize(df, mapping).collect()
    }


def test_symbolize_orders_by_ts_then_event_id(spark):
    seqs = _seq_of(
        spark,
        [
            (1, "2024-01-01 00:00:02", 10, "click"),
            (1, "2024-01-01 00:00:01", 11, "view"),
            # same-ts tie broken by event_id: 12 before 13
            (1, "2024-01-01 00:00:03", 13, "purchase"),
            (1, "2024-01-01 00:00:03", 12, "error"),
            (2, "2024-01-01 00:00:01", 14, "signup-ish-unmapped"),
        ],
    )
    assert seqs[1] == "vcep"
    assert seqs[2] == "o"  # unmapped type falls to the default symbol


def test_match_counts_quantifiers_and_anchors(spark):
    from parcialbigdata_spark.operators.seqmatch import match_counts

    seq = spark.createDataFrame(
        [(1, "vcccp"), (2, "vcp"), (3, "pvc"), (4, "ccc")],
        ["user_id", "seq"],
    )
    got = {
        r["pattern"]: r["n_users"]
        for r in match_counts(
            seq,
            {
                "three_clicks": "c{3,}",
                "view_then_purchase": "v.*p",
                "starts_with_purchase": "^p",
                "no_purchase": "^[^p]*$",
            },
        ).collect()
    }
    assert got == {
        "three_clicks": 2,       # vcccp, ccc
        "view_then_purchase": 2, # vcccp, vcp
        "starts_with_purchase": 1,  # pvc
        "no_purchase": 1,        # ccc
    }


# ------------------------------------------------------ streaming reservoir


def test_reservoir_state_merge_is_batch_split_invariant():
    """The bottom-k merge must yield the same reservoir no matter how
    the stream is split into batches — run the state transition over
    three different splits of the same ids and compare."""
    from parcialbigdata_spark.streaming.sampling import _reservoir_fn, priority

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    ids = list(range(40))
    splits = [[ids], [ids[:7], ids[7:23], ids[23:]], [[i] for i in ids]]
    results = []
    for chunks in splits:
        st = FakeState()
        for chunk in chunks:
            out = list(
                _reservoir_fn(
                    ("click",),
                    [pd.DataFrame({"event_id": chunk})],
                    st,
                    k=5,
                )
            )
        final = out[0]
        results.append(
            (final["n_seen"][0], tuple(final["sample_ids"][0]))
        )
    assert results[0] == results[1] == results[2]
    n_seen, sample = results[0]
    assert n_seen == 40
    expect = tuple(e for _, e in sorted((priority(i), i) for i in ids)[:5])
    assert sample == expect


# ------------------------------------------------- bucketed band self-join


def test_bucketed_band_self_join_has_no_exchange_and_matches(spark, tmp_path):
    from parcialbigdata_spark.operators.dedup import bucketed_band_self_join
    from parcialbigdata_spark.sources.warehouse import write_bucketed

    bands = spark.createDataFrame(
        [
            (1, 0, 100), (2, 0, 100), (3, 0, 100),   # bucket of three
            (1, 1, 200), (4, 1, 200),                 # second band pair
            (5, 0, 300),                              # singleton
        ],
        ["doc_id", "band_idx", "band_hash"],
    )
    table = "r7_test_bands"
    try:
        write_bucketed(bands, table, "band_hash", num_buckets=4)
        joined = bucketed_band_self_join(spark, table, "doc_id")
        a = audit_plan(joined)
        assert a["n_exchanges"] == 0, "bucketed self-join must not shuffle"
        got = {(r["id_a"], r["id_b"]) for r in joined.distinct().collect()}
        assert got == {(1, 2), (1, 3), (2, 3), (1, 4)}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_bucketed_minhash_matches_shuffled_minhash(spark):
    from parcialbigdata_spark.operators.dedup import (
        minhash_near_dups,
        minhash_near_dups_bucketed,
    )
    from parcialbigdata_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    table = "r7_test_minhash_bands"
    try:
        bucketed = {
            (r["id_a"], r["id_b"], r["jaccard_sim"])
            for r in minhash_near_dups_bucketed(
                docs, "doc_id", "text", table, threshold=0.2, k_shingle=2
            ).collect()
        }
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    shuffled = {
        (r["id_a"], r["id_b"], r["jaccard_sim"])
        for r in minhash_near_dups(
            docs, "doc_id", "text", threshold=0.2, k_shingle=2
        ).collect()
    }
    assert bucketed == shuffled


# ----------------------------------------------------------------- RRF


def test_rrf_scores_reward_presence_in_both_lists(spark):
    from parcialbigdata_spark.queries import QUERIES

    rows = QUERIES["rrf_hybrid_ranking_documents"](spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        expect = 0.0
        if r["bm25_rank"] is not None:
            expect += 1.0 / (60 + r["bm25_rank"])
        if r["cos_rank"] is not None:
            expect += 1.0 / (60 + r["cos_rank"])
        assert abs(r["rrf_score"] - round(expect, 6)) < 1e-9
    # descending by fused score, doc_id tie-break
    scores = [(-r["rrf_score"], r["doc_id"]) for r in rows]
    assert scores == sorted(scores)
