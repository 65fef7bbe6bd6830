"""Round-11 operator tests: sparse materialization strategy knob,
single-pass containment emit, _mem_bytes plain-bytes-with-suffix
parse."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from parcialbigdata_spark.operators import dedup
from parcialbigdata_spark.operators.incremental import _mem_bytes


# ------------------------------------------------- _mem_bytes (ADVICE r10)


def test_mem_bytes_plain_bytes_with_b_suffix():
    # Spark accepts "10485760b" as plain bytes; the r10 parser raised.
    assert _mem_bytes("10485760b") == 10485760
    assert _mem_bytes("10485760") == 10485760
    assert _mem_bytes("10MB") == 10 * 1024**2
    assert _mem_bytes("1g") == 1024**3
    assert _mem_bytes("512kb") == 512 * 1024
    assert _mem_bytes("-1") == -1


# ------------------------------------ sparse materialization strategy (r11)


def _docs(spark, tmp_path, n=40):
    rows = [
        (i, f"block{i % 2}", "the quick brown fox jumps over the lazy dog "
         * 3 + f"tail {i % 5}")
        for i in range(n)
    ]
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, ["doc_id", "blk", "text"]).write.mode(
        "overwrite"
    ).parquet(p)
    return spark.read.parquet(p)


def _pairs(df):
    return {
        (r.id_inner, r.id_outer, r.containment)
        for r in df.collect()
    }


def test_sparse_materialize_checkpoint_default(spark, tmp_path):
    """Default mode → localCheckpoint: lineage truncated to a bare
    LogicalRDD (the Repartition node is gone from the optimized plan),
    which is what lets the self-join read the hash-partitioned layout
    with no exchange."""
    spark.conf.unset(dedup._SPARSE_MATERIALIZE_KEY)
    df = _docs(spark, tmp_path)
    out = dedup._materialize_sparse(
        df.select(
            "doc_id",
            F.explode(F.split(F.col("text"), " ")).alias("__h"),
        ).repartition(F.col("__h"))
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "ExistingRDD" in plan or "LogicalRDD" in plan
    assert "Repartition" not in plan
    assert out.count() > 0


def test_sparse_materialize_persist_mode(spark, tmp_path):
    """materialize=persist (the dynamic-allocation escape hatch) →
    MEMORY_AND_DISK cache, lineage kept (recomputable on executor
    loss): the Repartition node survives in the plan."""
    spark.conf.set(dedup._SPARSE_MATERIALIZE_KEY, "persist")
    try:
        df = _docs(spark, tmp_path)
        out = dedup._materialize_sparse(
            df.select(
                "doc_id",
                F.explode(F.split(F.col("text"), " ")).alias("__h"),
            ).repartition(F.col("__h"))
        )
        assert out.storageLevel.useMemory and out.storageLevel.useDisk
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "InMemoryRelation" in plan
        assert out.count() > 0
    finally:
        spark.conf.unset(dedup._SPARSE_MATERIALIZE_KEY)
        out.unpersist()


def test_containment_pairs_same_answer_on_both_strategies(spark, tmp_path):
    """The materialization strategy is a pure physical choice — the
    containment relation must be identical on either branch."""
    df = _docs(spark, tmp_path, n=30)
    spark.conf.unset(dedup._SPARSE_MATERIALIZE_KEY)
    via_ckpt = _pairs(
        dedup.ngram_containment_pairs(
            df, "doc_id", "text", threshold=0.3, block_col="blk"
        )
    )
    spark.conf.set(dedup._SPARSE_MATERIALIZE_KEY, "persist")
    try:
        via_persist = _pairs(
            dedup.ngram_containment_pairs(
                df, "doc_id", "text", threshold=0.3, block_col="blk"
            )
        )
    finally:
        spark.conf.unset(dedup._SPARSE_MATERIALIZE_KEY)
    assert via_ckpt == via_persist
    assert len(via_ckpt) > 0


def test_containment_single_pass_plan_has_one_intersection_join(spark, tmp_path):
    """r11: both directions are emitted from ONE overlap row (inline),
    so the sparse-intersection subtree appears once in the plan — the
    r10 fwd/rev union duplicated it (the heaviest join ran twice)."""
    df = _docs(spark, tmp_path, n=20)
    out = dedup.ngram_containment_pairs(
        df, "doc_id", "text", threshold=0.3, block_col="blk"
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Generate inline") == 1
    assert "Union" not in plan
    # the id_a < id_b intersection join appears exactly once
    assert plan.count("(id_a") <= 2  # filter + join condition, one subtree


def test_containment_directional_semantics(spark, tmp_path):
    """A short doc fully contained in a long one scores ~1.0 in the
    inner→outer direction and low in the reverse — the asymmetric
    contract survives the single-pass rewrite."""
    rows = [
        (1, "b", "alpha beta gamma delta epsilon zeta"),
        (2, "b", "alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon"),
    ]
    p = str(tmp_path / "dir.parquet")
    spark.createDataFrame(rows, ["doc_id", "blk", "text"]).write.mode(
        "overwrite"
    ).parquet(p)
    df = spark.read.parquet(p)
    got = {
        (r.id_inner, r.id_outer): r.containment
        for r in dedup.ngram_containment_pairs(
            df, "doc_id", "text", threshold=0.01, block_col="blk"
        ).collect()
    }
    assert got[(1, 2)] == 1.0
    assert got[(2, 1)] < 0.5
