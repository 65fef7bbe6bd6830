"""Round-8 operator tests: ADVICE-r7 fixes (NULL-correct distributed
cumsum, singleton-preserving incremental components, loud fingerprint
overflow, single-execution oracle dtype inference) and the
prefix-filtered exact-Jaccard candidate stage."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from parcialbigdata_spark.operators import dedup, graph
from parcialbigdata_spark.operators.diagnostics import guarded_bigint, table_fingerprint
from parcialbigdata_spark.operators.scan import partitioned_cumsum


# ------------------------------------------ partitioned_cumsum + NULLs


def test_partitioned_cumsum_null_semantics_match_global_window(spark):
    # Rows whose prefix is entirely NULL must stay NULL; the first row
    # AFTER a non-null must carry it across partition boundaries even
    # when its own partition's prefix is all-NULL (the ADVICE-r7 case:
    # NULL + offset silently stayed NULL).
    rows = [(i, None if i < 5 or i % 3 == 0 else i * 10) for i in range(40)]
    df = spark.createDataFrame(rows, "k int, x int")
    expect = {
        (r.k, r.cum)
        for r in df.withColumn(
            "cum",
            F.sum("x").over(
                Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).collect()
    }
    for p in (1, 3, 8):
        got = {
            (r.k, r.cum)
            for r in partitioned_cumsum(df, ["k"], {"x": "cum"}, num_partitions=p).collect()
        }
        assert got == expect, f"num_partitions={p}"


def test_partitioned_cumsum_all_null_group_stays_null(spark):
    df = spark.createDataFrame(
        [(g, i, None) for g in ("a", "b") for i in range(6)],
        "g string, k int, x int",
    )
    out = partitioned_cumsum(df, ["k"], {"x": "cum"}, num_partitions=4, group_cols=["g"])
    assert all(r.cum is None for r in out.collect())


# ------------------------------------- incremental_components singletons


def test_incremental_components_preserves_prior_singletons(spark):
    # Caller-supplied labels with an isolated node: 99 is its own
    # component and appears in no new pair — it must survive.
    prior = spark.createDataFrame(
        [(1, 1), (2, 1), (99, 99)], "node bigint, component bigint"
    )
    new = spark.createDataFrame([(2, 3)], "id_a bigint, id_b bigint")
    got = {
        (r.node, r.component)
        for r in graph.incremental_components(prior, new, "id_a", "id_b").collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (99, 99)}


def test_incremental_components_singleton_bridged_by_new_edge(spark):
    prior = spark.createDataFrame(
        [(1, 1), (2, 1), (99, 99)], "node bigint, component bigint"
    )
    new = spark.createDataFrame([(99, 2)], "id_a bigint, id_b bigint")
    got = {
        (r.node, r.component)
        for r in graph.incremental_components(prior, new, "id_a", "id_b").collect()
    }
    assert got == {(1, 1), (2, 1), (99, 1)}


# --------------------------------------------- fingerprint overflow guard


def test_guarded_bigint_raises_on_overflow_and_passes_in_range(spark):
    ok = spark.range(1).select(
        guarded_bigint(F.lit("9223372036854775807").cast("decimal(38,0)"), "boom").alias("v")
    )
    assert ok.first().v == 9223372036854775807
    null_in = spark.range(1).select(
        guarded_bigint(F.lit(None).cast("decimal(38,0)"), "boom").alias("v")
    )
    assert null_in.first().v is None
    bad = spark.range(1).select(
        guarded_bigint(F.lit("9223372036854775808").cast("decimal(38,0)"), "boom").alias("v")
    )
    with pytest.raises(Exception, match="boom"):
        bad.collect()


def test_table_fingerprint_still_emits_bigint(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    row = table_fingerprint(df, ["id", "s"], "t").first()
    assert row.n_rows == 2 and isinstance(row.fingerprint, int)


# ------------------------------- prefix-filtered exact-Jaccard pairs


def _brute_jaccard(texts, k, th):
    import itertools
    import re

    def sh(t):
        toks = re.sub(r"[^a-z0-9 ]", " ", t.lower()).split()
        if not toks:
            return set()
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    out = set()
    for (i, a), (j, b) in itertools.combinations(texts, 2):
        sa, sb = sh(a), sh(b)
        if not sa or not sb:
            continue
        jac = round(len(sa & sb) / max(len(sa | sb), 1), 6)
        if jac >= th:
            out.add((i, j, jac))
    return out


def test_ngram_jaccard_pairs_complete_vs_brute_force(spark):
    # The candidate stage is a COMPLETE prefix filter — the output must
    # equal brute-force blocked all-pairs at every threshold, including
    # the low ones the cluster family uses (t=0.05).
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumped over the lazy dog"),
        (3, "completely different text about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "one"),
        (6, ""),
        (7, "spark engines are completely different from the lazy dog"),
        (8, "a b a b a b c"),
        (9, "fox dog lazy the over jumps brown quick the"),
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    for t in (0.05, 0.1, 0.3, 0.5, 0.9):
        got = {
            (r.id_a, r.id_b, r.jaccard_sim)
            for r in dedup.ngram_jaccard_pairs(
                df, "doc_id", "text", threshold=t, k_shingle=2, max_unblocked_rows=0
            ).collect()
        }
        assert got == _brute_jaccard(texts, 2, t), f"threshold {t}"


def test_ngram_jaccard_pairs_blocked_matches_within_block_brute(spark):
    texts = [(i, "shared common text body here") for i in range(1, 5)]
    df = spark.createDataFrame(texts, "doc_id int, text string").withColumn(
        "blk", (F.col("doc_id") % 2).cast("string")
    )
    got = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.5, k_shingle=2, block_col="blk"
        ).collect()
    }
    # identical docs, but only same-parity ids share a block
    assert got == {(1, 3), (2, 4)}


def test_ngram_jaccard_pairs_plan_has_no_broadcast_hint(spark):
    # VERDICT r7: the old candidate stage force-broadcast the entire
    # shingled corpus. The new plan must contain no broadcast hint at
    # all — AQE stays free to broadcast tiny RESULT-sized sides, but
    # nothing corpus-wide is pinned.
    df = spark.createDataFrame(
        [(i, f"token{i} alpha beta gamma", "b") for i in range(30)],
        "doc_id int, text string, blk string",
    )
    out = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.05, k_shingle=2, block_col="blk"
    )
    logical = out._jdf.queryExecution().logical().toString()
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical


def test_ngram_jaccard_pairs_rejects_nonpositive_threshold(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError, match="threshold > 0"):
        dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0)


# -------------------------------------- oracle float64 dtype inference


def test_float64_columns_matches_fetchdf_dtypes():
    import duckdb

    from parcialbigdata_spark.oracle import _float64_columns

    con = duckdb.connect()
    sql = """
    SELECT 1::HUGEINT AS h, 1.5::DECIMAL(18,2) AS d18, 1::DECIMAL(38,0) AS d38,
           1.0::DOUBLE AS dbl, 1.0::FLOAT AS flt,
           1::BIGINT AS big_nonnull, NULL::BIGINT AS big_null,
           1::INTEGER AS int_nonnull, NULL::INTEGER AS int_null,
           true AS b, NULL::BOOLEAN AS b_null,
           DATE '2020-01-01' AS dt, NULL::DATE AS dt_null,
           'x' AS s, NULL::VARCHAR AS s_null,
           [1,2] AS lst, 1::UBIGINT AS ub, NULL::UBIGINT AS ub_null,
           1::SMALLINT AS si, NULL::SMALLINT AS si_null,
           TIMESTAMP '2020-01-01' AS ts2, NULL::TIMESTAMP AS ts_null
    """
    rows = [tuple(r) for r in con.execute(sql).fetchall()]
    inferred = set(_float64_columns(con, sql, rows))
    dt = con.execute(sql).fetchdf().dtypes
    actual = {i for i, d in enumerate(dt) if str(d) == "float64"}
    assert inferred == actual


def test_float64_columns_falls_back_without_describe():
    import duckdb

    from parcialbigdata_spark.oracle import _float64_columns

    con = duckdb.connect()
    # CTE + SET-style statement DESCRIBE can bind fine; force the
    # fallback with a statement DESCRIBE rejects (PRAGMA).
    sql = "FROM (SELECT 1::HUGEINT AS h)"
    rows = [(1,)]
    assert _float64_columns(con, sql, rows) in ([0], [0])
