"""Round-10 operators: incremental embedding-ANN index maintenance
(ivf_index_ingest / ivf_index_probe) — correctness vs brute force,
append-maintenance semantics, and the batch-side-only shuffle pin."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from parcialbigdata_spark.operators import similarity


def _vecs(spark, rows):
    """rows: list of (id, [floats]) -> DataFrame(vec_id, embedding)."""
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<double>",
    )


def _cluster_points(center, n, spread, seed):
    rng = np.random.default_rng(seed)
    c = np.asarray(center, dtype=np.float64)
    return [c + spread * rng.standard_normal(len(c)) for _ in range(n)]


@pytest.fixture()
def _cells_table(spark):
    name = "t10_ivf_cells"
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_ivf_index_probe_matches_bruteforce(spark, _cells_table):
    # With nprobe == n_centroids every cell is probed, so the index
    # path must equal the exact k-NN join row for row.
    centers = [[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0]]
    hist_rows, i = [], 0
    for ci, c in enumerate(centers):
        for p in _cluster_points(c, 8, 0.5, seed=ci):
            hist_rows.append((i, p))
            i += 1
    batch_rows = [(100 + ci, np.asarray(c) + 0.1) for ci, c in enumerate(centers)]
    history, batch = _vecs(spark, hist_rows), _vecs(spark, batch_rows)
    centroids = similarity.ivf_fit_centroids(history, n_centroids=3)
    similarity.ivf_index_ingest(history, _cells_table, centroids)
    approx = similarity.ivf_index_probe(
        batch, _cells_table, centroids, k=4, nprobe=3
    )
    exact = similarity.knn_join(
        batch.select(F.col("vec_id").alias("query_id"), "embedding"),
        history,
        k=4,
        query_id="query_id",
        corpus_id="vec_id",
    )
    got = {(r.query_id, r.match_id, r.rank) for r in approx.collect()}
    want = {(r.query_id, r.vec_id, r.rank) for r in exact.collect()}
    assert got == want


def test_ivf_index_append_probes_full_history(spark, _cells_table):
    # Index maintenance: after append=True the probe must see BOTH the
    # seed corpus and the appended delta — and cell assignments of the
    # delta must come from the SAME centroids.
    centers = [[10, 0], [0, 10]]
    seed_rows = [(0, [10.0, 0.0]), (1, [0.0, 10.0])]
    delta_rows = [(2, [10.2, 0.0]), (3, [0.0, 10.2])]
    seed_df, delta_df = _vecs(spark, seed_rows), _vecs(spark, delta_rows)
    centroids = [[10.0, 0.0], [0.0, 10.0]]
    similarity.ivf_index_ingest(seed_df, _cells_table, centroids)
    similarity.ivf_index_ingest(delta_df, _cells_table, centroids, append=True)
    batch = _vecs(spark, [(9, [10.1, 0.0])])
    out = similarity.ivf_index_probe(
        batch, _cells_table, centroids, k=5, nprobe=1
    ).collect()
    matched = {r.match_id for r in out}
    # nprobe=1 probes only the [10,0] cell: seed row 0 AND delta row 2,
    # never the other cell's rows.
    assert matched == {0, 2}


def test_ivf_index_compact_collapses_replayed_appends(spark, _cells_table):
    # A replayed append duplicates cell rows and multiplies probe
    # match rows; compaction restores the clean answer in the same
    # bucketed layout.
    centroids = [[10.0, 0.0], [0.0, 10.0]]
    seed = _vecs(spark, [(0, [10.0, 0.0]), (1, [0.0, 10.0])])
    delta = _vecs(spark, [(2, [10.2, 0.0])])
    similarity.ivf_index_ingest(seed, _cells_table, centroids)
    for _ in range(2):  # replayed append
        similarity.ivf_index_ingest(delta, _cells_table, centroids, append=True)
    batch = _vecs(spark, [(9, [10.1, 0.0])])
    dup = similarity.ivf_index_probe(
        batch, _cells_table, centroids, k=5, nprobe=1
    ).collect()
    assert len(dup) > len({(r.query_id, r.match_id) for r in dup})
    try:
        similarity.ivf_index_compact(spark, _cells_table)
        clean = similarity.ivf_index_probe(
            batch, _cells_table, centroids, k=5, nprobe=1
        ).collect()
        got = {(r.query_id, r.match_id, r.rank) for r in clean}
        assert got == {(9, 0, 1), (9, 2, 2)} or got == {(9, 2, 1), (9, 0, 2)}
        assert len(clean) == len(got)
        # layout preserved: the compacted table still plans a bucketed scan
        out = similarity.ivf_index_probe(
            batch, _cells_table, centroids, k=5, nprobe=1
        )
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {_cells_table}__compact")


@given(
    ys=st.lists(st.integers(0, 100), min_size=2, max_size=14),
)
@settings(max_examples=6, deadline=None)
def test_isotonic_pava_equals_minimax_property(spark, ys):
    """For ANY integer sequence: the PAVA kernel equals the minimax
    closed form max_{j<=i} min_{k>=i} mean(y[j..k]) and the output is
    nondecreasing."""
    from fractions import Fraction

    from parcialbigdata_spark.operators.timeseries import isotonic_fit_by_group

    rows = [("g", i, v * 100) for i, v in enumerate(ys)]  # cents
    df = spark.createDataFrame(rows, "g string, x int, cents bigint")
    out = {
        r.x: r.fitted
        for r in isotonic_fit_by_group(df, ["g"], "x", "cents").collect()
    }
    n = len(ys)
    ref = []
    for i in range(n):
        best = None
        for j in range(i + 1):
            worst = None
            for k in range(i, n):
                m = Fraction(sum(ys[j : k + 1]), k + 1 - j)
                worst = m if worst is None or m < worst else worst
            best = worst if best is None or worst > best else best
        ref.append(best)
    for i in range(n):
        assert abs(out[i] - round(float(ref[i]), 6)) < 2e-6, (i, out[i], ref[i])
    fits = [out[i] for i in range(n)]
    assert all(a <= b + 1e-9 for a, b in zip(fits, fits[1:]))


def test_isotonic_ties_preaverage_and_pool(spark):
    # Duplicate x values pre-average; a decreasing pair pools to the
    # weighted mean.
    from parcialbigdata_spark.operators.timeseries import isotonic_fit_by_group

    rows = [("g", 1, 10_000), ("g", 1, 0), ("g", 2, 2_000)]
    df = spark.createDataFrame(rows, "g string, x int, cents bigint")
    out = {r.x: (r.n_points, r.fitted) for r in
           isotonic_fit_by_group(df, ["g"], "x", "cents").collect()}
    # x=1 pre-averages to 50.00; the (50, 20) violation pools to
    # weighted mean (10000+0+2000)/3 = 40.00
    assert out[1] == (2, 40.0) and out[2] == (1, 40.0)


# ----------------------------------------------- r10: property tests


@given(vals=st.lists(st.integers(0, 50), min_size=3, max_size=40))
@settings(max_examples=6, deadline=None)
def test_cusum_closed_form_equals_recurrence_property(spark, vals):
    """For ANY integer series: the prefix-sum − running-min closed form
    must equal a literal simulation of Page's recurrence on the same
    quantized z-scores (both excursions, every position)."""
    import math

    from parcialbigdata_spark.operators.timeseries import cusum_changepoints

    n = len(vals)
    var = (sum(v * v for v in vals) - sum(vals) ** 2 / n) / n
    if var <= 0:
        return  # constant series is filtered by the operator contract
    rows = [("g", f"d{i:03d}", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t string, v bigint")
    out = {
        r.t: r
        for r in cusum_changepoints(
            df, ["g"], "t", "v", k_sigma=0.5, h_sigma=4.0
        ).collect()
    }
    mu = sum(vals) / n
    sp = sn = 0
    for i, v in enumerate(vals):
        zi = round((v - mu) / math.sqrt(var) * 1e6)
        sp = max(0, sp + zi - 500_000)
        sn = min(0, sn + zi + 500_000)
        r = out[f"d{i:03d}"]
        assert abs(r.s_pos - sp / 1e6) < 1e-9
        assert abs(r.s_neg - sn / 1e6) < 1e-9


@given(
    vals=st.lists(st.integers(0, 1000), min_size=6, max_size=30),
    max_lag=st.integers(1, 4),
)
@settings(max_examples=6, deadline=None)
def test_acf_matches_numpy_property(spark, vals, max_lag):
    """For ANY integer series with nonzero variance: every lag's ACF
    equals the textbook estimator computed directly in numpy."""
    import numpy as np

    from parcialbigdata_spark.operators.timeseries import acf_by_lag

    y = np.asarray(vals, dtype=np.float64)
    if y.var() == 0 or max_lag >= len(vals):
        return
    rows = [("g", f"d{i:03d}", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t string, v bigint")
    out = {
        r.lag: r.acf
        for r in acf_by_lag(df, ["g"], "t", "v", max_lag=max_lag).collect()
    }
    mu = y.mean()
    den = ((y - mu) ** 2).sum()
    for k in range(1, max_lag + 1):
        ref = ((y[k:] - mu) * (y[:-k] - mu)).sum() / den
        assert abs(out[k] - round(ref, 6)) < 2e-6, (k, out[k], ref)


def test_phrase_search_adjacency_and_overlap(spark):
    # Adjacency is positional, overlapping matches count separately,
    # and reversed-order or gapped occurrences never match.
    from parcialbigdata_spark.operators.corpus import phrase_search

    rows = [
        (1, "a a a b"),        # "a a" twice (overlap), "a b" once
        (2, "b a x a b"),      # no adjacent "a a"; "a b" once
        (3, "b b a"),          # reversed only — no "a b"
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    aa = {r.doc_id: r.n_matches for r in phrase_search(df, ["a", "a"]).collect()}
    ab = {r.doc_id: r.n_matches for r in phrase_search(df, ["a", "b"]).collect()}
    assert aa == {1: 2}
    assert ab == {1: 1, 2: 1}
    # 3-token phrase chains the extra join
    tri = {r.doc_id: r.n_matches for r in phrase_search(df, ["a", "a", "b"]).collect()}
    assert tri == {1: 1}


def test_sorted_neighborhood_pairs_window_and_partitions(spark):
    # Pairs are exactly the rn-difference-<=w pairs of the per-partition
    # sorted order; nothing crosses a partition; pos_gap is the rank gap.
    from parcialbigdata_spark.operators.linkage import sorted_neighborhood_pairs

    rows = [
        ("P", 1, "aaa"), ("P", 2, "aab"), ("P", 3, "abc"), ("P", 4, "zzz"),
        ("Q", 9, "aaa"),  # same key as P/1 but different partition
    ]
    df = spark.createDataFrame(rows, "part string, id bigint, k string")
    out = sorted_neighborhood_pairs(df, "id", "k", window=2, partition_col="part")
    got = {(r.part, r.id_a, r.id_b, r.pos_gap) for r in out.collect()}
    want = {
        ("P", 1, 2, 1), ("P", 2, 3, 1), ("P", 3, 4, 1),
        ("P", 1, 3, 2), ("P", 2, 4, 2),
    }
    assert got == want  # 9 never pairs across the partition boundary


def test_minhash_index_compact_collapses_replay_and_recaps(spark):
    # (a) a replayed append leaves duplicate set rows that MULTIPLY
    # probe output rows; (b) compaction restores the clean answer;
    # (c) the max_bucket cap re-applies GLOBALLY across appends.
    from parcialbigdata_spark.operators import dedup

    text = "the quick brown fox jumps over the lazy dog again and again"
    hist = spark.createDataFrame(
        [(1, text), (2, text + " tail")], "doc_id bigint, text string"
    )
    b1 = spark.createDataFrame([(3, text + " extra")], "doc_id bigint, text string")
    probe = spark.createDataFrame(
        [(9, text + " extra words")], "doc_id bigint, text string"
    )
    bt, st = "t10_cmp_bands", "t10_cmp_sets"
    try:
        dedup.minhash_index_ingest(hist, "doc_id", "text", bt, st, k_shingle=2)
        dedup.minhash_index_ingest(
            b1, "doc_id", "text", bt, st, k_shingle=2, append=True
        )
        clean = sorted(
            (r.new_id, r.old_id, r.jaccard_sim)
            for r in dedup.minhash_index_probe(
                probe, "doc_id", "text", bt, st, threshold=0.2, k_shingle=2
            ).collect()
        )
        # replay batch 1
        dedup.minhash_index_ingest(
            b1, "doc_id", "text", bt, st, k_shingle=2, append=True
        )
        dup = [
            (r.new_id, r.old_id)
            for r in dedup.minhash_index_probe(
                probe, "doc_id", "text", bt, st, threshold=0.2, k_shingle=2
            ).collect()
        ]
        assert len(dup) > len(set(dup))  # duplicated set rows multiply output
        dedup.minhash_index_compact(spark, bt, st, "doc_id")
        after = sorted(
            (r.new_id, r.old_id, r.jaccard_sim)
            for r in dedup.minhash_index_probe(
                probe, "doc_id", "text", bt, st, threshold=0.2, k_shingle=2
            ).collect()
        )
        assert after == clean
        # (c) global cap: two appends each under max_bucket whose UNION
        # crosses it — compact with a tiny cap must drop the hot bucket.
        n_before = spark.table(bt).count()
        dedup.minhash_index_compact(spark, bt, st, "doc_id", max_bucket=1)
        n_after = spark.table(bt).count()
        assert n_after < n_before  # shared-text band buckets were capped
    finally:
        for t in (bt, st, f"{bt}__compact", f"{st}__compact"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_streaming_ivf_index_matches_batch_replay(spark, tmp_path):
    # Stream/batch agreement + the r10 output discipline: on the same
    # ordered batches the streaming driver must emit exactly what the
    # batch replay of ingest->probe->append emits, never collect to
    # the driver, and leave one overwrite dir per epoch.
    import os
    import time as _time

    from parcialbigdata_spark.streaming.ann_store import run_streaming_ivf_index

    centers = [[10.0, 0.0], [0.0, 10.0]]
    batches = [
        [(0, [10.0, 0.1]), (1, [0.1, 10.0]), (2, [9.8, 0.0])],  # seed
        [(10, [10.1, 0.0])],  # ~ matches 0, 2
        [(20, [0.0, 10.1]), (21, [10.0, 0.05])],  # vs seed + batch 1
    ]
    stream_dir = tmp_path / "stream"
    os.makedirs(stream_dir)
    now = _time.time()
    for i, rows in enumerate(batches):
        df = _vecs(spark, rows)
        tmp = str(tmp_path / f"w{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        import glob
        import shutil

        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = str(stream_dir / f"b{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (now - 60 + 10 * i, now - 60 + 10 * i))
    matches_dir = str(tmp_path / "matches")
    stream_t, batch_t = "t10_sivf_stream", "t10_sivf_batch"
    from pyspark.sql import DataFrame as _DF

    real_collect = _DF.collect

    def _no_collect(self):
        raise AssertionError("collect() inside run_streaming_ivf_index")

    try:
        _DF.collect = _no_collect
        try:
            got_df = run_streaming_ivf_index(
                spark, str(stream_dir), stream_t, centers, k=2, nprobe=2,
                matches_dir=matches_dir,
            )
        finally:
            _DF.collect = real_collect
        got = {(r.query_id, r.match_id, r.rank) for r in got_df.collect()}
        # batch replay with the same centroids
        want = set()
        similarity.ivf_index_ingest(_vecs(spark, batches[0]), batch_t, centers)
        for rows in batches[1:]:
            bdf = _vecs(spark, rows)
            p = similarity.ivf_index_probe(bdf, batch_t, centers, k=2, nprobe=2)
            want |= {(r.query_id, r.match_id, r.rank) for r in p.collect()}
            similarity.ivf_index_ingest(bdf, batch_t, centers, append=True)
        assert got == want and got
        epochs = sorted(
            d for d in os.listdir(matches_dir) if d.startswith("epoch_")
        )
        assert epochs == ["epoch_0", "epoch_1", "epoch_2"]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {stream_t}")
        spark.sql(f"DROP TABLE IF EXISTS {batch_t}")


# ------------------------------------- r10: time-series analysis family


def test_cusum_matches_page_recurrence_and_alarms_on_shift(spark):
    # 30 flat days then 30 days shifted +3 units: the closed prefix
    # form (running sum minus running min) must equal a literal
    # simulation of Page's recurrence, and the alarm must fire after
    # the shift, never before it.
    from parcialbigdata_spark.operators.timeseries import cusum_changepoints

    vals = [10, 11, 10, 9, 10] * 6 + [13, 14, 13, 12, 13] * 6
    rows = [("g", f"d{i:03d}", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t string, v bigint")
    out = {
        r.t: r
        for r in cusum_changepoints(
            df, ["g"], "t", "v", k_sigma=0.5, h_sigma=3.0
        ).collect()
    }
    # Literal Page recurrence on the same quantized z-scores.
    import math

    n = len(vals)
    mu = sum(vals) / n
    var = (sum(v * v for v in vals) - sum(vals) * sum(vals) / n) / n
    zis = [round((v - mu) / math.sqrt(var) * 1e6) for v in vals]
    sp = sn = 0
    for i, zi in enumerate(zis):
        sp = max(0, sp + zi - 500_000)
        sn = min(0, sn + zi + 500_000)
        r = out[f"d{i:03d}"]
        assert abs(r.s_pos - sp / 1e6) < 1e-9, (i, r.s_pos, sp)
        assert abs(r.s_neg - sn / 1e6) < 1e-9, (i, r.s_neg, sn)
    # The reference mean spans BOTH regimes, so the low first half
    # legitimately drives the NEGATIVE excursion; the level shift
    # itself must surface as the POSITIVE excursion, and only after
    # the shift point.
    pos_alarms = [t for t, r in out.items() if r.s_pos > 3.0]
    assert pos_alarms and min(pos_alarms) >= "d030"
    assert any(r.alarm for r in out.values())


def test_seasonal_decompose_recovers_planted_pattern(spark):
    # Flat level + exact period-7 additive pattern, in cents. The
    # seasonal estimate must equal the planted pattern (re-centered)
    # and residuals must vanish on every full-window row.
    from parcialbigdata_spark.operators.timeseries import seasonal_decompose

    pattern = [500, -300, 200, 0, -400, 100, -100]  # sums to 0, cents
    rows = [
        ("g", f"d{i:03d}", 100_000 + pattern[i % 7]) for i in range(49)
    ]
    df = spark.createDataFrame(rows, "g string, t string, cents bigint")
    out = seasonal_decompose(df, ["g"], "t", "cents", period=7).collect()
    by_day = {r.t: r for r in out}
    for i in range(3, 46):  # rows with a full centered window
        r = by_day[f"d{i:03d}"]
        assert abs(r.trend - 1000.0) < 1e-6, (i, r.trend)
        assert abs(r.seasonal - pattern[i % 7] / 100.0) < 1e-6, (i, r.seasonal)
        assert abs(r.resid) < 1e-6, (i, r.resid)
    # Edge rows: no trend, no resid, but value always present.
    assert by_day["d000"].trend is None and by_day["d000"].resid is None


def test_acf_matches_numpy_and_detects_period(spark):
    # Exact period-4 series: acf(4) must be maximal; every lag must
    # match the textbook estimator computed directly in numpy.
    import numpy as np

    from parcialbigdata_spark.operators.timeseries import acf_by_lag

    vals = [100, 250, 180, 90] * 12
    rows = [("g", f"d{i:03d}", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t string, v bigint")
    out = {r.lag: r for r in acf_by_lag(df, ["g"], "t", "v", max_lag=5).collect()}
    y = np.asarray(vals, dtype=np.float64)
    mu = y.mean()
    den = ((y - mu) ** 2).sum()
    for k in range(1, 6):
        ref = (((y[k:] - mu) * (y[:-k] - mu)).sum()) / den
        assert abs(out[k].acf - round(ref, 6)) < 2e-6, (k, out[k].acf, ref)
        assert out[k].n_pairs == len(vals) - k
    assert out[4].acf > max(out[k].acf for k in (1, 2, 3, 5))


def test_ivf_index_probe_shuffles_only_batch_side(spark, _cells_table):
    # The stored cell table is bucketed on ivf_cell: the probe join's
    # executed plan must read it as a bucketed scan (no exchange above
    # the stored side — only the exploded batch side may shuffle).
    hist = _vecs(
        spark, [(i, [float(i % 4), float((i + 1) % 4)]) for i in range(32)]
    )
    centroids = [[0.0, 1.0], [1.0, 2.0], [2.0, 3.0], [3.0, 0.0]]
    similarity.ivf_index_ingest(hist, _cells_table, centroids)
    batch = _vecs(spark, [(100, [1.0, 2.0])])
    out = similarity.ivf_index_probe(batch, _cells_table, centroids, k=3, nprobe=2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(r"FileScan parquet.*t10_ivf_cells", plan, re.I), plan
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan
