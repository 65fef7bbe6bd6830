"""Round-10 operators: incremental embedding-ANN index maintenance
(ivf_index_ingest / ivf_index_probe) — correctness vs brute force,
append-maintenance semantics, and the batch-side-only shuffle pin."""

import numpy as np
import pytest
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
