"""Generate the committed planted-cluster embedding fixture.

The driver's synthetic ``embeddings`` table is structure-free random
noise, so ANN recall over it is unmeasurable-by-construction (any LSH
family has near-zero recall on uniformly random points — documented in
R3_NOTES.md). This tool plants the structure the ANN oracles need:

- 16 well-separated unit centroids (pairwise |cos| ≈ 1/sqrt(64) ≈ 0.12),
- 256 points per cluster: ``normalize(centroid + sigma * N(0, I))`` with
  ``sigma = 0.04`` → within-cluster cosine concentrates around
  ``1 / (1 + dim * sigma^2) ≈ 0.91``, far above any cross-cluster pair,

so exact top-k neighbors of any point are its cluster mates and
``recall@k`` becomes a *deterministic, attestable* quantity instead of a
coin flip. Committed once (like tests/fixtures/{png,wav,mp4}); both
Spark and the DuckDB oracle read the same parquet bytes, so there is no
cross-engine float-generation drift to reason about.

Schema mirrors the driver's embeddings table: vec_id BIGINT (cluster-
major: ``cluster * 256 + i``), embedding FLOAT[64], cluster_id INT.

Run: ``python tools/make_clustered_embeddings.py`` (idempotent, seeded).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "embeddings_clustered.parquet",
)

N_CLUSTERS = 16
PER_CLUSTER = 256
DIM = 64
SIGMA = 0.04
SEED = 7


def main() -> None:
    rng = np.random.default_rng(SEED)
    centroids = rng.standard_normal((N_CLUSTERS, DIM))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)

    rows = N_CLUSTERS * PER_CLUSTER
    cluster_id = np.repeat(np.arange(N_CLUSTERS, dtype=np.int32), PER_CLUSTER)
    points = centroids[cluster_id] + SIGMA * rng.standard_normal((rows, DIM))
    points /= np.linalg.norm(points, axis=1, keepdims=True)
    emb32 = points.astype(np.float32)

    table = pa.table(
        {
            "vec_id": pa.array(np.arange(rows, dtype=np.int64)),
            "embedding": pa.array(list(emb32), type=pa.list_(pa.float32())),
            "cluster_id": pa.array(cluster_id, type=pa.int32()),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT, compression="snappy")

    # Print the structure stats the fixture promises, so a regeneration
    # that breaks them is visible at generation time.
    within = emb32[0] @ emb32[1:PER_CLUSTER].T
    cross = emb32[0] @ emb32[PER_CLUSTER : 2 * PER_CLUSTER].T
    print(f"wrote {OUT}: {rows} rows, dim {DIM}")
    print(f"within-cluster cos (c0): min {within.min():.4f} mean {within.mean():.4f}")
    print(f"cross-cluster cos (c0 vs c1): max {cross.max():.4f}")


if __name__ == "__main__":
    main()
