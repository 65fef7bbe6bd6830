"""Planted-cluster ANN attestation fixture: structural + checksum pins.

The r4 ANN recall oracles (queries.py ``ann/ivf/pq/ivfpq_topk_embeddings``,
``embedding_near_dup_clustered``) are *fixture-dependent*: their floors
were measured against the committed
``tests/fixtures/embeddings_clustered.parquet``. A silent regeneration
of that file would turn a correct index into an opaque value-hash
mismatch at the driver gate. These tests make that failure loud and
local instead:

- the checksum pin names the file and the regeneration tool, so a diff
  in the fixture fails HERE with instructions, not in the oracle hash;
- the structural pins assert the *properties the floors rely on*
  (cluster separation), so even an intentional regeneration that keeps
  the checksum test updated cannot silently weaken the attestation.
"""

from __future__ import annotations

import hashlib
import pathlib

import numpy as np
import pyarrow.parquet as pq

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "embeddings_clustered.parquet"

# Pinned at r4 generation (tools/make_clustered_embeddings.py, seed 7).
FIXTURE_MD5 = "2ee0c903ca0237638c82c7701d55bc0e"


def test_fixture_checksum_pinned():
    got = hashlib.md5(FIXTURE.read_bytes()).hexdigest()
    assert got == FIXTURE_MD5, (
        f"embeddings_clustered.parquet changed (md5 {got} != {FIXTURE_MD5}). "
        "The ANN recall-attestation oracles' floors were measured against "
        "the committed fixture — if the regeneration is intentional, re-run "
        "tools/make_clustered_embeddings.py, re-measure recall for the five "
        "attested queries (see their docstrings), update the floors if "
        "needed, and update FIXTURE_MD5 here."
    )


def test_fixture_cluster_structure():
    t = pq.read_table(FIXTURE)
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    cluster = np.asarray(t["cluster_id"].to_pylist())
    assert emb.shape == (4096, 64)
    assert len(np.unique(cluster)) == 16

    # Unit-normalized rows: cosine == dot.
    norms = np.linalg.norm(emb, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)

    # The properties the attestation floors rely on: within-cluster
    # similarity far above threshold-relevant levels, cross-cluster far
    # below. Checked on cluster 0 vs cluster 1 (representative; the
    # generator is exchangeable across clusters).
    c0, c1 = emb[cluster == 0], emb[cluster == 1]
    within = c0[0] @ c0[1:].T
    cross = c0 @ c1.T
    assert within.min() > 0.80, "within-cluster cosine floor broken"
    assert abs(cross).max() < 0.35, "cross-cluster separation broken"


def test_fixture_ids_cluster_major():
    # The near-dup subset filter (vec_id % 256 < 32) assumes cluster-
    # major ids: vec_id = cluster * 256 + i.
    t = pq.read_table(FIXTURE)
    vec_id = np.asarray(t["vec_id"].to_pylist())
    cluster = np.asarray(t["cluster_id"].to_pylist())
    assert (vec_id // 256 == cluster).all()
