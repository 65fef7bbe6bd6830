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


# ----------------------------- crash-recoverable compaction swap (r11)


from parcialbigdata_spark.operators import similarity
from parcialbigdata_spark.sources.warehouse import (
    recover_staged_swap,
    swap_staged_table,
)


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<double>",
    )


@pytest.fixture()
def _swap_table(spark):
    from parcialbigdata_spark.sources.warehouse import reset_swap_recovery_memo

    name = "t11_ivf_cells"
    # Each test simulates a crash + NEW session probing the index; the
    # probe's once-per-session recovery memo must behave like a fresh
    # session (r12: recovery is startup-only, memoized per table).
    reset_swap_recovery_memo(name)
    yield name
    for suffix in ("", "__old", "__compact"):
        spark.sql(f"DROP TABLE IF EXISTS {name}{suffix}")


_CENTROIDS = [[10.0, 0.0], [0.0, 10.0]]


def _seed_index_with_replay(spark, table):
    seed = _vecs(spark, [(0, [10.0, 0.0]), (1, [0.0, 10.0])])
    delta = _vecs(spark, [(2, [10.2, 0.0])])
    similarity.ivf_index_ingest(seed, table, _CENTROIDS)
    for _ in range(2):  # replayed append → duplicate rows
        similarity.ivf_index_ingest(delta, table, _CENTROIDS, append=True)


def _probe_matches(spark, table):
    batch = _vecs(spark, [(9, [10.1, 0.0])])
    out = similarity.ivf_index_probe(
        batch, table, _CENTROIDS, k=5, nprobe=1
    ).collect()
    return {(r.query_id, r.match_id) for r in out}


def test_probe_answers_after_crash_between_stage_and_swap(spark, _swap_table):
    """Simulate a compaction that crashed after writing the stage but
    before starting the swap: the live index must still answer, and the
    probe's startup recovery clears the stale stage so the next
    compaction can re-run."""
    _seed_index_with_replay(spark, _swap_table)
    # stage written, swap never started
    from parcialbigdata_spark.sources.warehouse import write_bucketed

    cells = spark.table(_swap_table).distinct()
    write_bucketed(cells, f"{_swap_table}__compact", "ivf_cell")
    assert _probe_matches(spark, _swap_table) == {(9, 0), (9, 2)}
    # probe's recovery dropped the stale stage
    assert not spark.catalog.tableExists(f"{_swap_table}__compact")
    # and a full compaction still completes afterwards
    similarity.ivf_index_compact(spark, _swap_table)
    assert _probe_matches(spark, _swap_table) == {(9, 0), (9, 2)}


def test_probe_recovers_after_crash_between_renames(spark, _swap_table):
    """Simulate the crash in the middle of the swap itself (live table
    parked aside, staged table not yet renamed in): the probe's startup
    recovery rolls FORWARD to the compacted table and answers without
    duplicates."""
    _seed_index_with_replay(spark, _swap_table)
    from parcialbigdata_spark.sources.warehouse import write_bucketed

    cells = spark.table(_swap_table).distinct()
    write_bucketed(cells, f"{_swap_table}__compact", "ivf_cell")
    spark.sql(f"ALTER TABLE {_swap_table} RENAME TO {_swap_table}__old")
    # live table missing — the r10 DROP-then-RENAME failure mode
    assert not spark.catalog.tableExists(_swap_table)
    assert _probe_matches(spark, _swap_table) == {(9, 0), (9, 2)}
    # rolled forward: compacted table live, no leftovers, no dup rows
    batch = _vecs(spark, [(9, [10.1, 0.0])])
    rows = similarity.ivf_index_probe(
        batch, _swap_table, _CENTROIDS, k=5, nprobe=1
    ).collect()
    assert len(rows) == 2
    assert not spark.catalog.tableExists(f"{_swap_table}__old")
    assert not spark.catalog.tableExists(f"{_swap_table}__compact")


def test_recover_staged_swap_decision_table(spark, _swap_table):
    """Every reachable interrupted state resolves to a live table."""
    t = _swap_table

    def fresh():
        for suffix in ("", "__old", "__compact"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{suffix}")
        spark.createDataFrame([(1,)], "x bigint").write.saveAsTable(t)

    # steady state
    fresh()
    assert recover_staged_swap(spark, t) == "noop"
    # swap finished, cleanup missed
    fresh()
    spark.createDataFrame([(2,)], "x bigint").write.saveAsTable(f"{t}__old")
    assert recover_staged_swap(spark, t) == "dropped_old"
    assert spark.table(t).collect()[0].x == 1
    # stage present, swap never started
    fresh()
    spark.createDataFrame([(3,)], "x bigint").write.saveAsTable(f"{t}__compact")
    assert recover_staged_swap(spark, t) == "dropped_stage"
    assert spark.table(t).collect()[0].x == 1
    # crashed between the renames → forward
    fresh()
    spark.createDataFrame([(4,)], "x bigint").write.saveAsTable(f"{t}__compact")
    spark.sql(f"ALTER TABLE {t} RENAME TO {t}__old")
    assert recover_staged_swap(spark, t) == "rolled_forward"
    assert spark.table(t).collect()[0].x == 4
    # defensive rollback state
    fresh()
    spark.sql(f"ALTER TABLE {t} RENAME TO {t}__old")
    assert recover_staged_swap(spark, t) == "rolled_back"
    assert spark.table(t).collect()[0].x == 1


def test_swap_staged_table_happy_path(spark, _swap_table):
    t = _swap_table
    spark.createDataFrame([(1,)], "x bigint").write.saveAsTable(t)
    spark.createDataFrame([(2,)], "x bigint").write.saveAsTable(f"{t}__compact")
    swap_staged_table(spark, t)
    assert spark.table(t).collect()[0].x == 2
    assert not spark.catalog.tableExists(f"{t}__old")
    assert not spark.catalog.tableExists(f"{t}__compact")


# --------------------------------------- r11 ADVICE fixes (timeseries)


import numpy as np

from parcialbigdata_spark.operators import timeseries


def test_theilsen_group_answer_unchanged_after_chunking(spark):
    """Operator-level check: slope/intercept/n_pairs equal the direct
    numpy computation on the same points."""
    rng = np.random.default_rng(3)
    n = 601
    x = np.arange(n, dtype=np.float64)
    y = 2.5 * x + rng.standard_normal(n) * 10
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(x, y)], ["g", "x", "y"]
    )
    out = timeseries.theilsen_by_group(df, ["g"], "x", "y").collect()[0]
    ia, ib = np.triu_indices(n, 1)
    slopes = np.sort((y[ib] - y[ia]) / (x[ib] - x[ia]), kind="stable")
    m = len(slopes)
    want_slope = float(slopes[(m - 1) // 2]) + (
        float(slopes[m // 2]) - float(slopes[(m - 1) // 2])
    ) * 0.5
    assert out.n_pairs == m
    assert abs(out.slope - round(want_slope, 6)) < 1e-12


def test_theilsen_guard_default_is_memory_safe(spark):
    """ADVICE r10: the 20k default admitted ~2e8-pair kernels; the new
    default refuses anything above 8,000 rows per group."""
    df = spark.range(8_001).select(
        F.lit("g").alias("g"),
        F.col("id").cast("double").alias("x"),
        F.col("id").cast("double").alias("y"),
    )
    with pytest.raises(ValueError, match="pre-sample"):
        timeseries.theilsen_by_group(df, ["g"], "x", "y")


def test_seasonal_decompose_short_group_keeps_all_rows(spark):
    """ADVICE r10: a group shorter than ~2×period has phases that only
    occur on edge rows; those rows must SURFACE with NULL seasonal and
    resid (left join), not silently drop."""
    rows = [("g", f"2024-01-{d:02d}", (100 + d) * 100) for d in range(1, 9)]
    df = spark.createDataFrame(rows, ["g", "day", "cents"])
    out = timeseries.seasonal_decompose(df, ["g"], "day", "cents", period=7)
    got = out.orderBy("day").collect()
    assert len(got) == 8  # every input row present
    # interior rows (4th and 5th of 8) have a full MA window → their
    # phases (3, 4) are the only fitted ones
    fitted = {r.day for r in got if r.seasonal is not None}
    assert fitted == {"2024-01-04", "2024-01-05"}
    for r in got:
        if r.seasonal is None:
            assert r.resid is None


# --------------------------- PNG perceptual-hash near-dup family (r11)


import pathlib
import struct
import zlib

from parcialbigdata_spark.operators import phash

_PHASH_DIR = pathlib.Path(__file__).resolve().parent / "fixtures" / "phash"


def _png_encode(width, height, color_type, pix, level=0, filter_fn=None):
    """Test-side PNG writer with arbitrary zlib level and per-row
    filter type — used to re-encode the SAME pixels many ways."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    rows = [
        bytes(b for x in range(width) for b in pix(x, y)) for y in range(height)
    ]
    raw = bytearray()
    prev = bytes(width * nch)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    for y, line in enumerate(rows):
        ft = filter_fn(y) if filter_fn else 0
        raw.append(ft)
        for i, v in enumerate(line):
            left = line[i - nch] if i >= nch else 0
            up = prev[i]
            ul = prev[i - nch] if i >= nch else 0
            if ft == 0:
                raw.append(v)
            elif ft == 1:
                raw.append((v - left) & 0xFF)
            elif ft == 2:
                raw.append((v - up) & 0xFF)
            elif ft == 3:
                raw.append((v - ((left + up) >> 1)) & 0xFF)
            elif ft == 4:
                raw.append((v - paeth(left, up, ul)) & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    idat = zlib.compress(bytes(raw), level)
    return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def test_dhash_invariant_under_reencoding():
    """The general decode path (compressed stream, every nontrivial
    PNG filter) must hash identically to the stored filter-0 fixture
    encoding — this is what licenses the SQL oracle to replay only the
    stored-block form."""
    def pix(x, y):
        return ((x * 7) % 256, (x * 5 + y * 3) % 256, (y * 9) % 256)

    base = phash.dhash_bands(_png_encode(36, 24, 2, pix, level=0))
    assert base is not None
    for ft in (1, 2, 3, 4):
        variant = _png_encode(36, 24, 2, pix, level=9, filter_fn=lambda y: ft)
        assert phash.dhash_bands(variant) == base, f"filter {ft}"
    mixed = _png_encode(36, 24, 2, pix, level=6, filter_fn=lambda y: y % 5)
    assert phash.dhash_bands(mixed) == base


def test_dhash_guards():
    # sub-grid image → None; garbage bytes → None
    tiny = _png_encode(6, 6, 0, lambda x, y: ((x * y) % 256,))
    assert phash.dhash_bands(tiny) is None
    assert phash.dhash_bands(b"not a png at all") is None


def test_dhash_near_dups_matches_bruteforce(spark):
    """Recall attestation: banded candidates + Hamming verify must
    equal the exhaustive all-pairs scan over the committed fixtures
    (pigeonhole-complete at Hamming ≤ 3 with four 16-bit bands)."""
    from parcialbigdata_spark.sources.binary import read_binary_dir

    raw = read_binary_dir(spark, str(_PHASH_DIR), glob="*.png")
    hashes = phash.png_dhash(raw)
    rows = hashes.collect()
    brute = set()
    for i in range(len(rows)):
        for j in range(len(rows)):
            a, b = rows[i], rows[j]
            if a.file_name >= b.file_name:
                continue
            ham = sum(
                bin(getattr(a, f"b{k}") ^ getattr(b, f"b{k}")).count("1")
                for k in range(4)
            )
            if ham <= 3:
                brute.add((a.file_name, b.file_name, ham))
    got = {
        (r.file_a, r.file_b, r.hamming)
        for r in phash.dhash_near_dups(hashes, max_hamming=3).collect()
    }
    assert got == brute
    # the planted pairs are found, and nothing else
    assert {(a, b) for a, b, _ in got} == {
        ("checker_b.png", "checker_b_dup.png"),
        ("grad_a.png", "grad_a_dup.png"),
    }


def test_dhash_near_dups_plan_is_banded_not_allpairs(spark):
    from parcialbigdata_spark.sources.binary import read_binary_dir

    raw = read_binary_dir(spark, str(_PHASH_DIR), glob="*.png")
    out = phash.dhash_near_dups(phash.png_dhash(raw))
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dhash_near_dups_rejects_incomplete_threshold(spark):
    from parcialbigdata_spark.sources.binary import read_binary_dir

    raw = read_binary_dir(spark, str(_PHASH_DIR), glob="*.png")
    hashes = phash.png_dhash(raw)
    with pytest.raises(ValueError, match="pigeonhole"):
        phash.dhash_near_dups(hashes, max_hamming=5)


def test_png_dhash_drops_subgrid_fixture(spark):
    from parcialbigdata_spark.sources.binary import read_binary_dir

    raw = read_binary_dir(spark, str(_PHASH_DIR), glob="*.png")
    names = {r.file_name for r in phash.png_dhash(raw).collect()}
    assert "tiny_e.png" not in names
    assert len(names) == 6
