"""Bucketed / partitioned warehouse layout helpers (100 TB design).

At fact scale the dominant cost of the star joins (orders ⋈ lineitem ⋈
customer) is the shuffle. Spark's bucketing removes it: both sides
written bucketed by the join key into the session catalog join with
ZERO exchanges (bucket-local SortMergeJoin). These helpers encode that
layout so the repartition/bucket strategy is code, not tribal
knowledge:

- ``write_bucketed``: save a DataFrame as a bucketed, sorted catalog
  table (bucket count sized by target data volume).
- ``write_partitioned``: hive-style date/category partitioning for
  pruning (the pipeline's CSV sink uses the same idea).
- ``bucket_join_ready``: quick check that two catalog tables share a
  bucket spec on the join key.

Bucketing requires the table to live in the session catalog
(``saveAsTable``) — plain ``parquet(path)`` files cannot carry the
bucket metadata. Verified by ``tests/test_warehouse.py``: the bucketed
join plan contains no Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Save as a bucketed (and bucket-sorted) catalog table.

    Size ``num_buckets`` so each bucket lands in the 128 MB-1 GB range
    at the target volume; both join sides must use the SAME count for
    an exchange-free join. ``path`` makes it an external table (data at
    an explicit location instead of the warehouse dir)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet for partition pruning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def swap_staged_table(spark: SparkSession, table: str) -> None:
    """Crash-recoverable catalog swap of a staged ``<table>__compact``
    into ``<table>`` (r11, VERDICT #3: the r10 compactors ran
    ``DROP TABLE`` then ``RENAME`` — between the two statements the
    live index did not exist, and a crash there left only the staged
    table, failing every probe until manual repair).

    Protocol (every step is a single catalog statement):

    1. ``RENAME <table> TO <table>__old``   (live table parked aside)
    2. ``RENAME <table>__compact TO <table>``  (staged table goes live)
    3. ``DROP <table>__old``                (cleanup)

    A crash between any two steps leaves a state
    :func:`recover_staged_swap` can resolve unambiguously, because the
    stage is only parked aside (step 1) AFTER its write completed — so
    whenever ``__old`` exists, ``__compact`` is known-complete and
    recovery can roll FORWARD. Call recovery before probing (or at
    compactor startup); it is a no-op in the steady state.

    Concurrency contract: compaction snapshots the table, so appends
    landing between the snapshot and the swap are LOST with any
    swap mechanism at this catalog's isolation level — run compaction
    in an exclusive maintenance window (streams stopped), exactly like
    a state-store checkpoint compaction."""
    spark.sql(f"ALTER TABLE {table} RENAME TO {table}__old")
    spark.sql(f"ALTER TABLE {table}__compact RENAME TO {table}")
    spark.sql(f"DROP TABLE {table}__old")


# recover_staged_swap(once=True) memo: (applicationId, table) pairs whose
# recovery already ran this session. Probes pass once=True so recovery is a
# STARTUP action, not a per-micro-batch one — per-batch recovery would race
# a concurrently running compactor (its staged ``__compact`` table looks
# exactly like a crashed stage and the 'dropped_stage' branch would delete
# it mid-write). With once=True the probe only ever repairs state left from
# BEFORE this session, which cannot belong to a live compactor.
_RECOVERED: set = set()


def reset_swap_recovery_memo(table: str | None = None) -> None:
    """Forget that recovery ran for ``table`` (or for everything) —
    equivalent to a session restart for the ``once=True`` contract.
    Tests that simulate a crash mid-session call this so the next
    probe behaves like the first probe of a new session."""
    if table is None:
        _RECOVERED.clear()
    else:
        for key in [k for k in _RECOVERED if k[1] == table]:
            _RECOVERED.discard(key)


def recover_staged_swap(spark: SparkSession, table: str, once: bool = False) -> str:
    """Resolve any state an interrupted :func:`swap_staged_table` (or
    the staging write before it) can leave, returning what was done.

    ``once=True`` memoizes per (application, table): after the first
    call this session the function returns ``"cached_noop"`` without
    touching the catalog. Long-running probes use this so recovery is
    a startup check (one catalog listing per table per session), not a
    per-batch cost — and so it can never race a compactor that is
    legitimately staging ``__compact`` concurrently (ADVICE r11).
    A compactor that itself crashed mid-swap is repaired by the NEXT
    session's first probe, or by calling this directly at compactor
    startup.

    Decision table (t = live, c = ``__old`` / ``__compact``):

    - t exists, ``__old`` exists      → swap finished, cleanup missed:
      drop ``__old``                                  ("dropped_old")
    - t exists, only ``__compact``    → stage completed (or partially
      wrote) but the swap never started: drop the stage and let the
      next compaction re-run — a partial stage is indistinguishable
      from a complete one here, so re-staging is the safe branch
                                                    ("dropped_stage")
    - t missing, ``__old`` + ``__compact`` → crashed between the two
      renames; ``__old``'s existence proves the stage write completed,
      so roll FORWARD: rename ``__compact`` to t, drop ``__old``
                                                  ("rolled_forward")
    - t missing, only ``__old``       → forward recovery itself was
      interrupted after its rename (t would exist) cannot reach here;
      defensively roll BACK: rename ``__old`` to t ("rolled_back")
    - t exists, nothing else          → steady state     ("noop")
    """
    key = (spark.sparkContext.applicationId, table)
    if once and key in _RECOVERED:
        return "cached_noop"

    # Direct catalog lookups (a single `SHOW TABLES LIKE` listing was
    # A/B-measured SLOWER than three tableExists calls — it runs a full
    # SQL parse/execute/collect; see tools/ab_swap_r12.py). The memo
    # above is what removes the per-batch cost, not the lookup shape.
    cat = spark.catalog
    live = cat.tableExists(table)
    old = cat.tableExists(f"{table}__old")
    stage = cat.tableExists(f"{table}__compact")
    if live and old:
        # __compact, if also present, was already renamed to t by a
        # finished swap — any remaining __compact is a NEWER stage;
        # leave it for its own swap.
        spark.sql(f"DROP TABLE {table}__old")
        action = "dropped_old"
    elif live and stage:
        spark.sql(f"DROP TABLE {table}__compact")
        action = "dropped_stage"
    elif not live and old and stage:
        spark.sql(f"ALTER TABLE {table}__compact RENAME TO {table}")
        spark.sql(f"DROP TABLE {table}__old")
        action = "rolled_forward"
    elif not live and old:
        spark.sql(f"ALTER TABLE {table}__old RENAME TO {table}")
        action = "rolled_back"
    else:
        action = "noop"
    if once:  # memoize only after the repair completed
        _RECOVERED.add(key)
    return action


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, sorted parquet layout for min/max data skipping.

    ``repartitionByRange`` gives each output file a DISJOINT range of
    ``sort_cols`` and ``sortWithinPartitions`` orders rows inside, so
    every parquet row group carries tight min/max statistics. A later
    scan with a predicate on the leading sort column prunes whole files
    and row groups (footer-only reads) — the single-column analog of
    Z-ordering, and the right layout for the one column a table is
    overwhelmingly filtered by (ship date, event time). At 100 TB the
    range exchange is one extra shuffle at write time that every
    subsequent time-filtered scan amortizes."""
    cols = [df[c] for c in sort_cols]
    part = df.repartitionByRange(num_files, *cols) if num_files else df.repartitionByRange(*cols)
    part.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def zorder_key(cols: "list[str]", bounds: "dict[str, tuple[float, float]]", bits: int = 16):
    """Morton (Z-order) key over numeric columns: each column is
    min/max-quantized to ``bits`` levels and the bit planes are
    interleaved into one bigint. Rows close in the key are close in
    EVERY listed column, so range-partitioning by the key gives parquet
    files tight min/max stats on all of them simultaneously — the
    multi-column generalization of :func:`write_sorted`'s single-column
    layout (same idea as Delta/Iceberg Z-ordering).

    ``bounds`` maps column → (min, max), typically from one tiny
    aggregate over the input (see :func:`write_zordered`). Degenerate
    columns (min == max) quantize to 0 everywhere and contribute
    nothing, which is correct. Pure codegen arithmetic — no UDF.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed bigint")
    levels = (1 << bits) - 1
    qs = []
    for c in cols:
        lo, hi = bounds[c]
        span = (hi - lo) or 1.0
        scaled = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(float(span))
        q = F.floor(
            F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0)) * F.lit(levels)
        ).cast("bigint")
        qs.append(q)
    z = F.lit(0).cast("bigint")
    for j in range(bits):
        for i, q in enumerate(qs):
            bit = F.shiftright(q, j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, j * n + i)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: "list[str]",
    num_files: int | None = None,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-ordered parquet layout: range-partition + sort by the Morton
    key of ``zorder_cols`` so selective predicates on ANY of those
    columns skip files/row groups via footer stats — where
    :func:`write_sorted` only serves its leading column.

    Column bounds come from one small aggregate over the input (a
    second scan at write time; at 100 TB both scans are the write
    job's own I/O and every later multi-dimension-filtered read
    amortizes them). The key is dropped before writing — the layout is
    invisible to readers."""
    from pyspark.sql import functions as F

    agg = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in zorder_cols],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in zorder_cols],
    ).first()
    bounds = {c: (agg[f"__lo_{c}"], agg[f"__hi_{c}"]) for c in zorder_cols}
    # Empty input or an all-NULL z-order column yields None bounds;
    # zorder_key would then die with an opaque TypeError (ADVICE r3).
    degenerate = [c for c, (lo, hi) in bounds.items() if lo is None or hi is None]
    if degenerate:
        raise ValueError(
            f"write_zordered: column(s) {degenerate} have no usable bounds "
            "(empty input or all-NULL values) - z-ordering needs at least "
            "one non-null value per z-order column"
        )
    withz = df.withColumn("__z", zorder_key(zorder_cols, bounds, bits=bits))
    part = (
        withz.repartitionByRange(num_files, "__z")
        if num_files
        else withz.repartitionByRange("__z")
    )
    part.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


def bucket_join_ready(spark: SparkSession, table_a: str, table_b: str, key: str) -> bool:
    """True when both catalog tables are bucketed on ``key`` with equal
    bucket counts (the precondition for an exchange-free join)."""

    def spec(table: str) -> tuple[int, str] | None:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        info = {r.col_name: (r.data_type or "") for r in rows}
        n = info.get("Num Buckets")
        cols = info.get("Bucket Columns", "")
        return (int(n), cols) if n else None

    a, b = spec(table_a), spec(table_b)
    return a is not None and a == b and f"`{key}`" in a[1]


def merge_upsert(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
    delete_col: str | None = None,
) -> None:
    """MERGE INTO for a hive-partitioned parquet dataset: upsert (and
    optionally delete) ``updates`` rows into ``base_path``, rewriting
    ONLY the partitions the updates touch.

    The write side of every incremental-ingest pipeline without a table
    format: (1) the updates' distinct partition values — a
    catalog-sized list, the one legitimately driver-sized collect —
    select the affected base partitions (pushed-down ``isin`` filter →
    partition pruning, so 100 TB of untouched partitions are never
    read); (2) affected base rows full-outer-merge with updates on the
    key (updates win; ``delete_col`` = true drops the key); (3) dynamic
    partition overwrite replaces exactly the partition directories
    present in the merged output, leaving every other directory's files
    byte-untouched (asserted in ``tests/test_warehouse.py``). New
    partitions appearing only in ``updates`` are created by the same
    write. One shuffle (the merge join) over affected-partition data
    only; update-heavy skew is AQE's problem, not a plan change.

    Assumes the partition values of a key are stable (date-partitioned
    facts, the standard upsert case) — a key that MOVES partitions
    needs a table format with a global index, not path-level merge."""
    from pyspark.sql import functions as F

    # Partition columns as verbatim directory strings on BOTH sides:
    # type inference would e.g. parse dt=2024-01-01 as DATE and make the
    # pruning filter (and the rewrite's directory names) type-sensitive.
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev_infer = spark.conf.get(infer_key, "true")
    spark.conf.set(infer_key, "false")
    try:
        base = spark.read.parquet(base_path)
        base.schema  # force analysis while inference is off
    finally:
        spark.conf.set(infer_key, prev_infer)
    data_cols = [c for c in base.columns if c not in key_cols]
    upd = updates
    for c in partition_cols:
        upd = upd.withColumn(c, F.col(c).cast("string"))
    touched = [tuple(r) for r in upd.select(*partition_cols).distinct().collect()]
    part_filter = F.struct(*[F.col(c) for c in partition_cols]).isin(
        [F.struct(*[F.lit(v) for v in t]) for t in touched]
    )
    affected = base.filter(part_filter)
    if delete_col is None:
        delete_flag = F.lit(False)
    else:
        delete_flag = F.coalesce(F.col(f"u.{delete_col}"), F.lit(False))
        data_cols = [c for c in data_cols if c != delete_col]
    b, u = affected.alias("b"), upd.alias("u")
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(f"b.{k}") == F.col(f"u.{k}"))
    has_update = F.col(f"u.{key_cols[0]}").isNotNull()
    merged = (
        b.join(u, cond, "full")
        .filter(~delete_flag)
        .select(
            *[
                F.coalesce(F.col(f"u.{k}"), F.col(f"b.{k}")).alias(k)
                for k in key_cols
            ],
            *[
                F.when(has_update, F.col(f"u.{c}"))
                .otherwise(F.col(f"b.{c}"))
                .alias(c)
                for c in data_cols
            ],
        )
    )

    # Dynamic overwrite only replaces partitions PRESENT in the output:
    # a touched partition whose rows were all deleted is absent from
    # `merged` and its stale directory would survive. Identify those
    # BEFORE the write (the lazy plan reads the pre-write files) and
    # clear them through the Hadoop FS API (works on any storage).
    surviving = {
        tuple(r) for r in merged.select(*partition_cols).distinct().collect()
    }
    emptied = [t for t in touched if t not in surviving]

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(*partition_cols).parquet(base_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    if emptied:
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for t in emptied:
            rel = "/".join(f"{c}={v}" for c, v in zip(partition_cols, t))
            p = jvm.org.apache.hadoop.fs.Path(f"{base_path}/{rel}")
            fs = p.getFileSystem(hconf)
            if fs.exists(p):
                fs.delete(p, True)


def write_training_shards(
    df: DataFrame,
    path: str,
    order_key: str,
    num_shards: int = 8,
    fmt: str = "json",
    mode: str = "overwrite",
) -> None:
    """Write a deterministically shuffled training-shard layout: one
    file per shard, rows ordered by ``order_key`` inside each shard.

    This is the sink half of the ``shuffle_order_documents`` contract:
    the order key is a salted hash of the id (NOT ``rand()``), so the
    epoch order every reader sees is identical across runs, engines,
    and cluster sizes. The shard is the hash prefix modulo
    ``num_shards`` (the same formula as the ``shuffle_order_documents``
    query), the write is ``repartition(shard)`` +
    ``sortWithinPartitions(order_key)`` + ``partitionBy(shard)`` — one
    shuffle, no global sort. ``partitionBy`` (not the repartition alone)
    is what guarantees exactly one sorted file per shard directory:
    hash collisions may co-locate two shards in one task, but the
    writer then splits them into their own directories preserving
    in-task order. At 100 TB shard files are independent, the write
    parallelizes across executors, and a training job maps one reader
    per shard directory. ``json`` (= JSONL, the common LLM-corpus
    interchange format) or ``parquet``."""
    from pyspark.sql import functions as F

    shard = (
        F.conv(F.substring(F.col(order_key), 1, 4), 16, 10).cast("bigint") % num_shards
    )
    (
        df.withColumn("shard", shard)
        .repartition(num_shards, "shard")
        # Leading with the partition column matters: the parquet/json
        # FileFormatWriter requires task rows sorted by partition cols
        # and would inject its OWN (order-destroying) sort if the
        # existing ordering didn't already start with `shard`.
        .sortWithinPartitions("shard", order_key)
        .write.mode(mode)
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )


def plan_compaction_bins(
    files: DataFrame,
    part_cols: "list[str]",
    size_col: str,
    id_col: str,
    target_bytes: int,
) -> DataFrame:
    """Bin-packing PLAN for small-file compaction: assign each file in
    a manifest relation (one row per file, ``size_col`` bytes,
    ``id_col`` unique within the partition) to an output bin of
    ~``target_bytes`` — the metadata-side half of
    :func:`compact_small_files` (which executes a coalesce rewrite
    without choosing groupings) and what Delta/Iceberg ``OPTIMIZE``
    computes from the table manifest before launching rewrite tasks.

    Algorithm: next-fit-decreasing — within each partition, files
    ordered by (size desc, id), bin = running-sum-before-this-file
    ``div`` target. Deterministic (the tie-break is total), single
    window pass, and NFD's guarantee fits compaction exactly: every
    bin except possibly the last per partition holds >= target bytes
    BEFORE its last file lands, so no two adjacent bins could merge —
    the planned file count is within 2x of optimal (classical NFD
    bound) while never splitting a file.

    Scale: the input is the MANIFEST, not the data — millions of rows
    for a 100 TB lake, not billions. The window partitions by the
    table's partition columns (compaction never merges across hive
    partitions, it would break pruning), so planning parallelizes per
    partition with one metadata-sized shuffle; the plan relation then
    drives rewrite tasks (one per bin) that read only their own files.
    Returns ``files`` + a ``bin`` column. Precondition: ``size_col``
    is non-negative (file sizes are; a negative value would break the
    running sum's monotonicity and the NFD bound silently)."""
    w = Window.partitionBy(*part_cols).orderBy(
        F.col(size_col).desc(), F.col(id_col)
    )
    cum_before = F.coalesce(
        F.sum(size_col).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - F.col(size_col),
        F.lit(0),
    )
    return (
        files.withColumn("__cum_before", cum_before.cast("bigint"))
        # `div` (exact bigint division) — a double `/` + cast would
        # round above 2^53 bytes of cumulative partition size.
        .withColumn("bin", F.expr(f"__cum_before div {int(target_bytes)}"))
        .drop("__cum_before")
    )


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_files: int,
    partition_cols: "list[str] | None" = None,
) -> dict:
    """Small-file compaction — the unglamorous job that keeps a 100 TB
    lake readable: streaming appends and fine-grained upserts leave
    thousands of KB-sized parquet files whose per-file open/footer cost
    dominates scans.  Rewrites ``path`` to ``target_files`` files (per
    partition when ``partition_cols`` is given, preserving the
    hive layout and its pruning) via an atomic
    write-to-sibling-then-swap, and returns
    ``{"files_before": .., "files_after": ..}``.

    Unpartitioned data merges with ``coalesce`` (no shuffle — compaction
    only ever reduces file count); the hive-partitioned path
    repartitions on the partition columns so each directory gets
    its own consolidated files (~1 file per partition VALUE — hash
    partitioning cannot split one value's rows across ``target_files``
    tasks, so ``target_files`` is a ceiling on parallelism there, not a
    per-directory file count). Use the sorted/z-ordered writers instead
    when the goal is clustering, not file count.

    Crash safety: the swap is write-sibling → verify → rename-away →
    rename-in → delete-old.  A leftover ``__compacting`` /
    ``__precompact`` sibling from a previous crashed run fails fast
    (the old data is still intact at ``path`` or, after the first
    rename, recoverable from ``__precompact`` — never silently
    clobbered), and the freshly written copy is row-counted against the
    source BEFORE the original leaves ``path``, so a torn write can't
    replace good data."""
    import glob
    import os
    import shutil

    def _count(p: str) -> int:
        return len(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True))

    tmp = path.rstrip("/") + "__compacting"
    old = path.rstrip("/") + "__precompact"
    for leftover in (tmp, old):
        if os.path.exists(leftover):
            raise RuntimeError(
                f"compact_small_files: leftover {leftover} from a previous "
                "crashed run — recover (rename __precompact back or delete "
                "the partial __compacting) before re-running"
            )
    before = _count(path)
    df = spark.read.parquet(path)
    rows_before = df.count()
    writer = df.coalesce(target_files).write.mode("overwrite")
    if partition_cols:
        writer = df.repartition(target_files, *partition_cols).write.mode(
            "overwrite"
        ).partitionBy(*partition_cols)
    writer.parquet(tmp)
    # Verify the new copy while the original is still live at `path`.
    rows_after = spark.read.parquet(tmp).count()
    if rows_after != rows_before or _count(tmp) == 0:
        raise RuntimeError(
            f"compact_small_files: compacted copy at {tmp} has "
            f"{rows_after} rows vs {rows_before} in the source — "
            "leaving the original untouched"
        )
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {"files_before": before, "files_after": _count(path)}
