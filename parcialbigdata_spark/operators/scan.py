"""Distributed prefix aggregation (global running sums without a
single-reducer window).

``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY forces Spark to plan
``Exchange SinglePartition`` — every row of the table funnels through
ONE task, the classic 100 TB cliff (the per-customer windows elsewhere
in this repo are fine because they partition; this module is for the
genuinely GLOBAL scan: ECDFs, global ranks, cumulative totals).

Two-phase scan (Blelloch 1990, the textbook parallel prefix-sum,
re-expressed in DataFrame ops):

1. **Local pass** — an explicit range-bucket column (assigned
   row-locally from sampled quantile boundaries of the leading order
   column) splits the total order into P contiguous buckets; ONE
   ``repartition`` on the bucket id clusters each bucket, and the
   per-bucket running-sum window plus the per-bucket totals
   aggregation both reuse that exchange (their required clustering is
   exactly the repartition key) — P parallel tasks, no single reducer,
   ONE data-sized shuffle. (The r7 design reached the same
   parallelism via ``repartitionByRange`` + a window on
   ``spark_partition_id()``, but Catalyst cannot know the pid column
   is partition-local, so the window re-shuffled the whole relation a
   SECOND time — the explicit bucket column is how the plan proves
   its own clustering.)
2. **Offset pass** — per-bucket totals form a ≤P-row relation
   (bounded by the cluster's partition count, NOT by data volume); an
   exclusive prefix sum over it — the only single-partition window, on
   P rows — yields each bucket's starting offset, broadcast-joined
   back. ``global running sum = local running sum + offset``.

Bucket boundaries come from one ``percentile_approx`` probe job over
the leading order column (a pushed single-column scan — the same
sampling pass ``repartitionByRange``'s RangePartitioner runs
internally, made explicit). Correctness NEVER depends on boundary
quality: any monotone bucket assignment yields the exact answer
(skewed boundaries only cost parallelism), ties of the leading column
share a bucket, and NULLs land in the bucket matching their sort
position (first for ascending, last for descending). Non-numeric
leading order columns (no percentile support) fall back to the r7
``repartitionByRange`` + pid-window path, which is correct but pays
the second data-sized exchange.

Result is partition- and boundary-invariant: offsets add exactly what
an unpartitioned scan would have accumulated, so the oracle can verify
with a plain ``SUM() OVER (ORDER BY ...)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket_column(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int,
    descending: bool,
    boundaries: list | None = None,
) -> tuple[Column, int] | None:
    """Row-local range-bucket id over the total ``order_cols`` order
    (bucket i's rows all precede bucket i+1's) plus the bucket COUNT
    (ids are dense in ``[0, n_buckets)``, so callers can enumerate all
    possible ids driver-side with ``spark.range`` instead of a
    data-sized ``distinct``), or ``None`` when the leading order
    column's type has no percentile support. Boundaries are quantiles
    of the leading column only — ties share a bucket, which preserves
    the ordering invariant for any tie-break columns; duplicate
    boundaries (heavy ties) just leave some buckets empty.

    ``boundaries`` (driver-side values of the leading column's type)
    skips the probe job entirely — callers that KNOW their order
    column's range (e.g. rank positions uniform in [1, N]) pass
    explicit splits, which matters when the input is an expensive
    pipeline the probe would otherwise re-execute."""
    first = order_cols[0]
    if boundaries is None:
        # Explicit dtype gate (r9, was a bare except): percentile_approx
        # supports exactly the numeric families below. Any OTHER
        # failure of the probe job (executor loss, corrupt input, OOM)
        # is a real runtime error and must propagate — silently routing
        # it into the double-shuffle fallback would mask data problems
        # and mislabel them as "non-numeric order column".
        # Resolve case-insensitively, like Spark's analyzer does — a
        # caller passing "O_ORDERKEY" previously fell through the gate
        # to the fallback path / carry raise (ADVICE r9).
        dtype = {c.lower(): t for c, t in df.dtypes}.get(first.lower(), "")
        if not dtype.startswith(
            ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")
        ):
            return None
        qs = [i / num_partitions for i in range(1, num_partitions)]
        row = df.agg(
            F.percentile_approx(F.col(first), F.array(*[F.lit(q) for q in qs]))
        ).first()
        boundaries = row[0] if row is not None else None
    uniq = sorted({b for b in (boundaries or []) if b is not None})
    # asc rank = #boundaries strictly below the value; NULL comparisons
    # yield 0, i.e. the first ascending bucket (asc_nulls_first) and,
    # via the descending flip below, the last descending bucket
    # (desc_nulls_last) — matching the sort-order null placement.
    asc = F.lit(0)
    for b in uniq:
        asc = asc + F.when(F.col(first) > F.lit(b), 1).otherwise(0)
    return ((F.lit(len(uniq)) - asc) if descending else asc), len(uniq) + 1


def partitioned_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_cols: dict[str, str],
    num_partitions: int = 32,
    group_cols: list[str] | None = None,
    boundaries: list | None = None,
) -> DataFrame:
    """Running sums of each ``value_cols`` key (aliased to its value)
    in ``order_cols`` order, two-phase — no single-partition window
    over the data and (numeric leading order column) ONE data-sized
    shuffle. ``order_cols`` must be a total order (add a tie-break
    column if not); output keeps all input columns and appends the
    cumulative ones.

    ``group_cols`` restarts the scan per group WITHOUT hashing each
    group onto one reducer (a plain ``PARTITION BY group`` window
    sends 90% of the table through one task when one group is 90% of
    it): the shuffle keys on (group, bucket), so a huge group spans
    MANY buckets, and the offset relation grows only to
    ≤ groups × buckets rows."""
    group_cols = group_cols or []
    bucketed = _bucket_column(
        df, order_cols, num_partitions, descending=False, boundaries=boundaries
    )
    if bucketed is None:
        return _cumsum_ranged_fallback(
            df, order_cols, value_cols, num_partitions, group_cols
        )
    bkt, _ = bucketed
    # Persist + EAGER materialization: an already-built cache retains
    # the repartition's HashPartitioning (an unbuilt one reports
    # unknown partitioning under AQE and every consumer re-shuffles —
    # measured, tests pin it), so the window below and the totals agg
    # read the one materialized shuffle with NO further exchange, and
    # the cache also cuts the upstream lineage out of both branches.
    ranged = (
        df.withColumn("__pid", bkt)
        .repartition(num_partitions, *[F.col(c) for c in [*group_cols, "__pid"]])
        .persist()
    )
    ranged.count()
    w_local = (
        Window.partitionBy(*group_cols, "__pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged
    for src, out in value_cols.items():
        local = local.withColumn(out, F.sum(src).over(w_local))

    # Same clustering as the materialized repartition — no second
    # exchange.
    totals = ranged.groupBy(*group_cols, "__pid").agg(
        *[F.sum(src).alias(f"__tot_{out}") for src, out in value_cols.items()]
    )
    # Exclusive prefix over the ≤ groups×buckets-row totals
    # relation: the only window whose input is cluster-sized (and,
    # grouped, it parallelizes across groups), not data-sized.
    w_off = Window.partitionBy(*group_cols).orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = totals.select(
        *group_cols,
        "__pid",
        *[
            F.sum(f"__tot_{out}").over(w_off).alias(f"__off_{out}")
            for out in value_cols.values()
        ],
    )
    out_df = local.join(F.broadcast(offs), [*group_cols, "__pid"])
    return _merge_offsets(out_df, value_cols)


def _merge_offsets(out_df: DataFrame, value_cols: dict[str, str]) -> DataFrame:
    # SQL running-sum NULL semantics: SUM() OVER an all-NULL (or
    # empty) prefix is NULL, and the first non-NULL value starts the
    # sum. The per-bucket offset is therefore NOT coalesced to 0 —
    # a row whose local prefix is all-NULL must inherit the carry from
    # earlier buckets (off), a row in the first buckets with no
    # earlier non-NULL keeps its local value, and only when BOTH are
    # NULL is the result NULL. coalesce(local+off, local, off) encodes
    # exactly that case split in one expression.
    for out in value_cols.values():
        out_df = out_df.withColumn(
            out,
            F.coalesce(
                F.col(out) + F.col(f"__off_{out}"), F.col(out), F.col(f"__off_{out}")
            ),
        )
    return out_df.drop("__pid", *[f"__off_{out}" for out in value_cols.values()])


def _cumsum_ranged_fallback(
    df: DataFrame,
    order_cols: list[str],
    value_cols: dict[str, str],
    num_partitions: int,
    group_cols: list[str],
) -> DataFrame:
    """r7 path for non-numeric leading order columns:
    ``repartitionByRange`` + a window on ``spark_partition_id()``.
    Correct, but the window re-shuffles on the opaque pid column — two
    data-sized exchanges. The input is persisted so both passes
    observe the SAME pid assignment (range boundaries come from a
    sample; re-execution could legally re-draw them)."""
    ranged = (
        df.repartitionByRange(
            num_partitions, *[F.col(c) for c in [*group_cols, *order_cols]]
        )
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    w_local = (
        Window.partitionBy(*group_cols, "__pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged
    for src, out in value_cols.items():
        local = local.withColumn(out, F.sum(src).over(w_local))
    totals = ranged.groupBy(*group_cols, "__pid").agg(
        *[F.sum(src).alias(f"__tot_{out}") for src, out in value_cols.items()]
    )
    w_off = Window.partitionBy(*group_cols).orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = totals.select(
        *group_cols,
        "__pid",
        *[
            F.sum(f"__tot_{out}").over(w_off).alias(f"__off_{out}")
            for out in value_cols.values()
        ],
    )
    out_df = local.join(F.broadcast(offs), [*group_cols, "__pid"])
    return _merge_offsets(out_df, value_cols)


def partitioned_carry(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str,
    descending: bool = False,
    num_partitions: int = 32,
    boundaries: list | None = None,
) -> DataFrame:
    """Global last-non-null carry (LOCF) in ``order_cols`` order
    without a single-reducer window — the keyless distributed as-of.

    ``out_col`` = the most recent non-null ``value_col`` at or before
    each row in the global order (``descending=True`` reverses the
    order, which turns LOCF into next-observation-carried-backward).
    Same two-phase shape as :func:`partitioned_cumsum` (explicit
    range-bucket column, one data-sized shuffle that the local-carry
    window and the bucket-tail aggregation both reuse): a
    per-bucket ``last(ignorenulls)`` window does the local carry in
    parallel; each bucket's final non-null value forms a ≤P-row
    relation whose own (tiny) LOCF yields the carry entering each
    bucket, broadcast-joined back and coalesced.

    The keyed as-of (``operators/joins.as_of_join``) shuffles on the
    join key — many keys, natural parallelism. This handles the
    degenerate KEYLESS case (one global order: rank→value lookups,
    global step functions) where the keyed plan would hash everything
    to one reducer. The order columns must be numeric: bucket
    boundaries come from ``percentile_approx``, and with
    ``descending=True`` the bucket-tail reduction additionally negates
    them inside a struct max."""
    sort_exprs = [
        F.col(c).desc() if descending else F.col(c).asc() for c in order_cols
    ]
    bucketed = _bucket_column(df, order_cols, num_partitions, descending, boundaries)
    if bucketed is None:
        raise ValueError(
            f"partitioned_carry needs a numeric leading order column for "
            f"bucket boundaries; got {dict(df.dtypes).get(order_cols[0])!r}"
        )
    bkt, n_buckets = bucketed
    # Persist + eager materialization — same cache-partitioning
    # discipline as partitioned_cumsum (see there).
    ranged = (
        df.withColumn("__pid", bkt).repartition(num_partitions, "__pid").persist()
    )
    ranged.count()
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*sort_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__local", F.last(value_col, ignorenulls=True).over(w_local))
    # Last non-null raw value per bucket, by order position: max of
    # (order, value) structs over non-null rows only. Same clustering
    # as the repartition — no second exchange.
    tail_struct = F.struct(
        *[(-F.col(c)).alias(c) if descending else F.col(c).alias(c) for c in order_cols],
        F.col(value_col).alias("__v"),
    )
    totals = (
        ranged.filter(F.col(value_col).isNotNull())
        .groupBy("__pid")
        .agg(F.max(tail_struct).alias("__t"))
        .select("__pid", F.col("__t.__v").alias("__tail"))
    )
    # LOCF over the ≤P-row bucket-tail relation: the carry ENTERING
    # bucket p is the latest tail among buckets < p. Build it
    # over ALL bucket ids — a bucket with zero non-null rows has
    # no tail but still forwards its predecessors' carry. Bucket ids
    # are dense in [0, n_buckets) by construction, so the id relation
    # is a driver-side range (r9; the r8 version ran a data-sized
    # DISTINCT over the persisted input to enumerate the same ids).
    all_pids = ranged.sparkSession.range(n_buckets).select(
        F.col("id").cast("int").alias("__pid")
    )
    w_prev = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    entering = all_pids.join(totals, "__pid", "left").select(
        "__pid", F.last("__tail", ignorenulls=True).over(w_prev).alias("__enter")
    )
    out = local.join(F.broadcast(entering), "__pid", "left")
    return out.withColumn(out_col, F.coalesce("__local", "__enter")).drop(
        "__pid", "__local", "__enter"
    )


def ks_two_sample(
    df: DataFrame, value_col: str, group_col: str, group_a: str, group_b: str
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic, distributed.

    D = sup_x |F_a(x) − F_b(x)| over the two groups' empirical CDFs.
    The sup is attained at a sample point, so it suffices to evaluate
    both ECDFs at every DISTINCT value: one hash aggregation collapses
    the table to (value, cnt_a, cnt_b), :func:`partitioned_cumsum`
    turns counts into running counts WITHOUT a single-reducer window,
    and the gap is ranked exactly in integer arithmetic —
    ``|c_a·n_b − c_b·n_a|`` as DECIMAL(38,0) (no float ECDF
    subtraction, so ties rank identically on any engine; the single
    division happens once, on the winning row). Returns one row:
    ``(n_a, n_b, at_value, ks_d)`` with the sup location tie-broken to
    the smallest value.

    Nonparametric sibling of ``ab_lift_events`` (parametric Welch t on
    means) and ``drift_psi_orders`` (binned proportion drift): KS is
    exact, binning-free, and sensitive to ANY distribution difference,
    not just the mean — the standard gate for "did this feature drift"
    before retraining.
    """
    tagged = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(value_col).alias("v"),
        F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("ia"),
        F.when(F.col(group_col) == group_b, 1).otherwise(0).alias("ib"),
    )
    per_value = tagged.groupBy("v").agg(
        F.sum("ia").alias("ca"), F.sum("ib").alias("cb")
    )
    # Bucket boundaries probed on the RAW pre-agg rows (a pushed
    # single-column scan), not on per_value — letting the cumsum probe
    # itself would re-execute the distinct-value aggregation once.
    nq = 32
    vb = tagged.agg(
        F.percentile_approx(
            F.col("v"), F.array(*[F.lit(i / nq) for i in range(1, nq)])
        )
    ).first()[0]
    cum = partitioned_cumsum(
        per_value, ["v"], {"ca": "cum_a", "cb": "cum_b"}, boundaries=list(vb or [])
    )
    totals = tagged.agg(
        F.sum("ia").cast("bigint").alias("n_a"), F.sum("ib").cast("bigint").alias("n_b")
    )
    gap = cum.crossJoin(F.broadcast(totals)).withColumn(
        "num",
        F.abs(
            F.col("cum_a").cast("decimal(38,0)") * F.col("n_b")
            - F.col("cum_b").cast("decimal(38,0)") * F.col("n_a")
        ),
    )
    top = gap.orderBy(F.desc("num"), F.asc("v")).limit(1)
    return top.select(
        "n_a",
        "n_b",
        F.col("v").alias("at_value"),
        F.round(
            F.col("num").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            6,
        ).alias("ks_d"),
    )


def quantile_normalize(
    df: DataFrame,
    id_col: str,
    group_col: str,
    value_col: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Quantile normalization: map each group's value distribution
    onto the GLOBAL distribution (Bolstad et al. 2003 — the standard
    rank-based cross-batch alignment; in an LLM-data pipeline, the
    remediation once ``drift_psi_orders``-style audits show one
    source's length/score distribution skewing the mix).

    Each row's normalized value is the global order statistic at its
    within-group quantile: ``kpos = ceil((r − 0.5)·N / n_g)`` for
    within-group rank r (type-1 / inverse-ECDF definition — every
    output value OCCURS in the data; no interpolation, so results are
    exact and engine-portable). Built entirely from this module's
    scans — no data-sized single-reducer window anywhere:

    1. within-group ranks: grouped :func:`partitioned_cumsum` of ones
       (a huge group spans many range partitions);
    2. the global CDF: :func:`partitioned_cumsum` over per-value
       counts;
    3. the kpos→value order-statistic lookup (smallest value whose
       cumulative count ≥ kpos): a keyless merge of probes and CDF
       boundary rows via descending :func:`partitioned_carry`.

    Returns (id, group, value, qn) — ``qn`` aliased
    ``qn_<value_col>``.

    Job discipline (r9, the fixture-scale claw-back): ONE probe job
    (``percentile_approx`` + count over the raw value column) and ONE
    persisted row-level relation — bucketed by the value boundaries
    and clustered on (group, bucket) — feed EVERY pass: the
    within-group rank window and its bucket totals, the per-group
    counts, and the per-value counts behind the global CDF. The r8
    version composed three generic scan calls, which cost two extra
    eager persist jobs and re-scanned the input three more times
    (``n_grp``/``gcnt`` went back to the source); at 100 TB those
    re-scans are the dominant waste, at fixture scale the per-job
    fixed overhead is. The CDF's per-(bucket, value) counts are
    partial-aggregated from the cache on each use instead of persisted
    — distinct-value-sized, two cheap consumers. The carry's positions
    are ranks uniform in [1, N] by construction, so its splits are
    ``i·N/P`` — no second probe. Data-sized exchanges: the shared
    repartition and the carry's, nothing else."""
    vtype = dict(df.dtypes)[value_col]
    itype = dict(df.dtypes)[id_col]
    gtype = dict(df.dtypes)[group_col]

    qs = [i / num_partitions for i in range(1, num_partitions)]
    probe = df.agg(
        F.percentile_approx(F.col(value_col), F.array(*[F.lit(q) for q in qs])),
        F.count(F.lit(1)),
    ).first()
    vbounds = list(probe[0] or [])
    n_total = int(probe[1])
    pos_bounds = [
        max(1, (i * n_total) // num_partitions) for i in range(1, num_partitions)
    ]

    base = df.select(id_col, group_col, value_col)
    bkt, _ = _bucket_column(
        base, [value_col, id_col], num_partitions, descending=False, boundaries=vbounds
    )
    # The one shared materialization (see partitioned_cumsum for why
    # persist must be EAGER to pin the hash partitioning under AQE).
    ranged = (
        base.withColumn("__pid", bkt)
        .repartition(num_partitions, F.col(group_col), F.col("__pid"))
        .persist()
    )
    ranged.count()

    # Within-group ranks, two-phase: per-(group, bucket) running count
    # + exclusive per-group prefix of bucket totals (≤ groups×buckets
    # rows). Counts are never NULL, so the offset merge is a coalesce.
    w_local = (
        Window.partitionBy(group_col, "__pid")
        .orderBy(F.col(value_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__r", F.count(F.lit(1)).over(w_local))
    totals = ranged.groupBy(group_col, "__pid").agg(F.count(F.lit(1)).alias("__tot"))
    w_off = Window.partitionBy(group_col).orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # The group's TOTAL count rides the same window partitioning as
    # the exclusive prefix (full-range frame, chained WindowExec — no
    # extra exchange and no separate n_grp aggregation/join).
    w_all = Window.partitionBy(group_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = totals.select(
        group_col,
        "__pid",
        F.sum("__tot").over(w_off).alias("__off"),
        F.sum("__tot").over(w_all).alias("__n_grp"),
    )
    kpos = (
        local.join(F.broadcast(offs), [group_col, "__pid"])
        .withColumn(
            "__kpos",
            F.ceil(
                ((F.col("__r") + F.coalesce(F.col("__off"), F.lit(0))).cast("double")
                 - F.lit(0.5))
                * F.lit(n_total)
                / F.col("__n_grp")
            ).cast("bigint"),
        )
    )

    # Global CDF from the SAME cache: per-(bucket, value) counts (the
    # bucket id is a function of the value, so each distinct value
    # lives in exactly one bucket), local running sum within the
    # bucket, plus the exclusive prefix of per-bucket totals over the
    # ≤P-row bucket relation.
    gcnt = ranged.groupBy("__pid", value_col).agg(F.count(F.lit(1)).alias("__cnt"))
    w_gloc = (
        Window.partitionBy("__pid")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g_local = gcnt.withColumn("__cum", F.sum("__cnt").over(w_gloc))
    # Per-bucket totals re-aggregated from the RANK side's totals
    # (groups×buckets rows, and that agg reads the cache clustering
    # with no exchange) rather than from a second pass over gcnt.
    g_tot = totals.groupBy("__pid").agg(F.sum("__tot").alias("__gtot"))
    w_goff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    g_offs = g_tot.select("__pid", F.sum("__gtot").over(w_goff).alias("__goff"))
    gcum = g_local.join(F.broadcast(g_offs), "__pid").select(
        value_col,
        (F.col("__cum") + F.coalesce(F.col("__goff"), F.lit(0))).alias("__cum"),
    )

    probes = kpos.select(
        F.col("__kpos").alias("__pos"),
        F.lit(0).alias("__b"),
        F.lit(None).cast(vtype).alias("__gv"),
        F.col(id_col),
        F.col(group_col),
        F.col(value_col),
    )
    bounds = gcum.select(
        F.col("__cum").alias("__pos"),
        F.lit(1).alias("__b"),
        F.col(value_col).alias("__gv"),
        F.lit(None).cast(itype).alias(id_col),
        F.lit(None).cast(gtype).alias(group_col),
        F.lit(None).cast(vtype).alias(value_col),
    )
    # Descending (pos, b) order: at equal pos the boundary row (b=1)
    # precedes the probe, so the carried __gv at a probe is the
    # SMALLEST boundary with cum >= kpos — the type-1 order statistic.
    carried = partitioned_carry(
        probes.unionByName(bounds),
        ["__pos", "__b"],
        "__gv",
        "__qn",
        descending=True,
        num_partitions=num_partitions,
        boundaries=pos_bounds,
    )
    return carried.filter(F.col(id_col).isNotNull()).select(
        id_col, group_col, value_col, F.col("__qn").alias(f"qn_{value_col}")
    )
