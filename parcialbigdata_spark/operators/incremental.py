"""Incremental aggregate maintenance: algebraic partial states + merge.

The batch analog of the streaming partial-sketch stores
(``streaming/sketch_store.py``): an aggregate whose per-partition state
is ALGEBRAIC (count, sum, min, max — each mergeable by a binary op) can
be maintained incrementally: keep the aggregated state of the
already-processed data, aggregate only the newly-arrived delta, and
MERGE the two state relations — never re-scan processed facts. This is
the core of materialized-view maintenance (Gupta & Mumick, *Maintenance
of Materialized Views*, IEEE Data Eng. Bull. 1995) and of every
warehouse "incremental model": at 100 TB the nightly delta is GBs, so
the merge turns a full-table aggregation into a dim-sized join.

``agg_state`` computes the state relation; ``merge_agg_states`` merges
two of them (full outer on the group keys — a key may exist in only one
side). Both emit the same schema, so merge output can itself be merged
again (associativity), which is what makes backfill/compaction work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: state columns produced by :func:`agg_state`, keyed by suffix
_STATE_COLS = ("n", "sum_cents", "min_v", "max_v")


def agg_state(df: DataFrame, keys: list[str], val_col: str) -> DataFrame:
    """Per-key algebraic aggregate state over ``val_col``: row count,
    exact integer-cents sum (order-independent — see the module
    docstring of ``queries.py``), min and max."""
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("bigint")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("sum_cents"),
        F.min(val_col).alias("min_v"),
        F.max(val_col).alias("max_v"),
    )


def merge_agg_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two :func:`agg_state` relations: full outer join on the
    group keys, then the per-aggregate merge op (sum for count/sum,
    least/greatest for min/max — Spark's ``least``/``greatest`` skip
    NULLs, which is exactly the one-sided-key semantics needed). Both
    state relations are key-grained (one row per group), so the join is
    dim-sized regardless of fact volume; AQE broadcasts the delta side
    whenever it fits."""
    an = {c: F.col(f"__a_{c}") for c in _STATE_COLS}
    bn = {c: F.col(f"__b_{c}") for c in _STATE_COLS}
    aa = a.select(*keys, *[F.col(c).alias(f"__a_{c}") for c in _STATE_COLS])
    bb = b.select(*keys, *[F.col(c).alias(f"__b_{c}") for c in _STATE_COLS])
    cond = None
    for k in keys:
        eq = aa[k].eqNullSafe(bb[k])
        cond = eq if cond is None else (cond & eq)
    joined = aa.alias("a").join(bb.alias("b"), cond, "full_outer")
    sel = [F.coalesce(F.col(f"a.{k}"), F.col(f"b.{k}")).alias(k) for k in keys]
    zero = F.lit(0).cast("bigint")
    return joined.select(
        *sel,
        (F.coalesce(an["n"], zero) + F.coalesce(bn["n"], zero)).alias("n"),
        (
            F.coalesce(an["sum_cents"], zero) + F.coalesce(bn["sum_cents"], zero)
        ).alias("sum_cents"),
        F.least(an["min_v"], bn["min_v"]).alias("min_v"),
        F.greatest(an["max_v"], bn["max_v"]).alias("max_v"),
    )


def _mem_bytes(raw: str) -> int:
    """Bytes from a Spark size-conf string: plain byte counts
    ("10485760", "-1"), suffixed forms ("10MB", "1g", "512k"), and
    Spark's plain-bytes-with-suffix form ("10485760b" — r11, ADVICE:
    the trailing 'b' was only stripped after a unit letter, so the
    accepted "...b" spelling raised instead of parsing)."""
    s = str(raw).strip().lower()
    units = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    if len(s) >= 2 and s.endswith("b") and (s[-2] in units or s[-2].isdigit()):
        s = s[:-1]
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def _broadcast_if_bounded(delta: DataFrame) -> DataFrame:
    """Broadcast-hint a delta batch only when its optimizer size
    estimate is plausibly broadcast-sized (r9; the r8 version hinted
    unconditionally, and an explicit hint OVERRIDES
    ``autoBroadcastJoinThreshold`` — an oversized delta would have been
    force-broadcast into driver OOM, with nothing enforcing the
    docstring's "split it" advice).

    Policy: honor a disabled threshold (≤ 0 → never hint); otherwise
    hint while the estimate stays within 16× the threshold. The slack
    exists because Catalyst's pre-AQE estimate for a filtered delta is
    a conservative overestimate (unknown selectivity ≈ full input), so
    requiring est ≤ threshold would drop the hint on exactly the
    CDC-sized batches the contract targets; 16× (~160 MB at the 10 MB
    default) still refuses anything that could threaten the driver,
    and an un-hinted delta is not a lost cause — AQE re-plans with
    ACCURATE runtime sizes and still broadcasts it if it truly fits.

    Connect-safe (r10, ADVICE): the threshold comes from the public
    ``spark.conf`` (handles "10MB"-style strings) and the ``_jdf``
    stats probe — a classic-only private handle that also forces a
    driver-side optimization pass of the delta plan — degrades to the
    un-hinted path under Spark Connect, where AQE still picks up a
    genuinely small delta at runtime."""
    spark = delta.sparkSession
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    threshold = _mem_bytes(raw)
    if threshold <= 0:
        return delta
    try:
        est = int(
            str(delta._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:  # Spark Connect: no _jdf — leave the hint to AQE
        return delta
    return F.broadcast(delta) if est <= 16 * threshold else delta


def delta_join(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Incremental JOIN-view maintenance — the join counterpart of
    :func:`agg_state`/:func:`merge_agg_states` (Gupta & Mumick's delta
    rule for insertions): with A = A_old ∪ ΔA and B = B_old ∪ ΔB
    (disjoint unions),

        A ⋈ B  =  (A_old ⋈ B_old)  ∪  (ΔA ⋈ B_old)
                  ∪  (A_old ⋈ ΔB)  ∪  (ΔA ⋈ ΔB)

    and the first term IS the stored view — so maintaining the join
    costs three delta-sized joins, never a re-join of the two full
    relations. Returns the union of all four terms (the refreshed
    view); callers that persist ``A_old ⋈ B_old`` pass it through and
    compute only the three delta terms.

    Scale: ΔA and ΔB are batch-sized (GBs against a 100 TB fact), so
    the three delta terms broadcast their delta side — via the
    size-guarded hint (:func:`_broadcast_if_bounded`): a delta whose
    size estimate outgrows the broadcast envelope is left un-hinted
    for AQE to place with accurate runtime sizes instead of being
    force-broadcast into the driver. The A_old ⋈ B_old term is the
    materialized view scan in production; recomputing it here (when no
    stored view is passed) is the fixture stand-in the oracle checks
    the algebra against. Deletions/updates need signed multiplicities
    (counting algebra) — see :func:`signed_agg_refresh`; the
    insertion-only join rule matches the append-only lake this engine
    targets.
    """
    da, db = _broadcast_if_bounded(a_delta), _broadcast_if_bounded(b_delta)
    return (
        a_old.join(b_old, on)
        .unionByName(da.join(b_old, on))
        .unionByName(a_old.join(db, on))
        .unionByName(da.join(b_delta, on))
    )


def signed_agg_refresh(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    val_col: str,
    mult_col: str,
) -> DataFrame:
    """Aggregate maintenance under DELETES and UPDATES — the counting
    (signed-multiplicity) algebra that :func:`agg_state`/:func:`merge_agg_states`
    (insertion-only) cannot express: every change row carries
    ``mult_col`` ∈ {+1, −1} (an update is a −1 retraction of the old
    row plus a +1 insertion of the new one), the change batch
    aggregates to per-key signed deltas (Σmult, Σmult·cents), and a
    key-grained merge with the base state applies them. Groups whose
    count reaches zero vanish from the result — exactly the semantics
    of re-aggregating the post-change snapshot. This is the Z-relation
    /counting algebra of incremental view processing (Gupta & Mumick
    1995 counting algorithm; Green et al., *Reconcilable Differences*,
    ICDT 2009; DBSP/differential dataflow generalize it).

    Only COUNT and SUM survive retractions without auxiliary state —
    min/max are deliberately absent: deleting the current minimum
    needs the runner-up, which a scalar state cannot supply (the
    textbook reason engines keep per-group heaps or re-scan affected
    groups for MIN/MAX under CDC).

    Scale: the change batch is CDC-sized (MBs against a 100 TB fact);
    both sides reduce to KEY-GRAINED states before the merge, so the
    refresh never re-scans processed facts. The merge itself is a
    full-outer join (a key may exist on either side only), which Spark
    cannot broadcast — it sort-merges — but both inputs are dim-sized
    state relations, so the shuffle moves group counts, not facts.
    Returns (keys, n, sum_cents) for the refreshed view.
    """
    cents = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("bigint")
    mult = F.col(mult_col).cast("bigint")
    base_state = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"), F.sum(cents).alias("sum_cents")
    )
    delta_state = changes.groupBy(*keys).agg(
        F.sum(mult).alias("n"), F.sum(mult * cents).alias("sum_cents")
    )
    bb = base_state.select(
        *keys, F.col("n").alias("__b_n"), F.col("sum_cents").alias("__b_s")
    )
    # Rename the delta-side keys: both states usually descend from the
    # same source relation, so identical names would trip Spark's
    # ambiguous-self-join check in the merge condition.
    dd = delta_state.select(
        *[F.col(k).alias(f"__d_{k}") for k in keys],
        F.col("n").alias("__d_n"),
        F.col("sum_cents").alias("__d_s"),
    )
    cond = None
    for k in keys:
        eq = bb[k].eqNullSafe(dd[f"__d_{k}"])
        cond = eq if cond is None else (cond & eq)
    zero = F.lit(0).cast("bigint")
    merged = bb.join(dd, cond, "full_outer").select(
        *[F.coalesce(bb[k], dd[f"__d_{k}"]).alias(k) for k in keys],
        (F.coalesce(F.col("__b_n"), zero) + F.coalesce(F.col("__d_n"), zero)).alias("n"),
        (F.coalesce(F.col("__b_s"), zero) + F.coalesce(F.col("__d_s"), zero)).alias(
            "sum_cents"
        ),
    )
    # A negative refreshed count means a retraction arrived for a row
    # the base never held — corrupt CDC input. Filtering it away would
    # silently reconcile garbage; fail loudly instead (guarded_bigint
    # idiom).
    negative_guard = F.when(
        F.col("n") < 0,
        F.raise_error(
            F.lit(
                "signed_agg_refresh: group count went negative — a "
                "retraction has no matching base row (corrupt or "
                "double-applied CDC batch)"
            )
        ).cast("boolean"),
    ).otherwise(F.col("n") > 0)
    return merged.filter(negative_guard)


def signed_minmax_refresh(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    val_col: str,
    mult_col: str,
    heap_k: int = 8,
) -> DataFrame:
    """MIN/MAX maintenance under DELETES — the member
    :func:`signed_agg_refresh` deliberately omits: deleting the
    current minimum needs the runner-up, which a scalar state cannot
    supply, so the textbook remedy (Gupta & Mumick's "self-maintenance
    with auxiliary data"; every production IVM engine does a variant)
    keeps a BOUNDED per-group heap — the ``heap_k`` smallest and
    largest value instances — beside the count/sum state.

    Refresh algebra, per group (after batch CANONICALIZATION — the
    change batch is first netted per (group, value) so an insertion and
    a retraction of the same value cancel; a compacted CDC feed emits
    exactly such pairs for rows inserted-then-deleted between
    snapshots):

    - retraction of a value INSIDE the heap removes one matching
      instance (multiset semantics — first occurrence, via an indexed
      ``filter`` fold); a retraction ABOVE the min-heap's range (resp.
      below the max-heap's) cannot affect that extreme and is ignored
      by that heap. Only the ``heap_k`` smallest retractions can touch
      the min-heap (pigeonhole: in-range retractions sort first), so
      the delta state is bounded too;
    - insertions contribute their ``heap_k`` smallest/largest;
    - the refreshed extreme is the head of the merged heap, and the
      merged heap is itself a valid (possibly SHRUNKEN) heap of the
      refreshed group — heaps degrade under deletes and are refilled
      by the periodic re-scan, the standard operational contract;
    - **loud failure**: if a heap EMPTIES while base-sourced rows
      remain in the group, the true extreme is no longer derivable
      from bounded state (all tracked runners-up were deleted — or,
      for a never-truncated heap, the CDC retracted rows the base
      never held). ``raise_error`` fires with the remediation named:
      re-scan the affected groups (or raise ``heap_k``). Filtering
      the group away instead would silently serve a wrong extreme.

    COUNT/SUM ride along with :func:`signed_agg_refresh` semantics
    (signed deltas, empty groups vanish, negative counts raise).
    Returns (keys, n, sum_cents, min_v, max_v, min_heap, max_heap) —
    the heaps so a caller can persist the refreshed auxiliary state.

    Scale: the base pass is ONE keyed window (asc + desc ranks and the
    full-frame count/sum share one exchange), the change batch is
    CDC-sized, both reduce to key-grained states (heap arrays bounded
    by ``heap_k``), and the merge is the same dim-sized full-outer
    join as the scalar refresh — processed facts are never re-scanned.
    """
    vtype = dict(base.dtypes)[val_col]
    empty = f"CAST(array() AS array<{vtype}>)"
    v = F.col(val_col)
    cents = F.floor(v * 100 + F.lit(0.5)).cast("bigint")

    w_asc = Window.partitionBy(*keys).orderBy(F.col("__v").asc())
    w_desc = Window.partitionBy(*keys).orderBy(F.col("__v").desc())
    w_all = Window.partitionBy(*keys)
    ranked = (
        base.select(*keys, v.alias("__v"), cents.alias("__c"))
        .withColumn("__ra", F.row_number().over(w_asc))
        .withColumn("__rd", F.row_number().over(w_desc))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
        .withColumn("__s", F.sum("__c").over(w_all))
    )
    bs = (
        ranked.filter((F.col("__ra") <= heap_k) | (F.col("__rd") <= heap_k))
        .groupBy(*keys)
        .agg(
            F.sort_array(
                F.collect_list(F.when(F.col("__ra") <= heap_k, F.col("__v")))
            ).alias("__min_k"),
            F.sort_array(
                F.collect_list(F.when(F.col("__rd") <= heap_k, F.col("__v"))),
                asc=False,
            ).alias("__max_k"),
            F.first("__n").alias("__b_n"),
            F.first("__s").alias("__b_s"),
        )
    )

    # coalesce(False): a NULL mult must take the raise_error branch,
    # not slip through a NULL condition into otherwise(True).
    bad_mult = F.when(
        ~F.coalesce(F.col(mult_col).isin(1, -1), F.lit(False)),
        F.raise_error(
            F.lit("signed_minmax_refresh: mult_col must be +1 or -1")
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    ch = changes.filter(bad_mult).select(
        *[F.col(c).alias(f"__d_{c}") for c in keys],
        v.alias("__v"),
        cents.alias("__c"),
        F.col(mult_col).cast("bigint").alias("__m"),
    )
    dkeys = [f"__d_{c}" for c in keys]
    # Canonicalize the batch: NET multiplicities per (group, value) and
    # re-expand to unit rows. A compacted CDC feed can carry both an
    # insertion and a retraction of the SAME value (row inserted then
    # deleted between snapshots); the heap algebra below reconciles
    # retractions against the BASE heap only, so such a pair must
    # cancel HERE — otherwise the insertion would enter the merged heap
    # while the retraction no-ops against the base, yielding a silently
    # wrong extreme. After netting, each (group, value) is purely
    # inserted or purely retracted; counts/sums are invariant, and the
    # surviving retraction count is exactly the number of BASE rows
    # that must disappear (what __remaining_base measures).
    ch = (
        ch.groupBy(*dkeys, "__v", "__c")
        .agg(F.sum("__m").alias("__net"))
        .filter(F.col("__net") != 0)
        .select(
            *dkeys,
            "__v",
            "__c",
            F.explode(F.expr("sequence(1, abs(__net))")).alias("__i"),
            F.signum("__net").cast("bigint").alias("__m"),
        )
        .drop("__i")
    )
    w_m_asc = Window.partitionBy(*dkeys, "__m").orderBy(F.col("__v").asc())
    w_m_desc = Window.partitionBy(*dkeys, "__m").orderBy(F.col("__v").desc())
    w_d_all = Window.partitionBy(*dkeys)
    ins, ret = F.col("__m") > 0, F.col("__m") < 0
    dranked = (
        ch.withColumn("__ra", F.row_number().over(w_m_asc))
        .withColumn("__rd", F.row_number().over(w_m_desc))
        .withColumn("__dn", F.sum("__m").over(w_d_all))
        .withColumn("__ds", F.sum(F.col("__m") * F.col("__c")).over(w_d_all))
        .withColumn("__dr", F.sum(F.when(ret, 1).otherwise(0)).over(w_d_all))
    )
    ds = (
        dranked.filter((F.col("__ra") <= heap_k) | (F.col("__rd") <= heap_k))
        .groupBy(*dkeys)
        .agg(
            F.sort_array(
                F.collect_list(F.when(ins & (F.col("__ra") <= heap_k), F.col("__v")))
            ).alias("__ins_min"),
            F.sort_array(
                F.collect_list(F.when(ins & (F.col("__rd") <= heap_k), F.col("__v"))),
                asc=False,
            ).alias("__ins_max"),
            F.sort_array(
                F.collect_list(F.when(ret & (F.col("__ra") <= heap_k), F.col("__v")))
            ).alias("__ret_min"),
            F.sort_array(
                F.collect_list(F.when(ret & (F.col("__rd") <= heap_k), F.col("__v"))),
                asc=False,
            ).alias("__ret_max"),
            F.first("__dn").alias("__d_n"),
            F.first("__ds").alias("__d_s"),
            F.first("__dr").alias("__d_r"),
        )
    )

    cond = None
    for c in keys:
        eq = bs[c].eqNullSafe(ds[f"__d_{c}"])
        cond = eq if cond is None else (cond & eq)
    zero = F.lit(0).cast("bigint")
    j = bs.join(ds, cond, "full_outer")

    # Remove one instance per retraction (first occurrence, indexed
    # filter — array_remove/array_except are set-semantics and drop
    # duplicates) — retractions that match nothing fall through, which
    # the exhaustion/negative-count guards then adjudicate.
    def _heap_minus(heap: str, rets: str) -> str:
        return (
            f"aggregate(coalesce({rets}, {empty}), coalesce({heap}, {empty}), "
            "(acc, r) -> CASE WHEN array_position(acc, r) > 0 "
            "THEN filter(acc, (x, i) -> i != int(array_position(acc, r)) - 1) "
            "ELSE acc END)"
        )

    merged = j.select(
        *[F.coalesce(bs[c], ds[f"__d_{c}"]).alias(c) for c in keys],
        (F.coalesce(F.col("__b_n"), zero) + F.coalesce(F.col("__d_n"), zero)).alias("n"),
        (F.coalesce(F.col("__b_s"), zero) + F.coalesce(F.col("__d_s"), zero)).alias(
            "sum_cents"
        ),
        (F.coalesce(F.col("__b_n"), zero) - F.coalesce(F.col("__d_r"), zero)).alias(
            "__remaining_base"
        ),
        F.expr(
            f"slice(array_sort(concat({_heap_minus('__min_k', '__ret_min')}, "
            f"coalesce(__ins_min, {empty}))), 1, {heap_k})"
        ).alias("min_heap"),
        F.expr(
            f"slice(sort_array(concat({_heap_minus('__max_k', '__ret_max')}, "
            f"coalesce(__ins_max, {empty})), false), 1, {heap_k})"
        ).alias("max_heap"),
    )
    guard = (
        F.when(
            F.col("n") < 0,
            F.raise_error(
                F.lit(
                    "signed_minmax_refresh: group count went negative — a "
                    "retraction has no matching base row (corrupt or "
                    "double-applied CDC batch)"
                )
            ).cast("boolean"),
        )
        .when(
            (F.col("__remaining_base") > 0)
            & ((F.size("min_heap") == 0) | (F.size("max_heap") == 0)),
            F.raise_error(
                F.lit(
                    "signed_minmax_refresh: heap exhausted — every tracked "
                    "runner-up was retracted while base rows remain, so the "
                    "group's min/max is no longer derivable from bounded "
                    "state. Re-scan the affected groups (or raise heap_k)."
                )
            ).cast("boolean"),
        )
        .otherwise(F.col("n") > 0)
    )
    null_v = F.lit(None).cast(vtype)
    return merged.filter(guard).select(
        *keys,
        "n",
        "sum_cents",
        F.when(F.size("min_heap") > 0, F.col("min_heap")[0]).otherwise(null_v).alias("min_v"),
        F.when(F.size("max_heap") > 0, F.col("max_heap")[0]).otherwise(null_v).alias("max_v"),
        "min_heap",
        "max_heap",
    )


def snapshot_to_changes(old: DataFrame, new: DataFrame) -> DataFrame:
    """CDC EXTRACTION: the minimal signed change batch that transforms
    the ``old`` snapshot's multiset of rows into ``new``'s — the
    Z-relation difference (new ⊖ old) that GENERATES the input
    :func:`signed_agg_refresh`/:func:`signed_minmax_refresh` APPLY and
    ``snapshot_diff`` (operators/corpus.py) only detects. With it the
    IVM family closes end-to-end: diff two table versions (no CDC feed
    required — the common lake reality), feed the batch to the signed
    refreshes, and the refreshed view equals a recompute over the new
    snapshot (the registered query's oracle checks exactly that
    composition).

    Per distinct row value r: multiplicity delta d = count_new(r) −
    count_old(r); emit |d| copies of r with mult = sign(d), nothing
    when d = 0. Minimality: Σ|mult| is the multiset symmetric
    difference — no retract-and-reinsert of unchanged rows (an update
    appears as −1 old + +1 new because those ARE different row
    values). NULL-safe grouping, so NULL-bearing rows diff correctly.

    Scale: two hash aggregations (map-side combined to distinct row
    values) + one key-grained full-outer join on the row value — the
    same shuffle discipline as the refreshes; the explode only
    re-expands rows that actually changed. Returns old's columns plus
    ``mult`` ∈ {+1, −1}."""
    if old.columns != new.columns:
        raise ValueError(
            f"snapshot_to_changes: column mismatch {old.columns} vs {new.columns}"
        )
    cols = old.columns
    co = old.groupBy(*cols).agg(F.count(F.lit(1)).alias("__n_o"))
    cn = new.groupBy(*cols).agg(F.count(F.lit(1)).alias("__n_n"))
    nn = cn.select(
        *[F.col(c).alias(f"__d_{c}") for c in cols], "__n_n"
    )
    cond = None
    for c in cols:
        eq = co[c].eqNullSafe(nn[f"__d_{c}"])
        cond = eq if cond is None else (cond & eq)
    zero = F.lit(0).cast("bigint")
    j = co.join(nn, cond, "full_outer").select(
        *[F.coalesce(co[c], nn[f"__d_{c}"]).alias(c) for c in cols],
        (F.coalesce(F.col("__n_n"), zero) - F.coalesce(F.col("__n_o"), zero)).alias(
            "__delta"
        ),
    )
    changed = j.filter(F.col("__delta") != 0)
    return changed.select(
        *cols,
        F.explode(F.expr("sequence(1, abs(__delta))")).alias("__i"),
        F.signum(F.col("__delta")).cast("int").alias("mult"),
    ).drop("__i")
