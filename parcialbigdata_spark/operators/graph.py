"""Connected components over pair graphs (SURVEY.md §2.10 extension).

Near-duplicate detection emits PAIRS (MinHash/SimHash/winnowing/
embedding LSH all return ``(id_a, id_b)``); deduplication needs
CLUSTERS — the transitive closure of those pairs — so that one
survivor is kept per component, not per pair. This module provides
the iterative min-label propagation that turns pairs into components.

Algorithm: every node starts labeled with its own id; each round every
node takes the min label in its closed neighborhood; stop when no
label changes. Rounds = graph diameter (near-dup graphs are
overwhelmingly tiny cliques/chains, so 2-4 rounds in practice — the
classic HashToMin / Pregel-style propagation). Each round is one
shuffle on the node id; the edge relation is persisted once and
reused by every round.

At 100 TB: near-dup graphs have billions of nodes but tiny components;
min-propagation with early termination is the standard scalable
answer (GraphFrames' connectedComponents uses the same family of
algorithms). For pathological long-chain / high-diameter graphs the
large-star/small-star rewrite (Kiveris et al., SoCC'14) is available
via ``connected_components(..., algorithm="star")`` — O(log n)
alternations regardless of diameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from parcialbigdata_spark.session import release_checkpoint


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    algorithm: str = "label",
    assume_distinct: bool = False,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; ``component`` is
    the minimum node id reachable through the pair graph.

    ``pairs`` is undirected input (each row links two nodes). Raises
    ``RuntimeError`` if the labels have not converged after
    ``max_iter`` rounds (diameter > max_iter — not a near-dup graph).

    ``algorithm="label"`` (default) is the min-label propagation below:
    rounds = graph diameter, the right trade for near-dup graphs (tiny
    cliques/chains). ``algorithm="star"`` switches to the alternating
    large-star/small-star edge rewrite (Kiveris et al., *Connected
    Components in MapReduce and Beyond*, SoCC'14), which converges in
    O(log n) rounds regardless of diameter — the fallback for
    long-chain / high-diameter graphs where propagation would need
    diameter rounds (property-tested on a 1,000-node path: star
    converges well under ``max_iter`` while propagation provably
    cannot).

    Lineage discipline: every round's label relation is
    ``localCheckpoint``-ed. Without this the logical plan re-embeds the
    (possibly expensive) upstream pair plan once per round and grows
    exponentially — planning itself OOMs after a handful of rounds, the
    textbook failure of iterative DataFrame algorithms. On a cluster
    with executor loss, swap for reliable ``checkpoint()`` against the
    checkpoint dir; the loop is unchanged.

    ``assume_distinct=True`` (r14, label path only) skips the edge
    dedup shuffle. Min-label propagation is invariant to duplicate
    edges (min over a multiset equals min over its set), so the
    result is identical either way — the flag only removes an
    Exchange when the caller's pairs are already pair-grained (every
    near-dup pair producer here emits groupBy/distinct output). Keep
    the default for arbitrary input: heavy edge multiplicity would
    multiply the per-round join fan-out."""
    if algorithm == "star":
        return _connected_components_star(pairs, src, dst, max_iter)
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}: use 'label' or 'star'")
    # Symmetrize once; checkpoint cuts the upstream pair plan out of
    # every round's lineage. The checkpointed relation is hash-
    # partitioned on the probe-side key ``v`` FIRST (LogicalRDD
    # retains the physical partitioning), so at scale each round's
    # edges⋈labels join reshuffles only the label side; at fixture
    # scale AQE broadcasts the labels anyway.
    fwd = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if not assume_distinct:
        sym = sym.distinct()
    edges = sym.repartition(F.col("v")).localCheckpoint(eager=True)
    # Round 1's first hop is SPECIALIZED (r10): with identity labels
    # the closed-neighborhood min is just least(u, min(v)) grouped by
    # u — one hash agg over the checkpointed edges, replacing the r9
    # chain of distinct-nodes (shuffle) + edges⋈labels join + agg +
    # left join. Symmetrization guarantees every node appears as u,
    # so the agg's key set IS the node set and no separate label
    # base is needed.
    labels = edges.groupBy("u").agg(
        F.least(F.col("u"), F.min("v")).alias("comp")
    ).select(F.col("u").alias("node"), "comp")

    def _hop(lab: DataFrame) -> DataFrame:
        # Min label over the closed neighborhood: own label ∪ neighbors'.
        neighbor_min = (
            edges.join(lab, edges.v == lab.node)
            .groupBy("u")
            .agg(F.min("comp").alias("n_comp"))
        )
        return lab.join(neighbor_min, lab.node == neighbor_min.u, "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))).alias("comp"),
        )

    def _hop_tracked(lab: DataFrame) -> DataFrame:
        # Second hop of a round, threading the first hop's label
        # through as ``__prev`` so the round can observe both.
        neighbor_min = (
            edges.join(lab, edges.v == lab.node)
            .groupBy("u")
            .agg(F.min("comp").alias("n_comp"))
        )
        return lab.join(neighbor_min, lab.node == neighbor_min.u, "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))).alias("comp"),
            F.col("comp").alias("__prev"),
        )

    labels_checkpointed = False
    for i in range(max_iter):
        # TWO hops per checkpoint round: label distance covered per
        # round doubles while the per-round FIXED cost (ONE
        # eager-checkpoint job) stays constant — at fixture scale that
        # fixed cost dominates the loop, at cluster scale the second
        # hop's joins are the same data-proportional work either way.
        # NOT more than two: each un-checkpointed hop references its
        # input relation twice (label base + neighbor join side), so
        # plan size doubles per hop — 4-hop rounds were measured
        # SLOWER (2^4 subplan copies) despite fewer checkpoints.
        #
        # Convergence detection is WITHIN the round, not across
        # rounds: the second hop threads the first hop's labels
        # through as ``__prev``, and both exact DECIMAL(38) label sums
        # ride the checkpoint materialization itself via observe()
        # (CollectMetrics fires during the eager-checkpoint action).
        # Labels are MONOTONE non-increasing per node per hop, so
        # Σcomp == Σ__prev ⟺ hop 2 changed NO label ⟺ hop 1's output
        # was already the fixpoint — the round detects its own
        # convergence, with no separate probe job and no extra
        # confirmation round (r8 ran a per-round aggregation job and
        # always paid one full no-op round to observe sum stability;
        # for the clique-dominated near-dup graphs this loop serves,
        # that halves the rounds: hop 1 converges, hop 2 certifies).
        obs = Observation(f"cc_round_{i}")
        # Round 0's hop 1 already happened in the specialized initial
        # agg above — its round runs hop 2 only (still self-certifying:
        # Σcomp == Σ__prev ⟺ the specialized hop was the fixpoint).
        new_labels = (
            _hop_tracked(labels if i == 0 else _hop(labels))
            .observe(
                obs,
                F.sum(F.col("comp").cast("decimal(38,0)")).alias("s_comp"),
                F.sum(F.col("__prev").cast("decimal(38,0)")).alias("s_prev"),
            )
            .select("node", "comp")
            .localCheckpoint(eager=True)
        )
        got = obs.get
        if labels_checkpointed:
            release_checkpoint(labels)
        labels, labels_checkpointed = new_labels, True
        if got["s_comp"] == got["s_prev"]:
            release_checkpoint(edges)
            return labels.select(F.col("node"), F.col("comp").alias("component"))
    # Release the round state BEFORE raising: a caller that catches and
    # retries with a larger max_iter must not accumulate orphaned
    # checkpoint RDDs (unpersist cannot free these — that is the whole
    # point of release_checkpoint).
    release_checkpoint(edges)
    if labels_checkpointed:
        release_checkpoint(labels)
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def _large_star(E: DataFrame) -> DataFrame:
    """Large-star rewrite: every node connects its strictly-larger
    neighbors to the minimum of its closed neighborhood. Edges emitted
    (big, small)-normalized."""
    D = E.union(E.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    m = D.groupBy("u").agg(F.min("v").alias("mn")).select(
        "u", F.least(F.col("mn"), F.col("u")).alias("m")
    )
    return (
        D.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(E: DataFrame) -> DataFrame:
    """Small-star rewrite: every node connects its smaller neighbors
    (and itself) to the minimum among them."""
    D = (
        E.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    m = D.groupBy("u").agg(F.min("v").alias("mn"))
    rewired = D.join(m, "u").select(F.col("v").alias("u"), F.col("mn").alias("v"))
    keep_center = m.select(F.col("u"), F.col("mn").alias("v"))
    return rewired.union(keep_center).filter(F.col("u") != F.col("v")).distinct()


def _connected_components_star(
    pairs: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    """Alternating large-star/small-star until the edge set is stable
    (then every edge points node → component-min, i.e. the graph is a
    union of stars rooted at the minima). O(log n) alternations on any
    graph — the long-chain-safe fallback. Same lineage discipline as
    the propagation loop: localCheckpoint per round.

    Convergence check is EXACT (two anti-join probes, each
    short-circuited by limit(1)) — a hash-compare could, with
    vanishing but nonzero probability, declare a wrong fixed point."""
    nodes = (
        pairs.select(F.col(src).alias("node"))
        .union(pairs.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    E = (
        pairs.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        new_E = _small_star(_large_star(E)).localCheckpoint(eager=True)
        grew = new_E.join(E, ["u", "v"], "left_anti").limit(1).count()
        shrank = E.join(new_E, ["u", "v"], "left_anti").limit(1).count()
        stable = grew == 0 and shrank == 0
        # Both stability probes have run: the previous edge generation
        # is dead — release it (the final E and `nodes` are ancestors
        # of the returned lazy plan and must stay).
        release_checkpoint(E)
        E = new_E
        if stable:
            labels = E.groupBy("u").agg(F.min("v").alias("component")).select(
                F.col("u").alias("node"), "component"
            )
            return (
                nodes.join(labels, "node", "left")
                .select("node", F.coalesce(F.col("component"), F.col("node")).alias("component"))
            )
    raise RuntimeError(
        f"connected_components(star) did not converge in {max_iter} rounds"
    )


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    assume_distinct: bool = False,
) -> DataFrame:
    """Cluster summary for a near-dup pair graph: one row per
    component with its survivor (min id) and size.

    Returns (component, survivor_id, cluster_size); singleton documents
    (no pair) are by definition their own survivor and are not listed —
    join this back to the corpus with a left join + coalesce to build
    the keep-list."""
    cc = connected_components(pairs, src, dst, assume_distinct=assume_distinct)
    return cc.groupBy("component").agg(
        F.min("node").alias("survivor_id"),
        F.count(F.lit(1)).alias("cluster_size"),
    )


def incremental_components(
    prior_labels: DataFrame,
    new_pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    algorithm: str = "label",
) -> DataFrame:
    """(node, component) after adding ``new_pairs`` to a graph whose
    previous run produced ``prior_labels`` (node, component) — WITHOUT
    re-touching the old pair graph.

    The incremental-view-maintenance move (Gupta–Mumick, applied to
    connectivity): each prior component collapses to STAR EDGES
    node→component (the component id is itself a member — the minimum
    node — so the stars preserve exactly the old connectivity and node
    set), and propagation runs on stars ∪ new edges. The result is
    BIT-IDENTICAL to a full recompute over old ∪ new edges: min
    reachable id is invariant under collapsing a component to its
    representative. New edges that bridge two old components merge
    them to the smaller min, exactly as the full run would.

    Why it scales: the stars relation is one edge per previously
    clustered NODE (not per old PAIR — at web scale the pair graph is
    orders of magnitude larger), old components enter with diameter ≤2
    so convergence is driven by the NEW edges' diameter, and the old
    corpus is never re-paired — the daily cost tracks the daily delta.
    Batch sibling: ``dedup_clusters``/``connected_components`` (full
    recompute); incremental siblings: ``operators/incremental.py``
    (agg merge), ``incremental_dedup_documents`` (fingerprint store).
    """
    stars = prior_labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(src), F.col("component").alias(dst)
    )
    edges = stars.unionByName(new_pairs.select(F.col(src), F.col(dst)))
    cc = connected_components(edges, src, dst, max_iter, algorithm)
    # A prior SINGLETON component (node == component, no other member)
    # contributes no star edge, so unless that node reappears in
    # new_pairs it is absent from the propagation output — union it
    # back so the old node set is preserved exactly, as the contract
    # above states. Labels derived from pair graphs have no singletons
    # (every node has a partner), so this anti-join is empty there;
    # it matters for caller-supplied labels with isolated nodes. The
    # anti-join key is the node id — prior-labels-sized, not
    # pair-graph-sized.
    missing = prior_labels.join(cc, "node", "left_anti").select("node", "component")
    return cc.unionByName(missing)


def pagerank_scaled(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000_000_000,
    checkpoint_interval: int = 5,
    assume_distinct: bool = False,
) -> DataFrame:
    """PageRank with EXACT integer arithmetic: ranks are maintained as
    bigint micro-units (``scale`` = 1.0) and every step uses integral
    ``DIV`` — no floating point anywhere — so two engines replaying the
    same edge list produce bit-identical ranks. That is what makes an
    iterative graph algorithm oracle-checkable at all: float PageRank
    differs in the last ulps across engines/partitionings.

    Per iteration: ``contrib = rank DIV out_degree`` flows along each
    edge, ``rank' = base + damping·inflow DIV 100`` where
    ``base = ((100-damping)·scale DIV 100) DIV N``. Dangling mass (and
    DIV truncation dust) is dropped, the standard simplified PR; ranks
    therefore sum to ≤ scale. Deterministic regardless of join order
    because integer addition is associative-commutative.

    Plan shape (the 100 TB story): the edge relation and the static
    (node, out_degree) relation are shared across rounds via
    ReusedExchange (the whole run is one query when iterations ≤
    checkpoint_interval — no cache needed, no cached-relation leak);
    each iteration is one join edges⋈ranks on ``src`` (both sides
    hashed on the same key — co-partitioned under AQE) + one
    groupBy(dst) agg — the canonical 2-shuffle PR round. Lineage is cut with
    ``localCheckpoint`` every ``checkpoint_interval`` rounds — the
    :func:`connected_components` discipline, but metered: eager
    checkpointing materializes the rank relation and measures ~4×
    slower for short runs, while a handful of uncheckpointed rounds
    keeps the plan shallow enough to compile. Every interval-th round
    pays one materialization; swap for ``checkpoint()`` on a cluster.
    Total cost is O(iterations · |edges|) with no driver-side data
    movement."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if checkpoint_interval < 1:
        raise ValueError("checkpoint_interval must be >= 1")
    # Duplicate edges would double-count contributions, so dedup unless
    # the caller certifies distinctness (skips one full-edge shuffle —
    # at web scale the edge list is usually already a distinct relation).
    # No persist() here (r4, ADVICE r3 cache-leak fix): with
    # iterations ≤ checkpoint_interval the whole computation is ONE
    # query at the caller's action, and Catalyst's ReusedExchange
    # dedups the repeated edge-relation subplan across the per-round
    # joins within that execution — a cache would add a leak (or a
    # lineage-cutting materialization that blinds plan inspection) for
    # no saved work. Longer runs recompute the edge distinct once per
    # checkpoint action; that is one cheap shuffle per interval.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # (node, out_degree) is static across rounds; nodes with no
    # out-edges carry degree 0 and contribute nothing.
    base_nodes = (
        nodes.join(deg.withColumnRenamed("src", "node"), "node", "left")
        .fillna({"out_degree": 0})
    )
    n_total = base_nodes.agg(F.count(F.lit(1)).alias("n")).select(
        F.col("n"),
        F.expr(f"(({100 - damping_pct}L * {scale}L) DIV 100) DIV n").alias("base"),
        F.expr(f"{scale}L DIV n").alias("init"),
    )
    ranks = base_nodes.crossJoin(F.broadcast(n_total)).select(
        "node", "out_degree", "base", F.col("init").alias("rank_scaled")
    )
    ckpt = None
    for it in range(iterations):
        contrib = (
            e.join(
                ranks.filter(F.col("out_degree") > 0).select(
                    F.col("node").alias("src"), "out_degree", "rank_scaled"
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_scaled DIV out_degree").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            ranks.join(contrib, "node", "left")
            .fillna({"inflow": 0})
            .select(
                "node",
                "out_degree",
                "base",
                F.expr(f"base + ({damping_pct}L * inflow) DIV 100").alias(
                    "rank_scaled"
                ),
            )
        )
        if (it + 1) % checkpoint_interval == 0 and it + 1 < iterations:
            prev_ckpt = ckpt
            ranks = ckpt = ranks.localCheckpoint(eager=True)
            # The new checkpoint is self-contained once materialized, so
            # the one it supersedes can release its cached partitions —
            # repeated calls must not grow the persisted-RDD set
            # (ADVICE r3 cache-leak discipline; the LAST checkpoint is
            # an ancestor of the returned plan and must stay).
            if prev_ckpt is not None:
                release_checkpoint(prev_ckpt)
    out = ranks.select("node", "out_degree", "rank_scaled")
    if ckpt is not None:
        # A retained intermediate checkpoint would be an unreleasable
        # ancestor of the returned plan; materialize the result itself
        # instead and release the intermediate, so the caller can free
        # everything with one release_checkpoint() on the returned
        # relation.
        out = out.localCheckpoint(eager=True)
        release_checkpoint(ckpt)
    return out


def pagerank_conserving(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000_000_000,
    assume_distinct: bool = False,
) -> DataFrame:
    """PageRank that conserves rank mass EXACTLY: after every round
    ``sum(rank_scaled) == scale``, still in pure bigint arithmetic
    (SCALE.md §8's sketch, realized in r4).

    Two additions over :func:`pagerank_scaled`:

    - **dangling redistribution**: the summed rank of out-degree-0
      nodes is shared uniformly (``dangling DIV n``) into every node's
      damped inflow — the standard PR treatment of dangling mass, kept
      integral;
    - **residue assignment**: integral DIV truncation (contribution
      splits, the damping DIV, the dangling share) loses a few units
      of mass per round; the exact shortfall ``scale − sum(raw)`` is
      assigned to the minimum node id. Deterministic, engine-replayable
      (a chained-CTE oracle reproduces it bit-for-bit), and O(1) mass
      per round (bounded by the number of truncations), so it never
      meaningfully distorts the distribution.

    Costs one extra global agg per round (the residue) plus the
    dangling sum, and eagerly checkpoints each round because the rank
    relation is read by several singleton aggregates — use
    :func:`pagerank_scaled` when exact conservation isn't needed.
    Helper relations and superseded per-round checkpoints are released
    before returning; the ONE retained materialization is the returned
    result itself (eagerly checkpointed, lineage-free) — call
    :func:`parcialbigdata_spark.session.release_checkpoint` on it when
    done to release its cached partitions (plain ``unpersist()`` cannot
    see a checkpoint's backing RDD)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    e = e.persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    base_nodes = (
        nodes.join(deg.withColumnRenamed("src", "node"), "node", "left")
        .fillna({"out_degree": 0})
        .persist()
    )
    # Graph-global params come to the driver ONCE (one bounded-row
    # first() over the persisted node relation — r14); base/init use
    # Python // which equals SQL DIV on these non-negative ints, so
    # every downstream integer is unchanged.
    prow = base_nodes.agg(
        F.count(F.lit(1)).alias("n"), F.min("node").alias("min_node")
    ).first()
    n_nodes = int(prow["n"])
    if n_nodes == 0:  # empty graph: empty result, same schema
        out = base_nodes.select(
            "node", "out_degree", F.lit(0).cast("bigint").alias("rank_scaled")
        ).localCheckpoint(eager=True)
        e.unpersist()
        base_nodes.unpersist()
        return out
    min_node = int(prow["min_node"])
    base_val = (((100 - damping_pct) * scale) // 100) // n_nodes
    init_val = scale // n_nodes
    is_min = F.col("node") == F.lit(min_node)
    # Init already conserves: the DIV shortfall of scale/n goes to the
    # minimum node, same rule as every later round. One job per round
    # (r14 — the connected_components observe discipline, see
    # pagerank_personalized): the dangling sum and residue ride each
    # round's eager-checkpoint materialization as CollectMetrics and
    # re-enter as literals; the r13 shape paid two singleton aggregate
    # jobs plus broadcast builds per round for the same integers.
    obs0 = Observation("pr_cons_init")
    ranks = (
        base_nodes.select(
            "node",
            "out_degree",
            (
                F.lit(init_val)
                + F.when(
                    is_min, F.lit(scale - init_val * n_nodes)
                ).otherwise(F.lit(0))
            ).cast("bigint").alias("rank_scaled"),
        )
        .observe(
            obs0,
            F.coalesce(
                F.sum(F.when(F.col("out_degree") == 0, F.col("rank_scaled"))),
                F.lit(0).cast("bigint"),
            ).alias("dangling"),
            F.max(F.when(is_min, F.col("out_degree"))).alias("min_od"),
        )
        .localCheckpoint(eager=True)
    )
    got0 = obs0.get
    dangling_val = int(got0["dangling"])
    min_dangling = got0["min_od"] is not None and int(got0["min_od"]) == 0
    # Each round's eager checkpoint supersedes the previous one; the
    # superseded checkpoint's cached partitions are released as soon as
    # the successor is materialized, so repeated calls never grow the
    # persisted-RDD set (ADVICE r3 cache-leak discipline).
    prev_ckpt = ranks
    for it in range(iterations):
        contrib = (
            e.join(
                ranks.filter(F.col("out_degree") > 0).select(
                    F.col("node").alias("src"), "out_degree", "rank_scaled"
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_scaled DIV out_degree").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        obs = Observation(f"pr_cons_round_{it}")
        raw = (
            ranks.join(contrib, "node", "left")
            .fillna({"inflow": 0})
            .select(
                "node",
                "out_degree",
                F.expr(
                    f"{base_val}L + ({damping_pct}L *"
                    f" (inflow + {dangling_val}L DIV {n_nodes}L)) DIV 100"
                ).alias("rank_raw"),
            )
            .observe(
                obs,
                F.coalesce(F.sum("rank_raw"), F.lit(0).cast("bigint")).alias(
                    "s_raw"
                ),
                F.coalesce(
                    F.sum(F.when(F.col("out_degree") == 0, F.col("rank_raw"))),
                    F.lit(0).cast("bigint"),
                ).alias("s_dangling"),
            )
            .localCheckpoint(eager=True)
        )
        got = obs.get
        residue_val = scale - int(got["s_raw"])
        release_checkpoint(prev_ckpt)
        prev_ckpt = raw
        ranks = raw.select(
            "node",
            "out_degree",
            (
                F.col("rank_raw")
                + F.when(is_min, F.lit(residue_val)).otherwise(F.lit(0))
            ).alias("rank_scaled"),
        )
        dangling_val = int(got["s_dangling"]) + (
            residue_val if min_dangling else 0
        )
    ranks = ranks.select("node", "out_degree", "rank_scaled").localCheckpoint(eager=True)
    release_checkpoint(prev_ckpt)
    e.unpersist()
    base_nodes.unpersist()
    return ranks


def pagerank_personalized(
    edges: DataFrame,
    seed: int,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    damping_pct: int = 85,
    scale: int = 1_000_000_000_000,
    assume_distinct: bool = False,
) -> DataFrame:
    """Personalized PageRank (PPR): the teleport vector is a single
    ``seed`` node instead of uniform — ranks measure proximity TO the
    seed through the link structure, the standard primitive behind
    graph-based recommendation and similar-node queries.

    Same exact-integer discipline as :func:`pagerank_conserving`
    (``sum(rank_scaled) == scale`` after every round), with all three
    global mass flows routed to the seed instead of spread uniformly:
    teleport ``(100-d)%·scale``, the dangling sum (damped), and the
    integral-DIV residue all land on the seed node.  Initial mass is
    entirely at the seed (standard PPR power iteration).

    One job per round (r14 — the :func:`connected_components`
    ``observe`` discipline applied to PR): the dangling sum and the
    residue both ride the round's eager-checkpoint materialization as
    CollectMetrics and come back as driver INTS, injected into the
    next round as literals — the r13 shape ran two extra singleton
    aggregate jobs plus their broadcast builds per round for the same
    integers. Arithmetic (and the chained-CTE oracle parity) is
    bit-unchanged: the same bigint sums feed the same DIV chain. The
    one retained materialization is the returned result
    (``release_checkpoint`` to free)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not assume_distinct:
        e = e.distinct()
    e = e.persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    base_nodes = (
        nodes.join(deg.withColumnRenamed("src", "node"), "node", "left")
        .fillna({"out_degree": 0})
        .persist()
    )
    is_seed = F.col("node") == F.lit(seed)
    obs0 = Observation("ppr_init")
    ranks = (
        base_nodes.select(
            "node",
            "out_degree",
            F.when(is_seed, F.lit(scale)).otherwise(F.lit(0)).cast("bigint").alias(
                "rank_scaled"
            ),
        )
        .observe(
            obs0,
            F.coalesce(
                F.sum(F.when(F.col("out_degree") == 0, F.col("rank_scaled"))),
                F.lit(0).cast("bigint"),
            ).alias("dangling"),
            # Whether the seed itself is dangling decides where the
            # residue mass lands in NEXT round's dangling sum.
            F.max(F.when(is_seed, F.col("out_degree"))).alias("seed_od"),
        )
        .localCheckpoint(eager=True)
    )
    got0 = obs0.get
    dangling_val = int(got0["dangling"])
    seed_dangling = got0["seed_od"] is not None and int(got0["seed_od"]) == 0
    teleport = ((100 - damping_pct) * scale) // 100
    prev_ckpt = ranks
    for it in range(iterations):
        contrib = (
            e.join(
                ranks.filter(F.col("out_degree") > 0).select(
                    F.col("node").alias("src"), "out_degree", "rank_scaled"
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_scaled DIV out_degree").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        obs = Observation(f"ppr_round_{it}")
        raw = (
            ranks.join(contrib, "node", "left")
            .fillna({"inflow": 0})
            .select(
                "node",
                "out_degree",
                F.expr(
                    f"({damping_pct}L * inflow) DIV 100"
                    f" + CASE WHEN node = {seed}L THEN {teleport}L"
                    f" + ({damping_pct}L * {dangling_val}L) DIV 100 ELSE 0L END"
                ).alias("rank_raw"),
            )
            .observe(
                obs,
                F.coalesce(F.sum("rank_raw"), F.lit(0).cast("bigint")).alias(
                    "s_raw"
                ),
                F.coalesce(
                    F.sum(F.when(F.col("out_degree") == 0, F.col("rank_raw"))),
                    F.lit(0).cast("bigint"),
                ).alias("s_dangling"),
            )
            .localCheckpoint(eager=True)
        )
        got = obs.get
        residue_val = scale - int(got["s_raw"])
        release_checkpoint(prev_ckpt)
        prev_ckpt = raw
        ranks = raw.select(
            "node",
            "out_degree",
            (
                F.col("rank_raw")
                + F.when(is_seed, F.lit(residue_val)).otherwise(F.lit(0))
            ).alias("rank_scaled"),
        )
        dangling_val = int(got["s_dangling"]) + (
            residue_val if seed_dangling else 0
        )
    ranks = ranks.select("node", "out_degree", "rank_scaled").localCheckpoint(eager=True)
    release_checkpoint(prev_ckpt)
    e.unpersist()
    base_nodes.unpersist()
    return ranks


def triangle_stats(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Per-node triangle count, degree and local clustering coefficient
    over an undirected pair graph — the compact-forward / node-ordered
    wedge join (Schank & Wagner '05; the standard MapReduce formulation
    is Suri & Vassilvitskii, *Counting Triangles and the Curse of the
    Last Reducer*, WWW'11).

    Each triangle ``a < b < c`` is enumerated exactly once: wedges are
    built by joining the (min,max)-normalized edge list with itself on
    the middle node (``E(a,b) ⋈ E(b,c)``) and closed against ``E(a,c)``.
    Returns ``(node, degree, triangles, clustering_coeff)`` with
    ``clustering_coeff = 2·triangles / (degree·(degree−1))`` rounded to
    6 decimals (0.0 for degree < 2).

    Scale notes: node-ordered wedging means each wedge is generated at
    its *middle* node with only strictly-ordered neighbors, avoiding the
    3× duplicate enumeration of the naive closed-walk count; the "curse
    of the last reducer" (one celebrity node generating deg² wedges) is
    the known skew risk — at web scale the WWW'11 refinement orders by
    (degree, id) instead of raw id so high-degree nodes sit last and
    generate few wedges; plain id-order is kept here because the oracle
    must replay the exact wedge set in SQL. All three relations shuffle
    on node ids; AQE handles moderate bucket skew."""
    e_raw = pairs.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"),
    )
    edges = e_raw.filter(F.col("u") != F.col("v")).distinct()
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    wedges = (
        edges.alias("e1")
        .join(edges.alias("e2"), F.col("e1.v") == F.col("e2.u"))
        .select(
            F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c")
        )
    )
    closing = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
    triangles = wedges.join(closing, ["a", "c"])
    tri_per_node = (
        triangles.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.join(tri_per_node, "node", "left")
        .fillna({"triangles": 0})
        .select(
            "node",
            "degree",
            "triangles",
            F.when(F.col("degree") < 2, F.lit(0.0))
            .otherwise(
                F.round(
                    F.lit(2.0)
                    * F.col("triangles")
                    / (F.col("degree") * (F.col("degree") - F.lit(1))),
                    6,
                )
            )
            .alias("clustering_coeff"),
        )
    )


def shortest_paths(
    edges: DataFrame,
    source: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Single-source shortest paths (unweighted BFS distances) — the
    canonical recursive-aggregate workload (RaSQL SIGMOD'19 / Pregelix
    VLDB'14 territory) as a frontier-propagating DataFrame loop:
    each round joins ONLY the newly-settled frontier against the edge
    relation, anti-joins out already-settled nodes, and appends the
    survivors at distance+1. Work per round is O(frontier × degree),
    not O(settled × degree) — the semi-naive evaluation a recursive
    CTE's UNION ALL cannot do in Spark.

    Unreachable nodes are absent from the result (no sentinel).
    Terminates when the frontier empties; raises after ``max_iter``
    rounds (bound = graph diameter). Same storage discipline as
    :func:`connected_components`: per-round checkpoints are released
    as soon as they are superseded; the returned settled relation is
    the one retained materialization
    (``session.release_checkpoint`` to free)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint(eager=True)
    spark = edges.sparkSession
    settled = spark.createDataFrame(
        [(source, 0)], "node BIGINT, dist INT"
    ).localCheckpoint(eager=True)
    frontier = settled
    prev_settled, prev_frontier = settled, None
    for it in range(1, max_iter + 1):
        cand = (
            frontier.join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        new = cand.join(settled, "node", "left_anti")
        settled = settled.unionAll(new).localCheckpoint(eager=True)
        frontier = new.localCheckpoint(eager=True)
        n_new = frontier.count()
        release_checkpoint(prev_settled)
        if prev_frontier is not None:
            release_checkpoint(prev_frontier)
        prev_settled, prev_frontier = settled, frontier
        if n_new == 0:
            release_checkpoint(e)
            release_checkpoint(frontier)
            return settled
    raise RuntimeError(f"shortest_paths did not converge in {max_iter} rounds")


def kcore(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    max_iter: int = 60,
) -> DataFrame:
    """k-core decomposition: the maximal subgraph in which every node
    has degree >= k, by iterative peeling (Matula & Beck, JACM'83;
    distributed formulation per Montresor et al., TPDS'13) — remove all
    nodes with degree < k, recompute degrees, repeat to fixpoint.

    Returns (node, core_degree): the surviving nodes with their degree
    INSIDE the core. Each round is one degree aggregation plus two
    semi-joins of the edge relation against the surviving-node set —
    all keyed on node ids, so AQE reuses the exchanges; per-round
    ``localCheckpoint`` + release keeps lineage flat and executor
    storage bounded exactly like :func:`connected_components`. Rounds
    are bounded by the peel depth (small in practice: each round
    removes every node currently below k, not one node at a time). At
    100 TB each round is O(|E|) shuffle work — the standard
    degeneracy-ordering alternative is inherently sequential.

    The input is treated as UNDIRECTED: edges are symmetrized and
    self-loops dropped before the first degree count."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    e = e.localCheckpoint(eager=True)
    prev = e
    n_prev = e.count()
    for _ in range(max_iter):
        deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("a")
        e2 = (
            e.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        # One action per round: this round's count is next round's
        # n_prev (the checkpoint pins the relation, so it can't drift).
        n_now = e2.count()
        release_checkpoint(prev)
        prev = e = e2
        if n_now == n_prev:
            break
        n_prev = n_now
    else:
        release_checkpoint(e)  # same retry-leak hygiene as the CC loop
        raise RuntimeError(f"kcore did not converge in {max_iter} rounds")
    return (
        e.groupBy("a")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .select(F.col("a").alias("node"), "core_degree")
    )


def neighborhood_overlap(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    top_k: int = 20,
) -> DataFrame:
    """Link prediction by neighborhood overlap (Liben-Nowell & Kleinberg,
    *The Link Prediction Problem for Social Networks*, CIKM'03): for
    every NON-adjacent node pair at distance 2, the common-neighbor
    count and the Jaccard coefficient of their neighborhoods —
    ``|N(a) ∩ N(b)| / (|N(a)| + |N(b)| − |N(a) ∩ N(b)|)`` — ranked,
    top ``top_k``. Jaccard is used rather than Adamic-Adar because it
    is a ratio of exact integers (no ``log`` — libm rounding differs
    across engines, the repo-wide determinism rule).

    Shape: the common-neighbor count is the same middle-node wedge
    join as :func:`triangle_stats` (each wedge generated at its middle
    node, ordered endpoints so each candidate pair appears once);
    existing edges are removed with an anti join; degrees come from
    the symmetrized adjacency. The ranking orders by the ROUNDED score
    with (common, a, b) tie-breaks — a total order both engines
    reproduce — and goes through sort+limit so Catalyst compiles
    partial/final TakeOrderedAndProject. At 100 TB the deg² wedge
    skew of celebrity nodes is the known hazard (the same curse-of-
    the-last-reducer note as triangle_stats); production runs cap or
    degree-order the middle node, kept exact here for the oracle.

    The input is treated as UNDIRECTED; self-loops dropped."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    deg = e.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    wedge = (
        e.alias("e1")
        .join(e.alias("e2"), (F.col("e1.a") == F.col("e2.a")) & (F.col("e1.b") < F.col("e2.b")))
        .groupBy(F.col("e1.b").alias("na"), F.col("e2.b").alias("nb"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cand = wedge.join(
        e.select(F.col("a").alias("na"), F.col("b").alias("nb")),
        ["na", "nb"],
        "left_anti",
    )
    da = deg.select(F.col("node").alias("na"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("nb"), F.col("deg").alias("deg_b"))
    scored = (
        cand.join(da, "na")
        .join(db, "nb")
        .select(
            F.col("na").alias("node_a"),
            F.col("nb").alias("node_b"),
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    top = scored.orderBy(
        F.desc("jaccard"), F.desc("n_common"), "node_a", "node_b"
    ).limit(top_k)
    w = Window.orderBy(F.desc("jaccard"), F.desc("n_common"), "node_a", "node_b")
    return top.withColumn("link_rank", F.row_number().over(w))


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara, *Near linear time algorithm to detect community
    structures in large-scale networks*, Phys. Rev. E 2007), the
    deterministic variant: every node starts labeled with its own id;
    each round every node adopts the most frequent label in its CLOSED
    neighborhood (neighbors plus its own current label — the self-vote
    damps the 2-cycle oscillation synchronous LPA exhibits on bipartite
    structures), ties broken by the MINIMUM label. Unlike
    :func:`connected_components` (which this module uses for near-dup
    clusters and which merges everything reachable), LPA splits a
    connected graph into densely-linked groups — the community
    structure of supplier/co-purchase graphs.

    Runs a FIXED ``rounds`` sweeps rather than to convergence: classic
    LPA's stopping rule is order-dependent (and synchronous LPA may
    never converge), so a fixed unrolled round count is what makes the
    result a pure function of the graph — reproducible across engines
    and runs (the registered query's DuckDB oracle replays the same
    rounds literally). Production tuning raises ``rounds`` (label
    influence spreads one hop per round); communities stabilize in a
    handful of sweeps on small-world graphs (op. cit. §4: >95% of
    nodes correctly classified after 5 iterations).

    Scale: each round is one co-keyed equi join (edge dst → label),
    one map-side-combined (node, label) count, and one per-node
    top-1 — expressed as a ``min_by`` HASH aggregation over the
    ordering struct ``(−cnt, label)`` rather than a row_number sort
    window, so no per-round sort and both aggs combine map-side; all
    shuffles keyed on node id, linear in |E|, the same per-round
    discipline as :func:`connected_components`; rounds are a
    constant, not data-dependent. Celebrity-node vote counting is
    groupBy-combined, so skew lands on the combiner, not a single
    reducer. Per-round ``localCheckpoint`` + release keeps lineage
    flat and executor storage bounded. The input is treated as
    UNDIRECTED: edges are symmetrized and self-loops dropped.

    Returns (node, community) for every node with at least one edge;
    ``community`` is the surviving label (a node id)."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    e = e.localCheckpoint(eager=True)
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        nbr = e.join(
            labels.select(F.col("node").alias("b"), "label"), "b"
        ).select(F.col("a").alias("node"), "label")
        votes = nbr.unionByName(labels)
        # min over (−cnt, label) = max count with min-label tie-break
        # (cnt ≥ 1, so the negation can't overflow; labels are distinct
        # per node group, so the struct order is total and the pick
        # deterministic).
        new_labels = (
            votes.groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("node")
            .agg(
                F.min_by(
                    F.col("label"), F.struct((-F.col("cnt")), F.col("label"))
                ).alias("label")
            )
            .localCheckpoint(eager=True)
        )
        release_checkpoint(labels)
        labels = new_labels
    out = labels.select("node", F.col("label").alias("community"))
    release_checkpoint(e)
    return out
