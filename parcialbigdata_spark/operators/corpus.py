"""Corpus-preparation operators for LLM training-data pipelines.

North-star surface (SURVEY.md §2.10): the operations a 100 TB
pretraining-data pipeline runs between raw scrape and tokenizer —
benchmark decontamination and document chunking. Both are pure
DataFrame compositions (no UDFs): the hot path is explode → hash →
join/agg, all whole-stage-codegen, all map-side-combined.

The reference repo (juancho3104/parcialBigdata) has no corpus ops; its
transform is a per-listing HTML parse (download_lambda.py:98-114).
These operators extend the rebuilt engine the way SURVEY.md §2.10
prescribes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parcialbigdata_spark.functions import text as T


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing ANY word
    ``k``-gram with a benchmark/eval set (the standard n-gram-overlap
    decontamination used for pretraining corpora).

    Plan shape (the part that must hold at 100 TB):

    - Both sides shingle row-locally (``functions.text.shingles`` —
      sequence+transform, no explode until after the narrow map).
    - Grams travel as 8-byte ``xxhash64`` ints, never strings: the
      shuffle/broadcast carries ``8 B × grams``, independent of gram
      text length.
    - The benchmark side is collapsed to DISTINCT gram hashes — its
      size is ``O(benchmark tokens)``, tiny next to the corpus, so it
      broadcasts (hint on by default; AQE drops to shuffled-hash if an
      enormous benchmark exceeds the threshold when
      ``broadcast_benchmark=False``).
    - The corpus side LEFT-joins gram→gram and aggregates matches per
      doc: one shuffle of (id, gram-hash) pairs when broadcast is on,
      zero extra passes over full text.

    Returns (id, matched_grams, contaminated) — one row per corpus doc.
    """
    toks = T.tokens(T.normalize(text_col)).alias("__toks")
    gram = F.explode(T.shingles_from_tokens(F.col("__toks"), k=k)).alias("gram")
    corpus_grams = (
        corpus.select(F.col(id_col), toks)
        .select(F.col(id_col), gram)
        .select(id_col, F.xxhash64("gram").alias("gh"))
    )
    bench_grams = (
        benchmark.select(toks)
        .select(gram)
        .select(F.xxhash64("gram").alias("gh"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    matched = (
        corpus_grams.join(bench_grams, "gh", "left")
        .groupBy(id_col)
        .agg(F.count_distinct(F.when(F.col("hit").isNotNull(), F.col("gh"))).alias("matched_grams"))
    )
    # Left join back so docs with no grams at all (empty text) survive
    # with matched_grams = 0 — decontamination must not drop rows.
    return (
        corpus.select(id_col)
        .join(matched, id_col, "left")
        .select(
            id_col,
            F.coalesce("matched_grams", F.lit(0)).alias("matched_grams"),
            (F.coalesce("matched_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    stride: int = 24,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap —
    the standard pre-tokenization chunking pass (context-length
    packing feeds from these chunks).

    Row-local until the final explode: tokenization, window starts
    (``sequence(0, n-1, stride)``) and slices are array expressions
    inside one narrow projection, so the only data growth is the
    emitted chunks themselves (~``n/stride`` rows per doc). No shuffle,
    no UDF; at 100 TB this is a single scan.

    Empty documents produce zero chunks. The last chunk may be shorter
    than ``chunk_tokens``; chunks starting past the end are never
    emitted (``sequence`` stops at ``n-1``).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.col("__toks")
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        starts, lambda s: F.slice(toks, s + F.lit(1), chunk_tokens)
    )
    keep = list(keep_cols or [])
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        T.tokens(text_col).alias("__toks"),
    ).select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.posexplode(chunks).alias("chunk_idx", "chunk_toks"),
    ).select(
        id_col,
        *keep,
        "chunk_idx",
        F.concat_ws(" ", "chunk_toks").alias("chunk_text"),
        F.size("chunk_toks").alias("n_tokens"),
    )


def pack_chunks(
    chunks: DataFrame,
    part_col: str,
    order_cols: list[str],
    token_col: str = "n_tokens",
    budget: int = 256,
) -> DataFrame:
    """Assign chunks to ~``budget``-token packs (sequence packing — the
    pass that fills fixed-size context windows before training).

    Deterministic streaming-greedy spec: within each ``part_col``
    stream, ordered by ``order_cols``, a chunk joins pack
    ``floor(tokens_before_it / budget)``. One window over one shuffle
    on ``part_col``; a pack can overflow by at most one chunk (the
    straddling chunk stays in the earlier pack), which is the standard
    trade for a single-pass distributed packer.

    Skew note: ``part_col`` streams are processed serially per
    partition — at 10⁹-document scale use a composite stream key
    (e.g. lang × doc_id range) so no single stream dominates.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return chunks.withColumn("pack_id", F.floor(cum_before / budget))


def boilerplate_prune(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    segment_tokens: int = 10,
    max_doc_freq: int = 1,
) -> DataFrame:
    """Repeated-segment (boilerplate) pruning, RefinedWeb/C4-line-dedup
    style: split every document into fixed non-overlapping token
    segments, count how many DISTINCT documents each segment occurs in,
    and drop segments whose document frequency exceeds ``max_doc_freq``
    (navigation chrome, license banners, templated headers — anything
    shared across documents).

    Returns one row per document that produced ≥1 segment:
    ``(id, n_segments, n_pruned, kept_tokens, kept_md5)`` where
    ``kept_md5`` is the md5 of the surviving text reassembled in
    segment order — a byte-parity attestation of the pruned document,
    engine-portable (md5 + space joins only).

    Plan shape at 100 TB:
    - segmentation reuses :func:`chunk_documents` (row-local slices,
      no shuffle, no UDF);
    - the document-frequency pass groups on the 16-byte md5 of the
      segment — two-phase agg, map-side combined, shuffle volume
      O(16 B × segments), never the text;
    - frequencies join back to segments on the same md5 key, so the
      join reuses the aggregation's hash partitioning (no extra
      shuffle of the big side under AQE);
    - per-document reassembly is one more narrow agg; segment order is
      restored with ``sort_array`` over (idx, text) structs — per-doc
      arrays, bounded by document length, never a global sort.
    """
    segs = chunk_documents(
        df, id_col, text_col, chunk_tokens=segment_tokens, stride=segment_tokens
    ).select(
        F.col(id_col), "chunk_idx", "chunk_text", "n_tokens",
        F.md5("chunk_text").alias("fp"),
    )
    freq = segs.groupBy("fp").agg(F.count_distinct(F.col(id_col)).alias("df"))
    tagged = segs.join(freq, "fp").withColumn(
        "__pruned", (F.col("df") > max_doc_freq).cast("int")
    )
    kept_struct = F.when(
        F.col("__pruned") == 0, F.struct("chunk_idx", "chunk_text")
    )
    return (
        tagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("__pruned").alias("n_pruned"),
            F.sum(
                F.when(F.col("__pruned") == 0, F.col("n_tokens")).otherwise(F.lit(0))
            ).alias("kept_tokens"),
            F.sort_array(F.collect_list(kept_struct)).alias("__kept"),
        )
        .select(
            id_col,
            "n_segments",
            "n_pruned",
            "kept_tokens",
            F.md5(
                F.array_join(
                    F.transform(F.col("__kept"), lambda s: s.chunk_text), " "
                )
            ).alias("kept_md5"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    content_cols: "list[str]",
) -> DataFrame:
    """Dataset-version diff — the audit primitive behind corpus
    releases ("what changed between snapshot N and N+1"): classify
    every key as ``added`` / ``removed`` / ``changed`` / ``unchanged``
    by comparing md5 fingerprints of the content columns across two
    snapshots.

    One full outer join on the key; fingerprints reduce arbitrary-width
    content to 16 bytes BEFORE the shuffle, so the join carries
    (key, fp) pairs rather than document bodies — at 100 TB the diff
    costs two fingerprint scans plus a key-partitioned join, and the
    same fp column doubles as the incremental-dedup store key
    (streaming/dedup_store.py). NULL content columns fold into the
    fingerprint as an empty segment (coalesce) so a NULL→'' flip is
    invisible but NULL→'x' is a change — documented, deterministic,
    and identical in the SQL oracle replay."""
    sep = F.lit("\x1f")

    def fp(df: DataFrame) -> DataFrame:
        parts: list = []
        for c in content_cols:
            parts.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
            parts.append(sep)
        return df.select(F.col(key_col), F.md5(F.concat(*parts[:-1])).alias("fp"))

    o = fp(old).withColumnRenamed("fp", "fp_old")
    n = fp(new).withColumnRenamed("fp", "fp_new")
    joined = o.join(n, key_col, "full_outer")
    status = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") == F.col("fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(F.col(key_col), status.alias("status"))


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search over a POSITIONAL inverted index — the
    adjacency-aware sibling of the bag-of-words retrieval family
    (``inverted_index_terms`` counts, ``bm25_top_documents`` ranks;
    neither can distinguish "hash join" from "join ... hash"). The
    postings relation is (doc, term, pos) via ``posexplode``,
    FILTERED to the phrase's own terms before anything joins — at
    100 TB that filter is the whole game: the join inputs shrink from
    corpus-token volume to the phrase terms' posting lists, exactly
    what a serving-side index lookup touches. A k-token phrase then
    needs k−1 co-keyed equi-joins on (doc, pos + i) — positions are
    data, adjacency is a join predicate, no UDF, no regex rescan of
    the text.

    Returns (id_col, n_matches) for documents with ≥ 1 occurrence;
    overlapping occurrences count separately (the standard positional
    semantics: "a a a" matches "a a" twice)."""
    if len(phrase) < 2:
        raise ValueError("phrase_search needs ≥ 2 tokens (use a filter for 1)")
    terms = [t.lower() for t in phrase]
    postings = (
        docs.select(
            F.col(id_col),
            F.posexplode(T.tokens(F.lower(F.col(text_col)))).alias(
                "pos", "term"
            ),
        )
        .filter(F.col("term").isin(list(set(terms))))
    )
    out = postings.filter(F.col("term") == terms[0]).select(
        id_col, F.col("pos").alias("__p0")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = postings.filter(F.col("term") == t).select(
            F.col(id_col), (F.col("pos") - i).alias("__p0")
        )
        out = out.join(nxt, [id_col, "__p0"])
    return out.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_matches"))
