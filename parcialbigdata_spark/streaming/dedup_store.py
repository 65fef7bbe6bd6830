"""Streaming incremental dedup against a persistent fingerprint store.

The online complement of the batch ``incremental_dedup_documents``
query: documents arrive as a stream, each micro-batch is deduplicated
against every document ever accepted (cross-run exact dedup), survivors
are appended to the corpus sink and their fingerprints to the store.
This is the ingest-time shape of corpus dedup — dedup-at-arrival
instead of a periodic full-corpus pass.

Semantics and 100 TB notes:

- Fingerprints are the canonical 16-byte md5 of normalized text
  (``functions.text.fingerprint``) — the anti-join against the store
  shuffles fingerprints, never document text.
- Within a batch, the survivor is the MIN id per fingerprint
  (deterministic; same rule as batch canonical dedup).
- Exactly-once on the SOURCE side comes from checkpointed offsets.
  The two appends (docs, fingerprints) are at-least-once on retry; a
  replayed batch can re-append fingerprints, which is harmless (the
  anti-join only asks set membership), and can re-append documents —
  downstream readers get exact-once by keying on ``id`` (or run the
  batch canonical dedup as a compaction). This is the standard
  foreachBatch idempotence contract, stated rather than hidden.
- The store grows one 16-byte key per accepted doc; compact it
  periodically (coalesce + rewrite) the same way streaming state
  stores checkpoint — at 10⁹ docs it is ~16 GB of parquet, trivially
  broadcastable no longer but still a cheap anti-join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from parcialbigdata_spark.functions import text as T


def dedup_batch_applier(store_path: str, out_path: str, id_col: str = "doc_id", text_col: str = "text"):
    """foreachBatch body: anti-join the batch against the fingerprint
    store, keep the min-id survivor per fingerprint inside the batch,
    append survivors to ``out_path`` and their fingerprints to
    ``store_path``."""

    def apply(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        fp = batch_df.withColumn("fp", T.fingerprint(F.col(text_col)))
        try:
            store = spark.read.parquet(store_path).select("fp")
            fresh = fp.join(store, "fp", "left_anti")
        except AnalysisException:
            fresh = fp  # first batch: store does not exist yet
        w = Window.partitionBy("fp").orderBy(id_col)
        survivors = (
            fresh.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # Survivors are tiny relative to the stream? No — they can be
        # the whole batch; both writes stay distributed appends. The
        # two writes are two actions over the same plan — persist so
        # the store read + anti-join + window dedup run once per batch,
        # not twice (ADVICE r3).
        survivors = survivors.persist()
        try:
            survivors.drop("fp").write.mode("append").parquet(out_path)
            survivors.select("fp").write.mode("append").parquet(store_path)
        finally:
            survivors.unpersist()

    return apply


def stream_dedup_to_corpus(
    doc_stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Wire a streaming DataFrame of documents through
    :func:`dedup_batch_applier` with an availableNow trigger; returns
    the started query (caller awaits/stops)."""
    return (
        doc_stream.writeStream.foreachBatch(
            dedup_batch_applier(store_path, out_path, id_col, text_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_streaming_minhash_index(
    spark,
    stream_dir: str,
    bands_table: str,
    sets_table: str,
    threshold: float = 0.2,
    num_hashes: int = 32,
    bands: int = 8,
    k_shingle: int = 2,
    timeout: float = 240.0,
    pairs_dir: str | None = None,
) -> DataFrame:
    """Streaming NEAR-dup dedup-at-arrival — the minhash sibling of
    :func:`stream_dedup_to_corpus`'s exact-fingerprint store, and the
    ONLINE driver of the batch index pair ``operators/dedup.py
    minhash_index_ingest``/``minhash_index_probe``: documents arrive
    as a file stream, each micro-batch is shingled ONCE, probed
    against the persisted banded index (history never re-shingled —
    only the batch side shuffles through the bucketed band join),
    its verified (new_id, old_id, jaccard_sim) pairs emitted, and the
    batch appended to the index. The first batch SEEDS the index and
    probes nothing (there is no history to match).

    Stream/batch agreement contract: on the same ordered batches this
    returns exactly what the batch replay of ingest→probe→append
    returns — the registered query shares its oracle with the batch
    twin ``dedup_index_probe_documents``.

    foreachBatch idempotence, OUTPUT INCLUDED (r10): seed-vs-append is
    keyed on ``epoch_id == 0`` (not a driver-side flag, so a
    checkpoint-recovered replay of batch 0 re-runs in overwrite mode
    instead of clobbering an already-appended index), and each epoch's
    verified pairs are written — DISTRIBUTED, never collected — to
    ``pairs_dir/epoch_<id>/`` in overwrite mode, so a replayed batch
    overwrites exactly its own output directory. The returned
    DataFrame is a parquet READ of the pairs sink: pairs stay
    output-sized and executor-resident end to end (the r9 version
    accumulated every batch's pairs in a driver-side list — a driver
    OOM at production dup rates). The index tables carry the
    data-sized state; the pairs sink carries the result."""
    import os
    import tempfile

    from pyspark.sql.types import DoubleType, StructField, StructType

    from parcialbigdata_spark.operators.dedup import (
        minhash_index_ingest,
        minhash_index_probe,
    )

    first_file = sorted(
        f for f in os.listdir(stream_dir) if f.endswith(".parquet")
    )[0]
    doc_schema = spark.read.parquet(os.path.join(stream_dir, first_file)).schema
    if pairs_dir is None:
        pairs_dir = tempfile.mkdtemp(prefix="minhash-pairs-")
    pair_schema = StructType(
        [
            StructField("new_id", doc_schema["doc_id"].dataType),
            StructField("old_id", doc_schema["doc_id"].dataType),
            StructField("jaccard_sim", DoubleType()),
        ]
    )

    def _probe_and_ingest(batch_df: DataFrame, epoch_id: int) -> None:
        from parcialbigdata_spark.operators.dedup import (
            minhash_batch_relations,
            shingle_rows,
        )

        seed = epoch_id == 0  # replay-safe: recovery re-runs epoch 0
        # Shingle the batch ONCE per micro-batch (r14) and, on probing
        # epochs, derive its band/set relations ONCE too (r15): probe
        # and ingest share all three persisted relations, so the
        # tokenize, the 32-minhash signature fold and the collect_set
        # each run once per micro-batch instead of once per operator
        # call. Released before the batch commits, so no cache
        # outlives its micro-batch. The seed epoch only ingests — the
        # derived relations have a single consumer there, so only the
        # shingle cache (two consumers inside ingest) is persisted.
        rows = shingle_rows(batch_df, "doc_id", "text", k_shingle).persist()
        caches = [rows]
        if seed:  # nothing to probe; write the empty frame so the
            p = batch_df.sparkSession.createDataFrame([], pair_schema)
            ingest_kwargs = {"precomputed_rows": rows}
        else:     # pairs read always has files + schema
            bb, sh = minhash_batch_relations(
                rows, "doc_id", num_hashes=num_hashes, bands=bands
            )
            bb, sh = bb.persist(), sh.persist()
            caches += [bb, sh]
            ingest_kwargs = {"precomputed_bands": bb, "precomputed_sets": sh}
            p = minhash_index_probe(
                batch_df,
                "doc_id",
                "text",
                bands_table,
                sets_table,
                threshold=threshold,
                num_hashes=num_hashes,
                bands=bands,
                k_shingle=k_shingle,
                precomputed_rows=rows,
                **ingest_kwargs,
            )
        # Per-epoch overwrite directory == output idempotence: a
        # foreachBatch retry rewrites its own epoch dir, no dupes.
        p.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"epoch_{int(epoch_id)}")
        )
        minhash_index_ingest(
            batch_df,
            "doc_id",
            "text",
            bands_table,
            sets_table,
            num_hashes=num_hashes,
            bands=bands,
            k_shingle=k_shingle,
            append=not seed,
            **ingest_kwargs,
        )
        for c in reversed(caches):
            c.unpersist()  # one batch of caches per micro-batch —
            # release, don't leak

    q = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .writeStream.foreachBatch(_probe_and_ingest)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    if q.isActive:
        q.stop()
        raise RuntimeError(
            f"streaming minhash index drain did not finish within {timeout}s; "
            "refusing to return a partial pair set"
        )
    return spark.read.schema(pair_schema).parquet(
        os.path.join(pairs_dir, "epoch_*")
    )
