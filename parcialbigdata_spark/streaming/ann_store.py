"""Streaming embedding-ANN dedup/search-at-arrival against a
persistent IVF cell index.

The embedding sibling of ``streaming/dedup_store.py
run_streaming_minhash_index`` and the ONLINE driver of the batch pair
``operators/similarity.ivf_index_ingest``/``ivf_index_probe``:
embedding batches arrive as a file stream, each micro-batch is
cell-assigned ONCE (one Arrow matmul), probed for its k nearest
historical neighbors through the bucketed cell join (only the batch
side shuffles — history is never re-assigned or re-shuffled), its
(query_id, match_id, cosine_sim, rank) matches emitted, and the batch
appended to the index. The first batch SEEDS the index and probes
nothing.

Built on the r10 output-idempotence discipline from day one:
seed-vs-append keys on ``epoch_id == 0`` and each epoch's matches are
written DISTRIBUTED to ``matches_dir/epoch_<id>/`` in overwrite mode,
so a foreachBatch replay rewrites exactly its own directory and the
returned DataFrame is a parquet read of the sink — no driver-side
accumulation anywhere (matches are output-sized, k × batch rows).

The centroid matrix is the INDEX DEFINITION — fit once by the caller
(``similarity.ivf_fit_centroids`` on the seed corpus) and passed in;
every batch must use the same centroids or probe cells stop matching
stored cells (the hash-family contract shared with the minhash
index's num_hashes/bands/k_shingle).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)


def run_streaming_ivf_index(
    spark,
    stream_dir: str,
    cells_table: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    timeout: float = 240.0,
    matches_dir: str | None = None,
) -> DataFrame:
    """Drain ``stream_dir`` (one parquet file per micro-batch, mtime
    order) through probe-then-ingest against ``cells_table``; returns
    the distributed (query_id, match_id, cosine_sim, rank) relation
    of every post-seed batch's k-NN matches vs the history as of its
    arrival. Stream/batch agreement: on the same ordered batches this
    equals the batch replay of ingest→probe→append."""
    from parcialbigdata_spark.operators.similarity import (
        ivf_index_ingest,
        ivf_index_probe,
    )

    first_file = sorted(
        f for f in os.listdir(stream_dir) if f.endswith(".parquet")
    )[0]
    schema = spark.read.parquet(os.path.join(stream_dir, first_file)).schema
    if matches_dir is None:
        matches_dir = tempfile.mkdtemp(prefix="ivf-matches-")
    match_schema = StructType(
        [
            StructField("query_id", schema[id_col].dataType),
            StructField("match_id", schema[id_col].dataType),
            StructField("cosine_sim", DoubleType()),
            StructField("rank", IntegerType()),
        ]
    )

    def _probe_and_ingest(batch_df: DataFrame, epoch_id: int) -> None:
        seed = epoch_id == 0
        if seed:
            m = batch_df.sparkSession.createDataFrame([], match_schema)
        else:
            m = ivf_index_probe(
                batch_df,
                cells_table,
                centroids,
                id_col=id_col,
                vec_col=vec_col,
                k=k,
                nprobe=nprobe,
            )
        m.write.mode("overwrite").parquet(
            os.path.join(matches_dir, f"epoch_{int(epoch_id)}")
        )
        ivf_index_ingest(
            batch_df,
            cells_table,
            centroids,
            id_col=id_col,
            vec_col=vec_col,
            append=not seed,
        )

    q = (
        spark.readStream.schema(schema)
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
            f"streaming ivf index drain did not finish within {timeout}s; "
            "refusing to return a partial match set"
        )
    return spark.read.schema(match_schema).parquet(
        os.path.join(matches_dir, "epoch_*")
    )
