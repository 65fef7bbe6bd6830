"""Generate a larger synthetic fixture by FK-preserving replication.

Usage: python tools/gen_scaled_fixture.py [src_dir] [dst_dir] [factor]
       (defaults: /root/testdata/sf0.1  /tmp/sf1  10)

The driver ships fixtures only up to sf0.1; the 100× scale claims in
the plan audits deserve at least one EXECUTED data point at a bigger
size (round-5 verdict item #4). This replicates every table ``factor``
times with disjoint key ranges so all FK joins keep exactly their
original per-key fan-outs — row counts scale linearly, key
cardinalities scale linearly, per-key group sizes stay constant, i.e.
the same distributional shape at N× the data (what a time-partitioned
production corpus growing N× actually looks like).

Content columns are handled so workload CHARACTER is preserved, not
just row counts:

- ``documents.text`` is word-salted per replica (every token gets a
  ``_<rep>`` suffix): within-replica shingle/Jaccard structure is
  IDENTICAL to the original, across-replica similarity is zero.
  Naively copying text would multiply every LSH bucket and near-dup
  cluster by ``factor`` and turn the linear-by-design dedup operators
  into quadratic blowups that no real corpus exhibits. ``n_chars`` is
  recomputed from the salted text.
- ``events.user_id`` is offset per replica: user count scales, per-user
  session/event counts stay constant (horizontal growth).
- ``embeddings`` vectors are copied as-is (ANN/PQ throughput is linear
  in rows regardless of values; the planted-cluster recall fixtures
  remain the correctness story).
- ``nation``/``region`` are fixed-size dims and copied once, so
  broadcast-ability at scale is represented honestly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from parcialbigdata_spark.session import get_spark  # noqa: E402
from parcialbigdata_spark.sources.tables import load_table  # noqa: E402


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("gen-scaled-fixture")
    os.makedirs(dst, exist_ok=True)

    reps = spark.range(factor).withColumnRenamed("id", "__rep")

    def stride(table: str, col: str) -> int:
        return load_table(spark, src, table).agg(F.max(col)).first()[0] + 1

    C = stride("customer", "c_custkey")
    O = stride("orders", "o_orderkey")  # noqa: E741
    P = stride("part", "p_partkey")
    S = stride("supplier", "s_suppkey")
    E = stride("events", "event_id")
    U = stride("events", "user_id")
    D = stride("documents", "doc_id")
    V = stride("embeddings", "vec_id")

    def write(table: str, df, files: int) -> None:
        out = os.path.join(dst, f"{table}.parquet")
        df.coalesce(files).write.mode("overwrite").parquet(out)
        print(f"{table}: {spark.read.parquet(out).count()} rows -> {out}")

    def replicate(table: str, offsets: dict[str, int]):
        df = load_table(spark, src, table).crossJoin(F.broadcast(reps))
        for col, s in offsets.items():
            df = df.withColumn(col, F.col(col) + F.col("__rep") * F.lit(s))
        return df.drop("__rep")

    write("customer", replicate("customer", {"c_custkey": C}), 4)
    write("orders", replicate("orders", {"o_orderkey": O, "o_custkey": C}), 8)
    write(
        "lineitem",
        replicate(
            "lineitem", {"l_orderkey": O, "l_partkey": P, "l_suppkey": S}
        ),
        16,
    )
    write("part", replicate("part", {"p_partkey": P}), 4)
    write("supplier", replicate("supplier", {"s_suppkey": S}), 1)
    write("events", replicate("events", {"event_id": E, "user_id": U}), 8)

    docs = replicate("documents", {"doc_id": D})
    # Word-salt per replica (see module docstring). The original text
    # column is read once; the salted text reuses the replica id the
    # key offset consumed, so recompute it from doc_id.
    rep = F.expr(f"doc_id div {D}")  # integer div: exact past 2^53
    salted = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.concat(w, F.lit("_"), rep.cast("string")),
        ),
        " ",
    )
    docs = docs.withColumn("text", salted).withColumn(
        "n_chars", F.length("text")
    )
    write("documents", docs, 8)

    write("embeddings", replicate("embeddings", {"vec_id": V}), 4)
    for small in ("nation", "region"):
        write(small, load_table(spark, src, small), 1)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
