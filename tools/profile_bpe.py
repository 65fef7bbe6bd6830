"""One-off profile for VERDICT r6 item 5: why is
``bpe_merge_pairs_documents`` the steepest sf0.1->sf1 ratio (5.73x for
10x data)?

Facts to establish: exploded pair volume, distinct pair-key
cardinality (the scaled fixture word-salts each replica, so the pair
vocabulary should grow ~10x — partial aggs reduce less when keys grow
with data), tokenize-only cost, count-only cost (shuffle agg without
the top-k), and the full query, at both scales.

Usage: python tools/profile_bpe.py [sf1_dir]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parcialbigdata_spark.functions import text as T  # noqa: E402
from parcialbigdata_spark.queries import QUERIES  # noqa: E402
from parcialbigdata_spark.session import get_spark  # noqa: E402
from parcialbigdata_spark.sources.tables import load_table  # noqa: E402


def timed(label, thunk):
    t0 = time.monotonic()
    out = thunk()
    sec = time.monotonic() - t0
    print(json.dumps({"measure": label, "sec": round(sec, 3), "out": out}))
    return sec


def pairs_exploded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(T.tokens(F.lower(F.col("text"))).alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(element_at(toks, i) AS left_tok,"
                    "             element_at(toks, i + 1) AS right_tok))"
                )
            ).alias("p")
        )
        .select("p.left_tok", "p.right_tok")
    )


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    sf01 = "/root/testdata/sf0.1"
    spark = get_spark("profile-bpe")

    for sf_name, sf_dir in (("sf0.1", sf01), ("sf1", sf1)):
        docs = load_table(spark, sf_dir, "documents")
        timed(
            f"{sf_name} tokenize-only (sum of sizes)",
            lambda: docs.select(
                T.tokens(F.lower(F.col("text"))).alias("toks")
            )
            .agg(F.sum(F.size("toks")))
            .collect()[0][0],
        )
        p = pairs_exploded(spark, sf_dir)
        timed(f"{sf_name} exploded pair rows", lambda: p.count())
        timed(
            f"{sf_name} distinct pair keys",
            lambda: p.select("left_tok", "right_tok").distinct().count(),
        )
        timed(
            f"{sf_name} count-only (groupBy, no topk)",
            lambda: p.groupBy("left_tok", "right_tok").count().count(),
        )
        timed(
            f"{sf_name} current full query",
            lambda: len(
                QUERIES["bpe_merge_pairs_documents"](spark, sf_dir).collect()
            ),
        )
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
