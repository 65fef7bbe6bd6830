"""Scale-layout tests: bucketed joins plan without exchanges; salted
joins and two-phase aggs return the same answers as their plain forms."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from parcialbigdata_spark.operators import skew
from parcialbigdata_spark.plans import audit_plan
from parcialbigdata_spark.sources.tables import load_table
from parcialbigdata_spark.sources.warehouse import (
    bucket_join_ready,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("wh")
    write_bucketed(
        load_table(spark, SF, "orders"),
        "orders_b",
        "o_orderkey",
        num_buckets=4,
        path=str(wh / "orders_b"),
    )
    write_bucketed(
        load_table(spark, SF, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        num_buckets=4,
        path=str(wh / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """The whole point of bucketing: both sides pre-hashed on the join
    key → bucket-local join, zero shuffles. Auto-broadcast is disabled
    for the assertion — at fixture scale Catalyst would (rightly)
    broadcast instead, which hides the bucket-locality being tested."""
    oa, lb = bucketed_tables
    assert bucket_join_ready(spark, oa, lb, "o_orderkey")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(oa)
            .join(spark.table(lb), "o_orderkey")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        a = audit_plan(joined)
        assert a["n_sortmerge_joins"] + a["n_shuffled_hash_joins"] >= 1
        # Only the final aggregation may shuffle; the join itself must not.
        assert a["n_exchanges"] <= 1
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    oa, lb = bucketed_tables
    bucketed = spark.table(oa).join(spark.table(lb), "o_orderkey").count()
    plain = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey",
        )
        .count()
    )
    assert bucketed == plain


def test_salted_join_matches_plain(spark):
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(cust, "o_custkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").cast("long").alias("s")
    ).first()
    salted = skew.salted_join(orders, cust, "o_custkey", salt=4).agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").cast("long").alias("s")
    ).first()
    assert (salted.n, salted.s) == (plain.n, plain.s)


def test_salted_join_preserves_columns(spark):
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer").withColumnRenamed("c_custkey", "o_custkey")
    out = skew.salted_join(orders, cust, "o_custkey", salt=4)
    assert "__salt" not in out.columns
    assert set(out.columns) == set(orders.columns) | (set(cust.columns) - {"o_custkey"})


def test_two_phase_agg_matches_plain(spark):
    ev = load_table(spark, SF, "events")
    plain = {
        (r.event_type, r.n, round(r.s, 6))
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
        )
        .collect()
    }
    two = {
        (r.event_type, r.n, round(r.s, 6))
        for r in skew.two_phase_agg(
            ev,
            "event_type",
            {
                "n": F.count(F.lit(1)),
                "s": F.sum(F.col("value").cast("decimal(18,6)")),
            },
            {"n": F.sum("n"), "s": F.sum("s").cast("double")},
            salt=4,
        ).collect()
    }
    assert two == plain


def test_aqe_splits_skewed_join(spark):
    """Scale claim in SCALE.md §2: AQE splits skewed shuffle-join
    partitions at runtime. Thresholds are lowered so local-scale data
    exhibits the behavior; the mechanism is identical at 100 TB."""
    from pyspark.sql import functions as F

    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    )
    old = {k: conf.get(k) for k in keys}
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        # 50% of rows share key 0; incompressible pad so shuffle bytes
        # reflect row counts.
        left = spark.range(300_000).select(
            F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 1000).alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(1000).select(F.col("id").alias("k"), F.lit("r").alias("rv"))
        joined = left.join(right, "k")
        n = len(joined.collect())
        assert n == 300_000
        # collect() finalizes THIS DataFrame's adaptive plan; count()
        # would execute a different QueryExecution.
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            conf.set(k, v)


def test_write_sorted_gives_disjoint_file_ranges_and_skipping(spark, tmp_path):
    """write_sorted must produce files with disjoint key ranges (tight
    parquet min/max stats), and a selective scan over that layout must
    read fewer rows than a full scan would — the data-skipping payoff."""
    import pyarrow.parquet as pq

    from parcialbigdata_spark.sources.warehouse import write_sorted

    out = str(tmp_path / "events_sorted")
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    write_sorted(ev, out, ["user_id"], num_files=4)

    ranges = []
    for f in sorted((tmp_path / "events_sorted").glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["user_id"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 4
    for (lo_a, hi_a), (lo_b, hi_b) in zip(sorted(ranges), sorted(ranges)[1:]):
        assert hi_a <= lo_b  # disjoint (range partitioner boundary keys may touch)

    # Round-trip correctness: layout change must not change the data.
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert back.agg(F.sum("value")).first()[0] == pytest.approx(
        ev.agg(F.sum("value")).first()[0]
    )


def test_runtime_bloom_filter_injected(spark):
    """With the thresholds lowered to local scale, a selective dim-side
    filter must inject a runtime bloom filter on the fact side's join
    key — at 100 TB this prunes shuffle input before the join."""
    thresholds = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # keep the join shuffled
    }
    old = {k: spark.conf.get(k) for k in thresholds}
    try:
        for k, v in thresholds.items():
            spark.conf.set(k, v)
        orders = load_table(spark, SF, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
        li = load_table(spark, SF, "lineitem")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan or "BloomFilter" in plan or "might_contain" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_write_training_shards_matches_shuffle_order(spark, tmp_path):
    """The shard writer must realize exactly the order contract of the
    shuffle_order_documents query: one sorted JSONL file per shard
    directory, and (shard, in-file position) identical to the query's
    (shard, pos) for every doc."""
    import json
    import pathlib

    from parcialbigdata_spark.queries import QUERIES
    from parcialbigdata_spark.sources.warehouse import write_training_shards

    docs = load_table(spark, SF, "documents")
    h = F.md5(F.concat(F.lit("ord-"), F.col("doc_id").cast("string")))
    out = str(tmp_path / "shards")
    write_training_shards(
        docs.select("doc_id", h.alias("h")), out, order_key="h", num_shards=8
    )

    expect = {
        (r.shard, r.pos): r.doc_id
        for r in QUERIES["shuffle_order_documents"](spark, SF).collect()
    }

    got = {}
    shard_dirs = sorted(pathlib.Path(out).glob("shard=*"))
    assert shard_dirs, "no shard directories written"
    for d in shard_dirs:
        shard = int(d.name.split("=")[1])
        files = [p for p in d.iterdir() if p.suffix == ".json"]
        assert len(files) == 1, f"expected exactly one file in {d}"
        with open(files[0]) as fh:
            for pos, line in enumerate(fh, start=1):
                got[(shard, pos)] = json.loads(line)["doc_id"]
    assert got == expect


def test_merge_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    """merge_upsert: updates win, deletes drop, new partitions appear —
    and the untouched partition's files are byte-identical afterwards."""
    import pathlib

    from parcialbigdata_spark.sources.warehouse import merge_upsert

    base_path = str(tmp_path / "fact")
    base = spark.createDataFrame(
        [
            (1, "2024-01-01", 10.0),
            (2, "2024-01-01", 20.0),
            (3, "2024-01-02", 30.0),
            (4, "2024-01-03", 40.0),
        ],
        "id bigint, dt string, amount double",
    )
    base.repartition(1).write.partitionBy("dt").parquet(base_path)

    untouched = sorted(
        (p.name, p.stat().st_mtime, p.stat().st_size)
        for p in pathlib.Path(base_path, "dt=2024-01-03").glob("*.parquet")
    )
    assert untouched

    updates = spark.createDataFrame(
        [
            (1, "2024-01-01", 11.0, False),   # update
            (5, "2024-01-01", 50.0, False),   # insert, existing partition
            (3, "2024-01-02", 0.0, True),     # delete
            (6, "2024-01-04", 60.0, False),   # insert, NEW partition
        ],
        "id bigint, dt string, amount double, deleted boolean",
    )
    merge_upsert(
        spark,
        base_path,
        updates,
        key_cols=["id"],
        partition_cols=["dt"],
        delete_col="deleted",
    )

    got = {
        r["id"]: (r["dt"], r["amount"])
        for r in spark.read.parquet(base_path)
        .withColumn("dt", F.col("dt").cast("string"))
        .collect()
    }
    assert got == {
        1: ("2024-01-01", 11.0),
        2: ("2024-01-01", 20.0),
        4: ("2024-01-03", 40.0),
        5: ("2024-01-01", 50.0),
        6: ("2024-01-04", 60.0),
    }
    after = sorted(
        (p.name, p.stat().st_mtime, p.stat().st_size)
        for p in pathlib.Path(base_path, "dt=2024-01-03").glob("*.parquet")
    )
    assert after == untouched, "untouched partition was rewritten"


def test_stream_cdc_apply_foreachbatch(spark, tmp_path):
    """CDC apply: a stream of change batches applied to the warehouse
    through foreachBatch(merge_upsert) — the streaming write path of
    the lakehouse pattern. Batches must apply in arrival order (later
    update wins)."""
    import os
    import time

    from parcialbigdata_spark.sources.warehouse import merge_upsert

    base_path = str(tmp_path / "fact")
    spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-02", 20.0)],
        "id bigint, dt string, amount double",
    ).repartition(1).write.partitionBy("dt").parquet(base_path)

    cdc_dir = tmp_path / "cdc"
    cdc_dir.mkdir()
    schema = "id bigint, dt string, amount double, deleted boolean"
    spark.createDataFrame(
        [(1, "2024-01-01", 11.0, False), (3, "2024-01-03", 30.0, False)], schema
    ).coalesce(1).write.parquet(str(cdc_dir / "b1.parquet"))
    spark.createDataFrame(
        [(1, "2024-01-01", 12.0, False), (2, "2024-01-02", 0.0, True)], schema
    ).coalesce(1).write.parquet(str(cdc_dir / "b2.parquet"))
    now = time.time()
    os.utime(cdc_dir / "b1.parquet", (now - 100, now - 100))
    os.utime(cdc_dir / "b2.parquet", (now, now))

    def apply_batch(batch_df, _batch_id):
        merge_upsert(
            batch_df.sparkSession,
            base_path,
            batch_df,
            key_cols=["id"],
            partition_cols=["dt"],
            delete_col="deleted",
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(cdc_dir) + "/*")
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()

    import pyspark.sql.functions as F

    got = {
        r["id"]: (r["dt"], r["amount"])
        for r in spark.read.parquet(base_path)
        .withColumn("dt", F.col("dt").cast("string"))
        .collect()
    }
    assert got == {1: ("2024-01-01", 12.0), 3: ("2024-01-03", 30.0)}


def test_run_sql_facade_matches_dataframe(spark):
    """The SQL entry point plans through the same views: a SQL
    aggregation equals its DataFrame twin."""
    from parcialbigdata_spark.sql import run_sql

    got = {
        (r["o_orderstatus"], r["n"])
        for r in run_sql(
            spark,
            SF,
            "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus",
        ).collect()
    }
    want = {
        (r["o_orderstatus"], r["n"])
        for r in load_table(spark, SF, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_scan_tolerates_corrupt_file_when_configured(spark, tmp_path):
    """E3 at the scan layer: with ignoreCorruptFiles a garbage parquet
    file is skipped and the good files' rows all arrive — the
    continue-on-failure semantics of the reference's fetch loop,
    applied to the warehouse read path."""
    d = tmp_path / "mixed"
    d.mkdir()
    spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string").coalesce(
        1
    ).write.parquet(str(d / "good.parquet"))
    (d / "bad.parquet" / "part-corrupt.parquet").parent.mkdir()
    (d / "bad.parquet" / "part-corrupt.parquet").write_bytes(b"PAR1 this is not parquet")

    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        # Explicit schema, as any production warehouse read: schema
        # inference itself would die on the corrupt footer before the
        # scan-level skip can apply.
        rows = spark.read.schema("id bigint, v string").parquet(str(d / "*")).collect()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)
    assert {r["id"] for r in rows} == {1, 2}


def test_write_zordered_skips_on_both_columns(spark, tmp_path):
    """Z-ordering on (user_id, value) must leave BOTH columns with
    sub-full ranges in most files (so either predicate skips), where a
    plain sort by user_id leaves value spanning ~everything in every
    file. Round-trip data is unchanged."""
    import pathlib

    import pyarrow.parquet as pq

    from parcialbigdata_spark.sources.warehouse import write_sorted, write_zordered

    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    zdir, sdir = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(ev, zdir, ["user_id", "value"], num_files=8)
    write_sorted(ev, sdir, ["user_id"], num_files=8)

    def col_ranges(d, col):
        out = []
        for f in sorted(pathlib.Path(d).glob("*.parquet")):
            md = pq.ParquetFile(str(f)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
            sts = [md.row_group(rg).column(idx).statistics for rg in range(md.num_row_groups)]
            out.append((min(s.min for s in sts), max(s.max for s in sts)))
        return out

    lo = min(r[0] for r in col_ranges(zdir, "value"))
    hi = max(r[1] for r in col_ranges(zdir, "value"))
    span = hi - lo

    def covering(ranges, point):
        return sum(1 for a, b in ranges if a <= point <= b)

    # Point predicates on value must hit clearly fewer z-files than
    # sorted-files (where files cover ~the full value range), and a
    # point predicate on user_id must still skip most z-files too.
    probes = [lo + span * f for f in (0.2, 0.35, 0.5, 0.65, 0.8)]
    z_value_hits = sum(covering(col_ranges(zdir, "value"), p) for p in probes)
    s_value_hits = sum(covering(col_ranges(sdir, "value"), p) for p in probes)
    assert z_value_hits < s_value_hits
    uid_ranges = col_ranges(zdir, "user_id")
    uid_probe = min(a for a, _ in uid_ranges)
    assert covering(uid_ranges, uid_probe) < 8

    back = spark.read.parquet(zdir)
    assert back.count() == ev.count()
    assert back.agg(F.sum("value")).first()[0] == pytest.approx(
        ev.agg(F.sum("value")).first()[0]
    )


def test_zorder_key_rejects_too_many_bits(spark):
    from parcialbigdata_spark.sources.warehouse import zorder_key

    with pytest.raises(ValueError, match="bigint"):
        zorder_key(["a", "b", "c", "d"], {c: (0, 1) for c in "abcd"}, bits=16)


def test_write_zordered_degenerate_bounds_raise(spark, tmp_path):
    """Empty input / all-NULL z-order columns fail with a descriptive
    error instead of a TypeError deep in zorder_key (ADVICE r3)."""
    import pytest as _pytest

    from parcialbigdata_spark.sources.warehouse import write_zordered

    empty = spark.createDataFrame([], "a BIGINT, b BIGINT")
    with _pytest.raises(ValueError, match="no usable bounds"):
        write_zordered(empty, str(tmp_path / "z1"), ["a", "b"])

    all_null = spark.createDataFrame([(1, None), (2, None)], "a BIGINT, b BIGINT")
    with _pytest.raises(ValueError, match="\\['b'\\]"):
        write_zordered(all_null, str(tmp_path / "z2"), ["a", "b"])


def test_ivf_partitioned_ann_store_prunes_to_probe_cells(spark, tmp_path):
    """The billion-scale ANN serving layout the ivfpq docstring claims:
    embeddings written hive-partitioned by IVF cell, probe queries scan
    ONLY the probed cells (partition pruning visible in the plan and in
    the files actually read), and the pruned scan returns exactly the
    rows an in-memory cell filter would."""
    import numpy as np

    from parcialbigdata_spark.operators import similarity
    from parcialbigdata_spark.queries import _clustered_fixture
    from parcialbigdata_spark.sources.warehouse import write_partitioned

    emb, qv = _clustered_fixture(spark)
    centroids = similarity.ivf_fit_centroids(emb, n_centroids=16)
    cells = emb.withColumn(
        "ivf_cell", similarity._centroid_assign_udf(centroids)(F.col("embedding"))
    )
    out = str(tmp_path / "ann_store")
    write_partitioned(cells, out, ["ivf_cell"])

    C = np.asarray(centroids)
    qa = np.asarray(qv)
    probes = [int(i) for i in (((C - qa[None, :]) ** 2).sum(axis=1)).argsort()[:4]]

    store = spark.read.parquet(out)
    probed = store.filter(F.col("ivf_cell").isin(probes))
    rows = probed.collect()

    # plan proof: the cell predicate became a partition filter (no
    # data-column filter remains for it)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split("PartitionFilters", 1)[1][:200], plan[:2000]

    # files-read proof: only probe-cell directories are touched
    import re as _re

    touched = {
        int(m.group(1))
        for f in probed.select(F.input_file_name().alias("f")).distinct().collect()
        if (m := _re.search(r"ivf_cell=(\d+)", f["f"]))
    }
    assert touched <= set(probes) and touched

    # correctness: pruned scan == in-memory cell filter
    expect = {
        r["vec_id"] for r in cells.filter(F.col("ivf_cell").isin(probes)).collect()
    }
    assert {r["vec_id"] for r in rows} == expect


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """DPP proof: a hive-partitioned fact joined to a filtered dim on
    the partition key gets a runtime DynamicPruning partition filter —
    at 100 TB this is what turns "join January's dim slice" into "read
    January's directories", without the filter being known at plan
    time. Asserts the plan carries the dynamicpruning expression and
    the join result matches the statically-filtered equivalent."""
    from parcialbigdata_spark.sources.warehouse import write_partitioned

    li = load_table(spark, SF, "lineitem").withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    )
    out = str(tmp_path / "li_by_month")
    write_partitioned(li, out, ["ship_month"])

    months = (
        li.select("ship_month")
        .distinct()
        .withColumn(
            "quarter", F.concat(F.substring("ship_month", 1, 4), F.lit("-Q"),
                                ((F.substring("ship_month", 6, 2).cast("int") - 1) / 3 + 1)
                                .cast("int").cast("string"))
        )
    )
    fact = spark.read.parquet(out)
    dim = months.filter(F.col("quarter") == "1997-Q1")
    joined = fact.join(dim, "ship_month")
    rows = joined.count()

    plan = joined._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in plan, plan[:3000]

    expect = fact.join(months, "ship_month").filter(
        F.col("quarter") == "1997-Q1"
    ).count()
    assert rows == expect > 0


def test_compact_small_files_reduces_count_and_preserves_data(spark, tmp_path):
    """Compaction rewrites a fragmented dataset to few files with
    byte-identical content and an atomic swap (no partial state left)."""
    import glob

    from parcialbigdata_spark.sources.warehouse import compact_small_files

    out = str(tmp_path / "fragmented")
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    ev.repartition(64).write.parquet(out)  # simulate append fragmentation
    assert len(glob.glob(out + "/*.parquet")) == 64

    stats = compact_small_files(spark, out, target_files=4)
    assert stats["files_before"] == 64 and stats["files_after"] == 4

    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert back.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]
    assert not glob.glob(str(tmp_path / "fragmented__*"))  # swap cleaned up


def test_compact_small_files_fails_fast_on_leftover_siblings(spark, tmp_path):
    """A crashed prior run leaves __compacting / __precompact siblings;
    re-running must refuse (not clobber or half-swap) until the operator
    recovers, and the live dataset must be untouched afterwards."""
    import os

    import pytest as _pytest

    from parcialbigdata_spark.sources.warehouse import compact_small_files

    out = str(tmp_path / "ds")
    ev = load_table(spark, SF, "events").select("event_id", "value")
    ev.repartition(8).write.parquet(out)

    for suffix in ("__compacting", "__precompact"):
        leftover = out + suffix
        os.mkdir(leftover)
        with _pytest.raises(RuntimeError, match="leftover"):
            compact_small_files(spark, out, target_files=2)
        os.rmdir(leftover)

    # Clean siblings -> proceeds normally.
    stats = compact_small_files(spark, out, target_files=2)
    assert stats["files_after"] == 2
    assert spark.read.parquet(out).count() == ev.count()
