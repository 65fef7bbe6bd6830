"""Structured Streaming tests: file-source landing → per-file CSV with
exactly-once semantics (E1), availableNow drain (E2), empty-input error
side-channel (E3), and the watermarked-window builders (E4)."""

from __future__ import annotations

import os

from parcialbigdata_spark.streaming import run_available_now, stream_landing_to_csv
from tests.test_fetch import RecordingStore
from tests.test_pipeline import GOLDEN_CARD, MISSING_FIELDS_CARD, _page


def test_stream_landing_to_csv(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "2026-08-01.html").write_text(_page(GOLDEN_CARD))
    (landing / "2026-08-02.html").write_text(_page(GOLDEN_CARD + MISSING_FIELDS_CARD))
    (landing / "2026-08-03.html").write_text("<html><body>vacío</body></html>")

    store = RecordingStore(str(tmp_path / "store"))
    q = stream_landing_to_csv(
        spark, str(landing), str(tmp_path / "ckpt"), store=store, available_now=True
    )
    run_available_now(q)

    csvs = {c["Key"]: c for c in store.put_calls if c["Bucket"] == "parcials"}
    errors = {c["Key"]: c for c in store.put_calls if c["Bucket"] == "errors"}
    assert set(csvs) == {"2026-08-01.csv", "2026-08-02.csv"}
    assert set(errors) == {"2026-08-03.error.json"}
    assert csvs["2026-08-01.csv"]["Body"].startswith(
        "FechaDescarga,Barrio,Valor,NumHabitaciones,NumBanos,mts2\r\n"
    )
    assert csvs["2026-08-02.csv"]["Body"].count("\r\n") == 3  # header + 2 rows
    assert "No listings found" in errors["2026-08-03.error.json"]["Body"]


def test_stream_exactly_once_on_restart(spark, tmp_path):
    """Checkpoint bookkeeping: a second availableNow run over the same
    landing dir reprocesses nothing; a new file is picked up once."""
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "2026-08-01.html").write_text(_page(GOLDEN_CARD))
    ckpt = str(tmp_path / "ckpt")
    store = RecordingStore(str(tmp_path / "store"))

    run_available_now(stream_landing_to_csv(spark, str(landing), ckpt, store=store))
    n_first = len(store.put_calls)
    assert n_first == 1

    run_available_now(stream_landing_to_csv(spark, str(landing), ckpt, store=store))
    assert len(store.put_calls) == n_first  # nothing reprocessed

    (landing / "2026-08-02.html").write_text(_page(GOLDEN_CARD))
    run_available_now(stream_landing_to_csv(spark, str(landing), ckpt, store=store))
    assert [c["Key"] for c in store.put_calls[n_first:]] == ["2026-08-02.csv"]


def test_streaming_hourly_matches_batch(spark):
    """E4: the drained tumbling-window aggregation equals the batch
    groupBy on the same fixture."""
    from parcialbigdata_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    streamed = QUERIES["streaming_hourly_events"](spark, sf_dir)
    batch = QUERIES["events_hourly_agg"](spark, sf_dir)
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_streaming_dedup(spark):
    from parcialbigdata_spark.queries import QUERIES

    row = QUERIES["streaming_dedup_events"](spark, "/root/testdata/sf0.001").first()
    assert row.n_events == row.n_distinct > 0


def test_stateful_running_counts(spark):
    """applyInPandasWithState: final per-user counts equal the batch
    groupBy count."""
    from parcialbigdata_spark.queries import QUERIES
    from parcialbigdata_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    sf_dir = "/root/testdata/sf0.001"
    streamed = {
        (r.user_id, r.n_events)
        for r in QUERIES["streaming_running_counts"](spark, sf_dir).collect()
    }
    batch = {
        (r.user_id, r.n)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert streamed == batch


def test_checkpoint_dir_created(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "2026-08-01.html").write_text(_page(GOLDEN_CARD))
    ckpt = tmp_path / "ckpt"
    store = RecordingStore(str(tmp_path / "store"))
    run_available_now(stream_landing_to_csv(spark, str(landing), str(ckpt), store=store))
    assert os.path.isdir(ckpt)


def test_stream_stream_join_matches_batch(spark):
    """E4: the drained watermarked stream-stream join equals the batch
    self-join on the same fixture."""
    from pyspark.sql import functions as F

    from parcialbigdata_spark.queries import QUERIES
    from parcialbigdata_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    streamed = QUERIES["streaming_click_purchase_join"](spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    batch = c.join(
        p,
        (F.col("cu") == F.col("pu"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 minutes")),
    ).select(
        F.col("cu").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_timestamp("pts") - F.unix_timestamp("cts")).alias("secs_between"),
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
    assert s, "no click->purchase pairs at sf0.001 — fixture assumption broken"
