"""Ingest-stage tests mirroring the reference's three scenarios
(reference: tests/test_download.py:70-131): all-200 success, page-5
failure with continue, and the default-bucket fallback."""

from __future__ import annotations

from datetime import datetime, timezone

from parcialbigdata_spark.pipeline import BASE_URL, download_handler
from parcialbigdata_spark.pipeline.storage import LocalObjectStore


class DummyResponse:
    def __init__(self, status_code: int, text: str) -> None:
        self.status_code = status_code
        self.text = text


def dummy_get_success(url, headers=None):
    return DummyResponse(200, f"<html>Content from {url}</html>")


def dummy_get_failure(url, headers=None):
    if "page=5" in url:
        return DummyResponse(404, "Not Found")
    return DummyResponse(200, f"<html>Content from {url}</html>")


class RecordingStore(LocalObjectStore):
    """Records every put, like the reference's DummyS3Client
    (tests/test_download.py:41-57)."""

    def __init__(self, root: str) -> None:
        super().__init__(root)
        self.put_calls: list[dict] = []

    def put_object(self, Bucket, Key, Body, ContentType=""):
        self.put_calls.append(
            {"Bucket": Bucket, "Key": Key, "Body": Body, "ContentType": ContentType}
        )
        return super().put_object(Bucket, Key, Body, ContentType)


def test_download_handler_success(monkeypatch, tmp_path):
    """PRUEBA 1 parity: all pages 200 → one dated object containing the
    content of all 10 page URLs (tests/test_download.py:70-100)."""
    monkeypatch.setenv("S3_BUCKET", "parcials")
    store = RecordingStore(str(tmp_path))

    result = download_handler(http_get=dummy_get_success, store=store)
    assert result["status"] == "downloaded"
    assert len(store.put_calls) == 1

    today = datetime.now(timezone.utc).strftime("%Y-%m-%d")
    assert result["filename"] == f"{today}.html"
    assert store.put_calls[0]["Key"] == f"{today}.html"
    assert store.put_calls[0]["ContentType"] == "text/html"

    body = store.put_calls[0]["Body"]
    for page in range(1, 11):
        assert f"Content from {BASE_URL}&page={page}" in body


def test_download_handler_partial_failure(monkeypatch, tmp_path, capsys):
    """PRUEBA 2 parity: page 5 fails → error line printed, run still
    succeeds (tests/test_download.py:103-116)."""
    monkeypatch.setenv("S3_BUCKET", "parcials")
    store = RecordingStore(str(tmp_path))

    result = download_handler(http_get=dummy_get_failure, store=store)
    captured = capsys.readouterr().out
    assert "Error al descargar la página 5" in captured
    assert result["status"] == "downloaded"

    body = store.put_calls[0]["Body"]
    assert "page=4" in body and "page=6" in body
    assert "Content from " + BASE_URL + "&page=5" not in body


def test_download_handler_default_bucket(monkeypatch, tmp_path):
    """PRUEBA 3 parity: no S3_BUCKET env → bucket "parcials"
    (tests/test_download.py:119-131)."""
    monkeypatch.delenv("S3_BUCKET", raising=False)
    store = RecordingStore(str(tmp_path))

    result = download_handler(http_get=dummy_get_success, store=store)
    assert result["status"] == "downloaded"
    assert store.put_calls[0]["Bucket"] == "parcials"


def test_http_pages_datasource(spark):
    """S1 as a Spark 4 Python Data Source: one partition per page,
    reference failure semantics (non-200 rows kept, run continues)."""
    from parcialbigdata_spark.sources import http_pages

    spark.dataSource.register(http_pages.HttpPagesDataSource)
    df = (
        spark.read.format("http_pages")
        .option("base_url", "http://example.test/find?q=x")
        .option("first", "1")
        .option("last", "10")
        .option("transport", "stub")
        .option("fail_pages", "5")
        .load()
    )
    rows = {r["page"]: r for r in df.collect()}
    assert len(rows) == 10
    assert rows[5]["status"] == 404
    ok = [r for r in rows.values() if r["status"] == 200]
    assert len(ok) == 9
    assert all("Content from" in r["body"] for r in ok)
    # Parallelism contract: one input partition per page.
    assert df.rdd.getNumPartitions() == 10


def test_http_pages_stream_reader(spark, tmp_path):
    """S1/E1-E2 streaming: the paginated scan as a checkpointable
    stream — pages_per_batch pages per micro-batch, offsets = page
    numbers, availableNow drains exactly pages first..last once."""
    from parcialbigdata_spark.sources import http_pages

    spark.dataSource.register(http_pages.HttpPagesDataSource)
    stream = (
        spark.readStream.format("http_pages")
        .option("base_url", "http://example.test/find?q=x")
        .option("first", "1")
        .option("last", "10")
        .option("pages_per_batch", "3")
        .option("transport", "stub")
        .option("fail_pages", "5")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("http_pages_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # Offsets advance pages_per_batch per micro-batch; poll until the
    # bounded page range has fully drained (4 batches), then stop.
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.table("http_pages_stream").count() >= 10:
            break
        time.sleep(0.5)
    q.stop()
    rows = {r["page"]: r for r in spark.table("http_pages_stream").collect()}
    assert sorted(rows) == list(range(1, 11))
    assert rows[5]["status"] == 404
    assert sum(1 for r in rows.values() if r["status"] == 200) == 9
