"""Paginated HTTP scan as a Spark 4 Python Data Source (SURVEY.md §2.1 S1).

The reference fetches 10 result pages serially in one thread
(``/root/reference/download_lambda.py:27-43``). This module re-expresses
that scan as a first-class ``spark.read.format("http_pages")`` source:
one input partition per page, so the cluster scheduler owns parallelism,
retries and locality — the idiomatic Spark 4 shape for "the input is a
paginated remote API" (vs. the ``mapInPandas`` fetch in
``pipeline/fetch.py``, which remains for Spark < 4 compatibility).

Usage::

    spark.dataSource.register(HttpPagesDataSource)
    df = (spark.read.format("http_pages")
          .option("base_url", BASE_URL)
          .option("first", "1").option("last", "10")
          .load())            # → (page, url, status, body)

Failure semantics match the reference: a non-200 or failed fetch emits
a row with its status (or -1) and the run continues
(``download_lambda.py:39-43``); callers filter ``status == 200``.

Offline/testing mode: ``option("transport", "stub")`` swaps the real
HTTP client for a deterministic double — 200 + ``<html>Content from
{url}</html>`` per page, with pages listed in ``option("fail_pages",
"5,7")`` returning 404 — the same doubles the reference's own tests
monkeypatch in (``tests/test_download.py:23-38``). The stub lives here
(not in test code) because the reader class is re-imported inside
Spark's data-source worker processes, where test-module state does not
exist.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from parcialbigdata_spark.pipeline.fetch import BASE_URL, HEADERS

SCHEMA = "page int, url string, status int, body string"


class _PagePartition(InputPartition):
    def __init__(self, page: int, url: str):
        self.page = page
        self.url = url


class HttpPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.base_url = options.get("base_url", BASE_URL)
        self.first = int(options.get("first", 1))
        self.last = int(options.get("last", 10))
        self.transport = options.get("transport", "requests")
        if self.transport not in ("requests", "stub"):
            raise ValueError(f"unknown transport {self.transport!r} (requests|stub)")
        self.fail_pages = {
            int(p) for p in options.get("fail_pages", "").split(",") if p.strip()
        }

    def partitions(self) -> list[InputPartition]:
        return [
            _PagePartition(p, f"{self.base_url}&page={p}")
            for p in range(self.first, self.last + 1)
        ]

    def read(self, partition: _PagePartition):
        if self.transport == "stub":
            if partition.page in self.fail_pages:
                yield (partition.page, partition.url, 404, "")
            else:
                body = f"<html>Content from {partition.url}</html>"
                yield (partition.page, partition.url, 200, body)
            return
        import requests

        try:
            resp = requests.get(partition.url, headers=HEADERS)
            status, body = resp.status_code, resp.text
        except Exception as exc:  # network failure == non-200 page
            status, body = -1, str(exc)
        yield (partition.page, partition.url, status, body)


class HttpPagesStreamReader(SimpleDataSourceStreamReader):
    """Incremental paginated scan (SURVEY.md §2.8 E1/E2 source side):
    each micro-batch fetches the next ``pages_per_batch`` pages, the
    committed offset is simply the next page number, and recovery
    replays an exact page range (``readBetweenOffsets``) — pagination
    IS an offset-based log, which is what makes the reference's
    "poll the listing site on a schedule" loop a checkpointable stream
    (``trigger(availableNow)`` bounded by ``last``; a production poller
    would leave ``last`` open-ended).

    Uses the ``Simple`` reader variant deliberately: page fetches are
    driver-side sequential like the reference's own loop; the
    partition-parallel batch reader above is the throughput path."""

    def __init__(self, options: dict):
        self._r = HttpPagesReader(options)
        self.pages_per_batch = int(options.get("pages_per_batch", 3))

    def initialOffset(self) -> dict:
        return {"page": self._r.first}

    def _fetch(self, page: int):
        return next(iter(self._r.read(_PagePartition(page, f"{self._r.base_url}&page={page}"))))

    def read(self, start: dict):
        lo = start["page"]
        hi = min(lo + self.pages_per_batch, self._r.last + 1)
        rows = [self._fetch(p) for p in range(lo, hi)]
        return iter(rows), {"page": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([self._fetch(p) for p in range(start["page"], end["page"])])


class HttpPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "http_pages"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> HttpPagesReader:
        return HttpPagesReader(self.options)

    def simpleStreamReader(self, schema) -> HttpPagesStreamReader:
        return HttpPagesStreamReader(self.options)
