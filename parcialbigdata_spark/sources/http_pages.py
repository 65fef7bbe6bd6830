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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


class HttpPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "http_pages"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> HttpPagesReader:
        return HttpPagesReader(self.options)
