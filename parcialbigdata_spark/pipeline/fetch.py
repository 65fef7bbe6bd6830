"""Ingest stage: paginated HTTP fetch (reference: download_lambda.py:22-58).

Two implementations of the same contract:

- :func:`fetch_pages` — faithful serial fetch of pages 1..N with the
  browser User-Agent, continue-on-failure semantics and the exact error
  line of the reference (``download_lambda.py:36-43``). Right-sized for
  the reference's 10-page workload; trivially testable by injecting
  ``http_get`` (mirrors the reference's monkeypatched ``requests.get``).

- :func:`fetch_pages_distributed` — the 100 TB path: N URLs distributed
  over executors via ``mapInPandas`` (one HTTP round-trip per row,
  Arrow-batched), returning a DataFrame of (page, url, status, body).
  Use when the page list is large enough that driver-side serial fetch
  is the bottleneck; downstream is identical (filter status == 200).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import requests
from pyspark.sql import DataFrame, SparkSession

#: Browser User-Agent header (reference: download_lambda.py:13-19).
HEADERS = {
    "User-Agent": (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) "
        "AppleWebKit/537.36 (KHTML, like Gecko) "
        "Chrome/110.0.0.0 Safari/537.36"
    )
}

#: Search URL the reference scrapes (download_lambda.py:27-32).
BASE_URL = (
    "https://casas.mitula.com.co/find?"
    "operationType=sell&propertyType=mitula_studio_apartment&"
    "geoId=mitula-CO-poblacion-0000014156&"
    "text=Bogot%C3%A1%2C++%28Cundinamarca%29"
)

FETCH_SCHEMA = "page int, url string, status int, body string"


def page_urls(base_url: str = BASE_URL, first: int = 1, last: int = 10) -> list[tuple[int, str]]:
    """(page, url) pairs for pages ``first..last`` (download_lambda.py:36-37)."""
    return [(p, f"{base_url}&page={p}") for p in range(first, last + 1)]


def fetch_pages(
    base_url: str = BASE_URL,
    first: int = 1,
    last: int = 10,
    http_get: Callable | None = None,
) -> str:
    """Serial fetch; returns 200-status bodies concatenated with ``"\\n"``.

    Failed pages print the reference's error line and are skipped — the
    run still succeeds (download_lambda.py:39-43; asserted by the
    reference's test 2, tests/test_download.py:103-116).
    """
    get = http_get or requests.get
    html_content = ""
    for page, url in page_urls(base_url, first, last):
        response = get(url, headers=HEADERS)
        if response.status_code == 200:
            html_content += response.text + "\n"
        else:
            print(f"Error al descargar la página {page}: {response.status_code}")
    return html_content


def fetch_pages_distributed(
    spark: SparkSession,
    base_url: str = BASE_URL,
    first: int = 1,
    last: int = 10,
    http_get: Callable | None = None,
) -> DataFrame:
    """Distributed fetch: one row per page with (page, url, status, body).

    The reference fetches serially in one thread (download_lambda.py:36);
    here each executor task fetches its partition of URLs concurrently.
    ``http_get`` is captured by value in the task closure so tests can
    inject a transport double without network access.
    """
    urls = spark.createDataFrame(page_urls(base_url, first, last), "page int, url string")

    def _fetch(batches: Iterator) -> Iterator:
        import pandas as pd

        get = http_get or requests.get
        for pdf in batches:
            out = {"page": [], "url": [], "status": [], "body": []}
            for page, url in zip(pdf["page"], pdf["url"]):
                try:
                    resp = get(url, headers=HEADERS)
                    status, body = resp.status_code, resp.text
                except Exception as exc:  # network failure == non-200 page
                    status, body = -1, str(exc)
                out["page"].append(int(page))
                out["url"].append(url)
                out["status"].append(status)
                out["body"].append(body)
            yield pd.DataFrame(out)

    # One task per URL: fetch latency, not CPU, dominates this stage.
    n = max(1, last - first + 1)
    return urls.repartition(n).mapInPandas(_fetch, FETCH_SCHEMA)
