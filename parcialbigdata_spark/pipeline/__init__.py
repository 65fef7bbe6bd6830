"""The faithful capability core of the reference pipeline, Spark-first.

Reference: download_lambda.py (the entire Python surface of
juancho3104/parcialBigdata). Stage map — SURVEY.md §2.1-§2.2, §2.9:

- ``fetch``        — S1/S2: paginated HTTP scan + blob store.
- ``parse``        — S3, P1-P4, U1: whole-file scan, card-extraction
                     pandas UDF + explode, typed/compat projections.
- ``sink``         — S5, P7: per-source header-CSV objects.
- ``handlers``     — P5, P6, P8: the three faithful entry points.
- ``storage``      — the object-store seam (local dirs / s3a).
- ``html_extract`` — the stdlib HTML kernel inside the parse UDF.
"""

from parcialbigdata_spark.pipeline.fetch import (
    BASE_URL,
    HEADERS,
    fetch_pages,
    fetch_pages_distributed,
    page_urls,
)
from parcialbigdata_spark.pipeline.handlers import (
    download_handler,
    lambda_handler,
    process_handler,
)
from parcialbigdata_spark.pipeline.html_extract import extract_cards
from parcialbigdata_spark.pipeline.parse import (
    CSV_COLUMNS,
    compat_view,
    exploded_cards,
    parse_listings,
    read_landing,
)
from parcialbigdata_spark.pipeline.sink import (
    csv_bytes,
    write_csv_distributed,
    write_csv_per_source,
)
from parcialbigdata_spark.pipeline.storage import LocalObjectStore

__all__ = [
    "BASE_URL",
    "HEADERS",
    "CSV_COLUMNS",
    "LocalObjectStore",
    "compat_view",
    "csv_bytes",
    "download_handler",
    "exploded_cards",
    "extract_cards",
    "fetch_pages",
    "fetch_pages_distributed",
    "lambda_handler",
    "page_urls",
    "parse_listings",
    "process_handler",
    "read_landing",
    "write_csv_distributed",
    "write_csv_per_source",
]
