"""Structured Streaming surface (SURVEY.md §2.8).

- ``pipeline`` — the streaming twin of the batch pipeline: file-source
  discovery of new landing HTML (replacing the reference's S3-event →
  Lambda trigger, zappa_settings.json:28-36), ``foreachBatch`` 1-in/1-out
  CSV sink, ``availableNow`` for the cron path (E1-E3).
- ``windows``  — watermarked tumbling and session windows over event
  streams, streaming dedup, and an ``applyInPandasWithState`` stateful
  counter (E4).
"""

from parcialbigdata_spark.streaming.pipeline import (
    run_available_now,
    stream_landing_to_csv,
)
from parcialbigdata_spark.streaming.windows import (
    read_events_stream,
    running_count_per_user,
    streaming_dedup_events,
    streaming_hourly_counts,
    streaming_sessions,
)

__all__ = [
    "read_events_stream",
    "run_available_now",
    "running_count_per_user",
    "stream_landing_to_csv",
    "streaming_dedup_events",
    "streaming_hourly_counts",
    "streaming_sessions",
]
