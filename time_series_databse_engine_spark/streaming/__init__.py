"""Structured Streaming tier (SURVEY.md §7.2 step 5).

The reference's ingestion is synchronous request/response per point
(api/main.py:67-73); the streaming analogue is a file/rate source →
event-time watermark → tumbling/session windows → ``foreachBatch`` append
into the same hour-partitioned Parquet layout the batch store uses.  Late
data is handled by the watermark instead of the reference's
re-open-and-re-encode-the-shard path (engine/shard.cpp:79-105).
"""

from time_series_databse_engine_spark.streaming.ingest import (
    stream_events,
    stream_stream_join,
    windowed_counts,
    windowed_distinct_users,
    sessionized_counts,
    stream_to_store,
)

__all__ = [
    "stream_events",
    "stream_stream_join",
    "windowed_counts",
    "windowed_distinct_users",
    "sessionized_counts",
    "stream_to_store",
]
