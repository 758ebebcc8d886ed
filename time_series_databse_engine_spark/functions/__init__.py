"""Column-level function library: reusable expressions shared by the
operators and available to users composing their own queries.  Everything
returns a Column built from ``pyspark.sql.functions`` (JVM-side, codegen'd).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from time_series_databse_engine_spark.operators.dedup import fingerprint
from time_series_databse_engine_spark.operators.similarity import (
    as_double,
    cosine,
    dot,
    norm,
)

MS_PER_HOUR = 3_600_000


def ts_ms_from_timestamp(col) -> F.Column:
    """TimestampType → epoch milliseconds (exact integer arithmetic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c)


def timestamp_from_ms(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c)


def hour_bucket(col="ts_ms") -> F.Column:
    """The reference's shard key floor(ts/3600000) (engine/insight.cpp:9-14)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c / MS_PER_HOUR).cast("long")


def bucket_start_ms(col="ts_ms", bucket_ms: int = MS_PER_HOUR) -> F.Column:
    """Tumbling-bucket start in ms (integer arithmetic, oracle-exact)."""
    c = F.col(col) if isinstance(col, str) else col
    return c - (c % F.lit(bucket_ms))


def inclusive_between(col, lo: int, hi: int) -> F.Column:
    """The reference's inclusive-on-both-ends range predicate
    (engine/insight.cpp:42)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.between(lo, hi)


__all__ = [
    "as_double",
    "bucket_start_ms",
    "cosine",
    "dot",
    "fingerprint",
    "hour_bucket",
    "inclusive_between",
    "norm",
    "timestamp_from_ms",
    "ts_ms_from_timestamp",
]
