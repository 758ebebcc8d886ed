"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark 3.5+).

The 100 TB pattern: materialize one small binary sketch per (coarse time
bucket, series) ONCE — a single scan — then answer any later range-distinct
question by unioning the handful of covering sketches.  Unlike
``approx_count_distinct`` (whose internal state is gone after the query),
the sketch column is a first-class mergeable value: persist it next to the
materialized rollups and distinct-count dashboards never rescan raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DAY_MS = 86_400_000


def hll_daily_sketches(
    df: DataFrame,
    keys: list[str],
    col: str,
    ts_ms: str = "ts_ms",
    lg_k: int = 12,
) -> DataFrame:
    """Per-(day, series) HLL sketches of ``col``: one scan, one partial-
    aggregated shuffle, output rows = days × series (tiny)."""
    day = (F.col(ts_ms) - (F.col(ts_ms) % F.lit(DAY_MS))).alias("day_ms")
    return df.groupBy(day, *keys).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def hll_estimate(
    sketches: DataFrame,
    keys: list[str],
    lo_ms: int | None = None,
    hi_ms: int | None = None,
) -> DataFrame:
    """Union the sketches covering ``[lo_ms, hi_ms)`` per series and
    estimate the distinct count — O(covering sketches), no raw-data scan."""
    if lo_ms is not None:
        sketches = sketches.filter(F.col("day_ms") >= lo_ms)
    if hi_ms is not None:
        sketches = sketches.filter(F.col("day_ms") < hi_ms)
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )
