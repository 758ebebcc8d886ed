"""Time-series window operators (SURVEY.md §2.2, §7.2 step 3).

All are single-window-pass DataFrame ops: one shuffle on the series key,
then sorted evaluation inside each partition (Spark WindowExec).  At 100 TB
the series key (``metric``/``event_type``) is the unit of parallelism;
skewed series are handled by AQE or by pre-splitting the hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

MS_PER_HOUR = 3_600_000


def hour_bucket_ms(col: str = "ts_ms") -> F.Column:
    """Hour-aligned bucket start in ms — the reference's shard key
    floor(ts/3600000)*3600000 (engine/insight.cpp:9-14) as an expression."""
    return (F.col(col) - (F.col(col) % MS_PER_HOUR)).alias("bucket_ms")


def downsample(
    df: DataFrame,
    bucket_ms: int,
    keys: list[str],
    value: str = "value",
    ts_ms: str = "ts_ms",
) -> DataFrame:
    """Tumbling-window aggregate on integer ms buckets.  Integer arithmetic
    (not window()) so the oracle can reproduce it exactly."""
    b = (F.col(ts_ms) - (F.col(ts_ms) % F.lit(bucket_ms))).alias("bucket_ms")
    return (
        df.groupBy(b, *keys)
        .agg(
            F.count("*").alias("n"),
            F.round(F.min(value), 6).alias("min_value"),
            F.round(F.max(value), 6).alias("max_value"),
            # Cross-engine float discipline (observed at sf0.1): engines sum
            # in different orders, so round(sum, 4) absorbs the noise (safe:
            # the true sum of 2dp inputs is never near a 4dp midpoint), and
            # avg is DERIVED from that rounded sum with NO further rounding —
            # round(avg(..)) independently on each engine lands on exact
            # midpoints (sum/24 etc.) where half-up vs half-even disagree.
            (F.round(F.sum(value), 4) / F.count("*")).alias("avg_value"),
            F.round(F.sum(value), 4).alias("sum_value"),
        )
    )


def moving_avg(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    value: str = "value",
    preceding: int = 5,
    out: str = "mov_avg",
) -> DataFrame:
    """Trailing moving average over the previous ``preceding`` rows + current."""
    w = W.partitionBy(*keys).orderBy(*order).rowsBetween(-preceding, 0)
    return df.withColumn(out, F.round(F.avg(value).over(w), 6))


def deltas(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    value: str = "value",
    ts_ms: str = "ts_ms",
) -> DataFrame:
    """Per-series lag/delta — the reference's delta-of-delta codec state
    (engine/shard.cpp:114-117) surfaced as a query-level operator."""
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("prev_value", F.lag(value).over(w))
        .withColumn("delta_value", F.round(F.col(value) - F.col("prev_value"), 6))
        .withColumn("delta_ms", F.col(ts_ms) - F.lag(ts_ms).over(w))
    )


def detect_gaps(
    df: DataFrame,
    keys: list[str],
    ts_ms: str = "ts_ms",
    min_gap_ms: int = MS_PER_HOUR,
) -> DataFrame:
    """Rows whose distance to the previous point in the series exceeds
    ``min_gap_ms`` — i.e. the reference's 'missing shard' condition as data."""
    w = W.partitionBy(*keys).orderBy(ts_ms)
    return (
        df.withColumn("prev_ts_ms", F.lag(ts_ms).over(w))
        .withColumn("gap_ms", F.col(ts_ms) - F.col("prev_ts_ms"))
        .filter(F.col("gap_ms") > min_gap_ms)
    )


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_ms: str = "ts_ms",
    gap_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap from the
    previous event exceeds ``gap_ms`` (lag + cumulative sum — one window pass)."""
    w = W.partitionBy(*keys).orderBy(ts_ms)
    new_sess = (
        F.when(F.col(ts_ms) - F.lag(ts_ms).over(w) > gap_ms, 1)
        .otherwise(0)
    )
    cum = W.partitionBy(*keys).orderBy(ts_ms).rowsBetween(W.unboundedPreceding, 0)
    return df.withColumn("_new_session", new_sess).withColumn(
        "session_id", F.sum("_new_session").over(cum)
    ).drop("_new_session")


def topk_per_group(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Top-k rows per group via row_number — Spark plans a partial top-k on
    the map side before the shuffle, so this never materializes full groups."""
    o = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order = [o] + [F.col(c).asc() for c in (tiebreak or [])]
    w = W.partitionBy(*keys).orderBy(*order)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def resample_interpolate(
    df: DataFrame,
    key: str,
    step_ms: int,
    ts_ms: str = "ts_ms",
    value: str = "value",
) -> DataFrame:
    """Gap-fill to a regular ``step_ms`` grid per series with linear
    interpolation — ``applyInPandas`` (numpy.interp) because interpolation
    between irregular neighbours isn't expressible with built-in window
    frames.  Per-series data must fit a worker; at scale, range-chunk the
    series key with an additional coarse time bucket in ``key``.
    """
    import numpy as np
    import pandas as pd

    def interp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_ms)
        kval = pdf[key].iloc[0]
        lo = int(pdf[ts_ms].min() // step_ms * step_ms)
        hi = int(pdf[ts_ms].max())
        grid = np.arange(lo, hi + 1, step_ms, dtype="int64")
        vals = np.interp(grid, pdf[ts_ms].to_numpy(dtype="float64"), pdf[value].to_numpy())
        return pd.DataFrame({key: kval, ts_ms: grid, value: np.round(vals, 6)})

    schema = f"{key} string, {ts_ms} long, {value} double"
    return df.select(key, ts_ms, value).groupBy(key).applyInPandas(interp, schema=schema)
