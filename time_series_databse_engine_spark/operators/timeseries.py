"""Time-series window operators (SURVEY.md §2.2, §7.2 step 3).

All are single-window-pass DataFrame ops: one shuffle on the series key,
then sorted evaluation inside each partition (Spark WindowExec).  At 100 TB
the series key (``metric``/``event_type``) is the unit of parallelism;
skewed series are handled by AQE or by pre-splitting the hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F, types as T

from ._util import _shuffle_width

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


def moving_avg_time(
    df: DataFrame,
    keys: list[str],
    ts_ms: str = "ts_ms",
    value: str = "value",
    window_ms: int = 300_000,
    out: str = "mov_avg_time",
) -> DataFrame:
    """Trailing TIME-range moving average: all points of the series within
    the last ``window_ms`` (RANGE frame on the ms axis, vs :func:`moving_avg`'s
    ROWS frame).  The frame is defined by the ts value, so timestamp ties
    share one frame — deterministic without a tiebreak column."""
    w = W.partitionBy(*keys).orderBy(ts_ms).rangeBetween(-window_ms, W.currentRow)
    return df.withColumn(out, F.round(F.avg(value).over(w), 6)).withColumn(
        "n_in_window", F.count(value).over(w)
    )


def moving_avg_time_chunked(
    df: DataFrame,
    keys: list[str],
    ts_ms: str = "ts_ms",
    value: str = "value",
    window_ms: int = 300_000,
    out: str = "mov_avg_time",
    chunk_ms: int = 86_400_000,
) -> DataFrame:
    """:func:`moving_avg_time` with the window partitioned by
    ``(key, time-chunk)`` — the RANGE-frame member of the chunk-parallel
    family (:func:`zscore_anomalies_chunked` is the ROWS-frame one, and
    time frames chunk even more simply): a trailing ``window_ms`` frame
    for a row in chunk ``c`` can only reach rows with
    ``ts ≥ c·chunk_ms − window_ms``, so the exact context is every row
    in that strip — copied forward ``ceil(window_ms / chunk_ms)`` chunks
    at most, one explode + filter, no rank dance.  Output row-identical
    to the plain form (test-pinned); parallelism = keys × chunks instead
    of the bare key cardinality.

    Cost: one exchange of the corpus + context duplicates (the
    duplicate fraction is ``≤ window_ms / chunk_ms`` of the rows, ~0.3 %
    at the 5 min / 1 day defaults) vs the plain form's one exchange into
    n_keys partitions."""
    if window_ms >= chunk_ms * 64:
        raise ValueError(
            "window_ms/chunk_ms fan-out too large — pick chunk_ms ≥ window_ms/64"
        )
    n_fwd = -(-window_ms // chunk_ms)  # ceil
    base = df.withColumn("_chunk", F.floor(F.col(ts_ms) / F.lit(int(chunk_ms))))
    own = base.withColumn("_tchunk", F.col("_chunk")).withColumn("_emit", F.lit(True))
    ctx = (
        base.withColumn("_off", F.explode(F.sequence(F.lit(1), F.lit(int(n_fwd)))))
        .withColumn("_tchunk", F.col("_chunk") + F.col("_off"))
        # reachable iff the row sits inside the target chunk's lookback strip
        .filter(F.col(ts_ms) >= F.col("_tchunk") * chunk_ms - window_ms)
        .drop("_off")
        .withColumn("_emit", F.lit(False))
    )
    u = own.unionByName(ctx).drop("_chunk")
    w = (
        W.partitionBy(*keys, "_tchunk")
        .orderBy(ts_ms)
        .rangeBetween(-window_ms, W.currentRow)
    )
    return (
        u.withColumn(out, F.round(F.avg(value).over(w), 6))
        .withColumn("n_in_window", F.count(value).over(w))
        .filter(F.col("_emit"))
        .drop("_emit", "_tchunk")
    )


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


def decayed_topk(
    df: DataFrame,
    keys: list[str],
    half_life_ms: int,
    k: int = 20,
    ts_ms: str = "ts_ms",
    now_ms: int | None = None,
) -> DataFrame:
    """Trending top-k with exponential time decay — the "what's hot NOW"
    leaderboard (Hacker News / Reddit ranking shape): each event
    contributes ``0.5 ** ((now - ts) / half_life)``, so an item needs
    twice the events per half-life of age to outrank a fresh one, and
    plain all-time top-k (what a bare count gives) stops burying
    yesterday's viral spike.

    ``now_ms`` defaults to the corpus max timestamp so the statistic is
    deterministic and backtestable; pass wall-clock at serving time.

    Scale shape: one map-side partial aggregate on the item keys (sum of
    per-row decay weights + count), then a k-heap
    ``TakeOrderedAndProject`` on the ROUNDED score with the keys as
    tiebreak — no global sort, no per-item history.  The decayed sum is
    also mergeable across time-partitioned increments the same way the
    sketch rollups are: ``score(t2) = score(t1) * 0.5^((t2-t1)/hl) +
    new_events`` — a daily-increment serving layer needs only the
    previous day's scores, never a rescan.
    """
    if half_life_ms <= 0:
        raise ValueError(f"half_life_ms must be positive, got {half_life_ms}")
    if now_ms is None:
        now_ms = df.agg(F.max(ts_ms)).collect()[0][0]
    w = F.pow(
        F.lit(0.5), (F.lit(int(now_ms)) - F.col(ts_ms)) / F.lit(float(half_life_ms))
    )
    scored = (
        df.groupBy(*keys)
        .agg(
            F.round(F.sum(w), 6).alias("decayed_score"),
            F.count("*").alias("n_events"),
        )
        .orderBy(
            F.col("decayed_score").desc(), *[F.col(c).asc() for c in keys]
        )
        .limit(k)
    )
    return scored


def ohlc_bars(
    df: DataFrame,
    bucket_ms: int,
    keys: list[str],
    value: str = "value",
    ts_ms: str = "ts_ms",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """OHLC (open/high/low/close) candlestick downsample per series+bucket.

    Open/close are picked with ``min_by``/``max_by`` on a ``row_number``
    ordering key — a deterministic total order even under timestamp ties —
    rather than a struct ordering (DuckDB's ``arg_min`` can't compare rows,
    and an int key is cheaper anyway).  The window is partitioned by the
    same (bucket, series) keys the aggregation groups on, so Catalyst
    plans ONE shuffle: the window's sort partitioning satisfies the agg.
    Open/close are raw value picks (no arithmetic) — exact cross-engine;
    high/low likewise.
    """
    bucket = (F.col(ts_ms) - (F.col(ts_ms) % F.lit(bucket_ms))).alias("bucket_ms")
    order = [F.col(ts_ms)] + [F.col(c) for c in (tiebreak or [])]
    w = W.partitionBy(F.col("bucket_ms"), *keys).orderBy(*order)
    return (
        df.select(bucket, *keys, ts_ms, value, *(tiebreak or []))
        .withColumn("_rn", F.row_number().over(w))
        .groupBy("bucket_ms", *keys)
        .agg(
            F.min_by(value, "_rn").alias("open"),
            F.max(value).alias("high"),
            F.min(value).alias("low"),
            F.max_by(value, "_rn").alias("close"),
            F.count("*").alias("n"),
        )
    )


def counter_rate(
    df: DataFrame,
    bucket_ms: int,
    keys: list[str],
    order: list[str],
    value: str = "value",
    ts_ms: str = "ts_ms",
) -> DataFrame:
    """PromQL-style counter ``increase``/``rate`` with reset detection.

    Per series ordered by time: increment = value - lag(value), except on a
    counter reset (value < previous) where the counter restarted from zero,
    so the increment is the raw value — PromQL's extrapolation-free
    ``increase`` semantics.  One window shuffle on the series key, then a
    map-side-partial aggregation per bucket.  At 100 TB the window
    partitions by series only (not bucket), so a single series spanning
    years still sorts once; skewed series fall to AQE.
    """
    w = W.partitionBy(*keys).orderBy(*order)
    prev = F.lag(value).over(w)
    inc = (
        F.when(prev.isNull(), F.lit(0.0))
        .when(F.col(value) >= prev, F.col(value) - prev)
        .otherwise(F.col(value))
    )
    bucket = (F.col(ts_ms) - (F.col(ts_ms) % F.lit(bucket_ms))).alias("bucket_ms")
    # round(sum,4)-then-derive discipline: see downsample() on why the
    # dependent ratio must come from the already-rounded sum
    increase = F.round(F.sum("_inc"), 4)
    return (
        df.withColumn("_inc", inc)
        .groupBy(bucket, *keys)
        .agg(
            increase.alias("increase"),
            (increase / F.lit(bucket_ms / 1000.0)).alias("rate_per_sec"),
            F.count("*").alias("n_samples"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    keys: list[str],
    start_ms: int,
    end_ms: int,
    value: str = "value",
    ts_ms: str = "ts_ms",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Time-weighted average over ``[start_ms, end_ms)`` per series.

    Each point holds its value until the next point (step-function /
    last-observation-carried-forward integration, the TimescaleDB
    ``time_weight('LOCF')`` semantics); the final point is weighted to the
    window end.  Duration sums are exact int64; the value·duration sum is
    rounded before the ratio (cross-engine float discipline, see
    downsample()).  Ties on ts are totally ordered by ``tiebreak`` so both
    engines assign identical durations.
    """
    w = W.partitionBy(*keys).orderBy(ts_ms, *(tiebreak or []))
    scoped = df.filter(F.col(ts_ms).between(start_ms, end_ms - 1))
    dur = F.coalesce(F.lead(ts_ms).over(w), F.lit(end_ms)) - F.col(ts_ms)
    weighted_sum = F.round(F.sum(F.col(value) * F.col("_dur")), 2)
    return (
        scoped.withColumn("_dur", dur)
        .groupBy(*keys)
        .agg(
            (weighted_sum / F.sum("_dur")).alias("time_weighted_avg"),
            F.sum("_dur").alias("covered_ms"),
            F.count("*").alias("n_points"),
        )
    )


def zscore_anomalies(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    value: str = "value",
    lookback: int = 100,
    min_points: int = 30,
    threshold: float = 3.0,
) -> DataFrame:
    """Rows whose value deviates > ``threshold`` sigmas from the trailing
    ``lookback``-row mean of their series (current row excluded from the
    baseline so an outlier can't mask itself).  Pure window pass — one
    shuffle on the series key; the frame is rows-based so skewed series
    cost O(rows), not O(rows·lookback).
    """
    w = W.partitionBy(*keys).orderBy(*order).rowsBetween(-lookback, -1)
    # pin the window exchange's width: with a handful of series AQE
    # byte-coalescing collapses it to ONE task (measured 1.2 s serialized
    # at sf0.1); the explicit numPartitions keeps up to (distinct key
    # combinations) non-empty tasks — hash partitioning cannot spread
    # wider than the key cardinality, so zscore_anomalies_chunked remains
    # the true scale form for low-cardinality keys (its parallelism is
    # keys x chunks)
    width = _shuffle_width(df.sparkSession)
    df = (
        df.repartition(width, *keys)
        .withColumn("_mu", F.avg(value).over(w))
        .withColumn("_sd", F.stddev_samp(value).over(w))
        .withColumn("_n", F.count(value).over(w))
    )
    z = (F.col(value) - F.col("_mu")) / F.col("_sd")
    return (
        df.filter((F.col("_n") >= min_points) & (F.col("_sd") > 0))
        .withColumn("zscore", F.round(z, 4))
        .filter(F.abs(F.col("zscore")) > threshold)
        .drop("_mu", "_sd", "_n")
    )


def zscore_anomalies_chunked(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    value: str = "value",
    lookback: int = 100,
    min_points: int = 30,
    threshold: float = 3.0,
    ts_ms: str = "ts_ms",
    chunk_ms: int = 86_400_000,
) -> DataFrame:
    """:func:`zscore_anomalies` with the window partitioned by
    ``(key, time-chunk)`` instead of bare ``key`` — the scale form for
    LOW-CARDINALITY series keys, completing the chunk-and-chain family
    (:func:`ewma_chunked`, :func:`holt_chunked`).  The plain version's
    one-exchange plan is right when keys are plentiful, but a 100 TB
    table with a handful of series values sorts each series on ONE task;
    here every heavy window partition holds one (key, chunk) slice, so
    parallelism = keys × chunks whatever the key cardinality.

    Exactness: a trailing ``lookback``-ROW frame does not compose
    algebraically across chunks (unlike EWMA's carry), so cross-boundary
    windows are fed the actual rows instead: per (key, chunk) keep the
    last ``lookback`` rows (a per-chunk window — these are the only rows
    ANY later window can reach back to, since a row with ≥ lookback
    successors inside its own chunk is unreachable from the next chunk),
    then per target chunk re-rank those tails and prepend the last
    ``lookback`` as non-emitting CONTEXT rows.  Thin chunks (fewer than
    ``lookback`` rows) are handled exactly — the re-rank pulls from as
    many chunks back as needed because every earlier chunk contributed
    its tail.  Output is row-identical to :func:`zscore_anomalies`
    (test-pinned): frames see the same rows in the same sort order, so
    even the float accumulation order matches.

    Cost: the corpus crosses the wire twice (tail-rank window + final
    window) vs once — the ewma_chunked trade; the tails×chunks re-rank
    touches ≤ lookback·n_chunks rows per key, never the corpus.
    """
    base = df.withColumn("_chunk", F.floor(F.col(ts_ms) / F.lit(int(chunk_ms))))
    desc = [F.col(o).desc() for o in order]
    w_tail = W.partitionBy(*keys, "_chunk").orderBy(*desc)
    tails = (
        base.withColumn("_rnt", F.row_number().over(w_tail))
        .filter(F.col("_rnt") <= lookback)
        .drop("_rnt")
    )
    targets = (
        base.select(*keys, "_chunk").distinct().withColumnRenamed("_chunk", "_tchunk")
    )
    w_ctx = W.partitionBy(*keys, "_tchunk").orderBy(*desc)
    ctx = (
        tails.join(targets, on=list(keys))
        .filter(F.col("_chunk") < F.col("_tchunk"))
        .withColumn("_rnc", F.row_number().over(w_ctx))
        .filter(F.col("_rnc") <= lookback)
        .drop("_rnc", "_chunk")
        .withColumn("_emit", F.lit(False))
    )
    own = base.withColumnRenamed("_chunk", "_tchunk").withColumn("_emit", F.lit(True))
    u = own.unionByName(ctx)
    # Pin the heavy window's exchange width: the whole point of chunking
    # is parallelism = keys × chunks, but the corpus is small in BYTES at
    # bench scale and AQE's byte-based coalescing collapses the window
    # exchange to 1-2 tasks, re-serializing exactly the work this
    # operator exists to spread (measured 2.35 s → 0.87 s at sf0.1).  An
    # explicit numPartitions disables coalescing; the window's
    # partitionBy matches, so no second exchange appears.
    width = _shuffle_width(u.sparkSession)
    u = u.repartition(width, *keys, "_tchunk")
    w = W.partitionBy(*keys, "_tchunk").orderBy(*order).rowsBetween(-lookback, -1)
    u = (
        u.withColumn("_mu", F.avg(value).over(w))
        .withColumn("_sd", F.stddev_samp(value).over(w))
        .withColumn("_n", F.count(value).over(w))
    )
    z = (F.col(value) - F.col("_mu")) / F.col("_sd")
    return (
        u.filter(F.col("_emit") & (F.col("_n") >= min_points) & (F.col("_sd") > 0))
        .withColumn("zscore", F.round(z, 4))
        .filter(F.abs(F.col("zscore")) > threshold)
        .drop("_mu", "_sd", "_n", "_emit", "_tchunk")
    )


def autocorrelation(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    value: str = "value",
    lag: int = 1,
) -> DataFrame:
    """Per-series autocorrelation at ``lag`` rows: corr(value, lag(value)).
    One window shuffle + one partial-aggregated corr — the seasonality /
    self-similarity probe of a TSDB's analytics tier.
    """
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_lagged", F.lag(value, lag).over(w))
        .groupBy(*keys)
        .agg(
            F.round(F.corr(value, "_lagged"), 6).alias("autocorr"),
            F.count("_lagged").alias("n_pairs"),
        )
    )


def ewma(
    df: DataFrame,
    key: str,
    alpha: float,
    ts_ms: str = "ts_ms",
    value: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """Exponentially-weighted moving average per series (batch form of
    streaming.stateful.ema_stream).  The recursion s_i = α·x_i + (1-α)·s_{i-1}
    isn't expressible with SQL window frames without overflow-prone
    pow(1-α, -i) tricks, so it runs as an Arrow-batched ``applyInPandas``.
    Per-series data must fit a worker; for series too long for that, use
    :func:`ewma_chunked` — the chunk-and-chain variant with O(chunk)
    worker memory and identical output.

    The recursion is written out explicitly as ``s = α·x + (1−α)·s`` (not
    ``pandas.ewm``, whose adjust=False kernel renormalizes by ``old_wt +
    new_wt`` each step) so a SQL recursive-CTE oracle computing the same two
    multiplies and one add per step agrees bit-for-bit before rounding.
    """
    import numpy as np

    sort_cols = [ts_ms] + ([tiebreak] if tiebreak else [])
    beta = 1.0 - alpha

    def _ewma(pdf):
        pdf = pdf.sort_values(sort_cols)
        vals = pdf[value].to_numpy(dtype="float64")
        out = np.empty(len(vals))
        s = 0.0
        for i, x in enumerate(vals):
            s = x if i == 0 else alpha * x + beta * s
            out[i] = s
        pdf["ewma"] = np.round(out, 6)
        return pdf

    out_schema = df.select(key, *sort_cols, value).schema.add("ewma", "double")
    return (
        df.select(key, *sort_cols, value)
        .groupBy(key)
        .applyInPandas(_ewma, schema=out_schema)
    )


def cusum_changepoints(
    df: DataFrame,
    key: str,
    k: float = 0.5,
    h: float = 5.0,
    ts_ms: str = "ts_ms",
    value: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """Two-sided CUSUM change-point detection per series (Page 1954):

        sp_t = max(0, sp_{t−1} + (x_t − μ − κ))      (upward drift)
        sn_t = max(0, sn_{t−1} − (x_t − μ) − κ)      (downward drift)
        alarm when sp > h or sn > h

    with μ the series mean (quantized to 6 dp so both engines anchor the
    recursion identically), κ the slack and ``h`` the decision threshold,
    both in value units.

    Although the max(0, ·) reset makes the recursion non-linear, it has
    an exact closed form: unrolling gives

        sp_t = max over suffixes = S_t − min_{0≤j≤t} S_j,   S = Σ(x−μ−κ)

    (and symmetrically for sn with z = μ−x−κ).  A running prefix sum
    plus a running minimum ARE expressible as ordered window aggregates,
    so the whole statistic runs JVM-side in two WindowExec nodes over
    ONE exchange on the series key — no Python boundary, and WindowExec
    spills oversized series to disk instead of OOMing a worker the way a
    whole-series ``applyInPandas`` recursion would (this replaced the
    round-4 pandas fold for exactly that reason).

    Increments are accumulated in integer micro-units
    (``round((x−μ−κ)·1e6)`` as BIGINT): integer addition is
    association-free, so the result is bit-reproducible regardless of
    partitioning or engine — the oracle replays the identical fixed-point
    sums.  Quantization error is ≤5e-7 per step relative to the raw
    double recursion (:func:`cusum_changepoints_pandas` keeps the
    reference fold for cross-checks).
    """
    order = [ts_ms] + ([tiebreak] if tiebreak else [])
    run = (
        W.partitionBy(key)
        .orderBy(*[F.col(c).asc() for c in order])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    mu_tbl = df.groupBy(key).agg(F.round(F.avg(value), 6).alias("_mu"))
    base = df.select(key, *order, value).join(F.broadcast(mu_tbl), key)
    yu = F.round((F.col(value) - F.col("_mu") - F.lit(k)) * 1e6, 0).cast("long")
    zu = F.round((F.col("_mu") - F.col(value) - F.lit(k)) * 1e6, 0).cast("long")
    sums = base.select(
        key,
        *order,
        value,
        F.sum(yu).over(run).alias("_S"),
        F.sum(zu).over(run).alias("_Z"),
    )
    zero = F.lit(0).cast("long")
    sp_u = F.col("_S") - F.least(zero, F.min("_S").over(run))
    sn_u = F.col("_Z") - F.least(zero, F.min("_Z").over(run))
    h_u = F.lit(int(round(h * 1e6))).cast("long")
    return sums.select(
        key,
        *order,
        value,
        F.round(sp_u / 1e6, 6).alias("cusum_pos"),
        F.round(sn_u / 1e6, 6).alias("cusum_neg"),
        ((sp_u > h_u) | (sn_u > h_u)).alias("alarm"),
    )


def cusum_changepoints_pandas(
    df: DataFrame,
    key: str,
    k: float = 0.5,
    h: float = 5.0,
    ts_ms: str = "ts_ms",
    value: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """Raw-double CUSUM recursion per series via ``applyInPandas`` — kept
    as the cross-check reference for :func:`cusum_changepoints` (which is
    the production path: JVM window aggregates, spillable, fixed-point).
    This form holds each whole series in one pandas frame, so it carries
    a worker-memory bound the window form does not."""
    import numpy as np

    sort_cols = [ts_ms] + ([tiebreak] if tiebreak else [])
    mu_tbl = df.groupBy(key).agg(F.round(F.avg(value), 6).alias("_mu"))
    base = df.select(key, *sort_cols, value).join(F.broadcast(mu_tbl), key)

    def _cusum(pdf):
        pdf = pdf.sort_values(sort_cols)
        vals = pdf[value].to_numpy(dtype="float64")
        mu = float(pdf["_mu"].iloc[0])
        sp = sn = 0.0
        sps = np.empty(len(vals))
        sns = np.empty(len(vals))
        for i, x in enumerate(vals):
            sp = max(0.0, sp + (x - mu - k))
            sn = max(0.0, sn - (x - mu) - k)
            sps[i] = sp
            sns[i] = sn
        pdf["cusum_pos"] = np.round(sps, 6)
        pdf["cusum_neg"] = np.round(sns, 6)
        pdf["alarm"] = (sps > h) | (sns > h)
        return pdf.drop(columns=["_mu"])

    out_schema = T.StructType(
        list(df.select(key, *sort_cols, value).schema.fields)
        + [
            T.StructField("cusum_pos", T.DoubleType()),
            T.StructField("cusum_neg", T.DoubleType()),
            T.StructField("alarm", T.BooleanType()),
        ]
    )
    return base.groupBy(key).applyInPandas(_cusum, schema=out_schema)


def rolling_median(
    df: DataFrame,
    keys: list[str],
    lookback: int = 100,
    ts_ms: str = "ts_ms",
    value: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """Trailing-window median per series — the robust smoother (a median
    filter rejects spikes a moving MEAN absorbs; pair with
    :func:`mad_anomalies` for full robust monitoring).  Exact
    ``percentile`` over a ROWS frame of the last ``lookback`` points.

    Cost model, stated plainly: an exact sliding median is
    O(rows × frame) — Spark re-evaluates the percentile per row over the
    frame buffer.  That is the honest price of exactness; at 100 TB keep
    ``lookback`` modest (hundreds), or switch to
    :func:`rolling_median_sketch` — the O(rows × bins) running-sum/lag
    histogram estimator — when bin-width error is acceptable.  One
    exchange on the series key, the same partitioning every window op
    shares.
    """
    order = [ts_ms] + ([tiebreak] if tiebreak else [])
    w = (
        W.partitionBy(*keys)
        .orderBy(*[F.col(c).asc() for c in order])
        .rowsBetween(-(lookback - 1), 0)
    )
    return df.select(
        *keys,
        F.col(ts_ms),
        F.col(value),
        F.round(F.expr(f"percentile({value}, 0.5)").over(w), 6).alias("rolling_median"),
        F.count("*").over(w).alias("n_window"),
    )


def rolling_median_sketch(
    df: DataFrame,
    keys: list[str],
    lo: float,
    hi: float,
    lookback: int = 100,
    bins: int = 60,
    ts_ms: str = "ts_ms",
    value: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """Sketch-backed trailing-window median — the O(rows × bins)
    alternative :func:`rolling_median`'s docstring promises for frames
    where the exact O(rows × frame) re-evaluation is unaffordable
    (a 10k-row frame costs 10⁴ value comparisons PER ROW exactly; this
    costs ``bins`` counter updates per row at any frame length).

    Mechanics: values quantize to ``bins`` fixed-width histogram bins
    (same clamp-to-edge rule as ``sketches.histogram_sketches``); per
    bin, the trailing-frame count is the difference of a RUNNING
    cumulative sum and its ``lookback``-row lag — both O(1)-per-row
    incremental window primitives, never a sliding-frame re-aggregation
    (Spark re-scans the whole buffer per row for sliding SUM frames,
    which would silently restore the O(rows × frame) cost).  The median
    bin is then the first bin whose bin-cumulative count reaches
    ``ceil(n/2)`` — equivalently the bin of the lower-median order
    statistic — found by a JVM-side fold over the ``bins``-element count
    array, and reported as its midpoint ``lo + (bin + 0.5)·w``.

    Error vs the exact interpolated median is bounded by one bin width
    whenever both middle order statistics share a bin (test-asserted on
    the driver data); the estimator itself is deterministic SQL, so the
    oracle replays it verbatim via a sorted frame-bin list.  One
    exchange on the series key — the SAME single exchange every window
    op here shares; both window passes reuse its sort order.
    """
    w_bin = (hi - lo) / bins
    order = [ts_ms] + ([tiebreak] if tiebreak else [])
    w_ord = W.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])
    w_run = w_ord.rowsBetween(W.unboundedPreceding, 0)
    b = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(value) - lo) / F.lit(w_bin)).cast("int")),
    )
    keep = list(dict.fromkeys([*keys, *order, value]))
    staged = df.select(*keep, b.alias("_bin")).select(
        "*",
        F.row_number().over(w_ord).alias("_rn"),
        *[
            F.sum(F.when(F.col("_bin") == i, 1).otherwise(0))
            .over(w_run)
            .cast("long")
            .alias(f"_cum{i}")
            for i in range(bins)
        ],
    )
    lagged = staged.select(
        "*",
        F.lag("_rn", lookback, 0).over(w_ord).alias("_rnlag"),
        *[
            F.lag(f"_cum{i}", lookback, 0).over(w_ord).alias(f"_lag{i}")
            for i in range(bins)
        ],
    )
    n = (F.col("_rn") - F.col("_rnlag")).cast("long")
    need = F.ceil(F.lit(0.5) * n)
    cnts = F.array(*[F.col(f"_cum{i}") - F.col(f"_lag{i}") for i in range(bins)])
    pairs = F.zip_with(
        cnts,
        F.sequence(F.lit(0), F.lit(bins - 1)),
        lambda c, i: F.struct(c.alias("c"), i.alias("i")),
    )
    chosen = F.aggregate(
        pairs,
        F.struct(F.lit(0).cast("long").alias("cum"), F.lit(-1).alias("bin")),
        lambda acc, x: F.struct(
            (acc["cum"] + x["c"]).alias("cum"),
            F.when(
                (acc["bin"] == F.lit(-1)) & (acc["cum"] + x["c"] >= need), x["i"]
            )
            .otherwise(acc["bin"])
            .alias("bin"),
        ),
    )["bin"]
    return lagged.select(
        *keys,
        F.col(ts_ms),
        F.col(value),
        F.round(F.lit(lo) + (chosen + F.lit(0.5)) * F.lit(w_bin), 6).alias(
            "rolling_median_est"
        ),
        n.alias("n_window"),
    )


def cap_events_per_key(
    df: DataFrame,
    keys: list[str],
    bucket_ms: int,
    cap: int,
    ts_ms: str = "ts_ms",
    tiebreak: str | None = None,
) -> DataFrame:
    """Keep at most ``cap`` earliest events per (key, time bucket) — the
    rate-capping / contributor-throttling pass of an ingestion pipeline
    (one hot user or device must not dominate a window's sample).
    Deterministic: events rank by (ts, tiebreak) inside their bucket, so
    retries keep the identical survivors.

    One shuffle on (keys, bucket); the rank window's exchange IS the
    partitioning, no second pass.  Survivor count per group ≤ cap by
    construction — downstream joins see bounded key fan-out, which is
    itself a skew mitigation.
    """
    order = [ts_ms] + ([tiebreak] if tiebreak else [])
    bucket = (F.col(ts_ms) - F.col(ts_ms) % F.lit(bucket_ms)).alias("bucket_ms")
    w = W.partitionBy(*keys, "bucket_ms").orderBy(*[F.col(c).asc() for c in order])
    return (
        df.withColumn("bucket_ms", bucket)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_ms: str = "ts_ms",
    within_ms: int | None = None,
) -> DataFrame:
    """Ordered conversion funnel per user: the earliest chain of step
    timestamps ``t1 < t2 < … < tk`` over the given event types, anchored
    at the user's EARLIEST step-1 event (the deterministic anchor makes
    the whole computation SQL-replayable; ClickHouse's windowFunnel
    slides the anchor instead — a documented semantic difference).
    ``within_ms`` additionally requires every later step inside
    ``t1 + within_ms``.  Greedy-earliest per prefix is exact for chain
    EXISTENCE given the fixed anchor: taking the minimum feasible
    timestamp at each step only loosens later constraints.

    Output: one row per user who reached step 1 — ``t1 … tk`` (null
    once a step is missed; construction guarantees nulls are suffix-
    closed) and ``steps_completed``.

    Scale shape: events are pre-filtered to the k funnel types (narrow
    projection), then k−1 user-keyed join+min rounds over shrinking
    step tables — every shuffle is user-keyed; nothing pairwise, and a
    user's full history is never materialized in one place (contrast a
    collect_list-per-user sequence scan).
    """
    ev = df.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col), F.col(type_col), F.col(ts_ms)
    )
    out = (
        ev.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_ms).alias("t1"))
    )
    for i, s in enumerate(steps[1:], start=2):
        cand = ev.filter(F.col(type_col) == s)
        cond = F.col(ts_ms) > F.col(f"t{i - 1}")
        if within_ms is not None:
            cond = cond & (F.col(ts_ms) <= F.col("t1") + F.lit(within_ms))
        prev_cols = [user_col, "t1"] if i == 2 else [user_col, "t1", f"t{i - 1}"]
        nxt = (
            cand.join(out.select(*prev_cols), user_col)
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min(ts_ms).alias(f"t{i}"))
        )
        out = out.join(nxt, user_col, "left")
    done = sum(
        (F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0) for i in range(2, len(steps) + 1)),
        F.lit(1),
    )
    return out.withColumn("steps_completed", done)


def ewma_chunked(
    df: DataFrame,
    key: str,
    alpha: float,
    chunk_ms: int = 86_400_000,
    ts_ms: str = "ts_ms",
    value: str = "value",
    tiebreak: str | None = None,
    cache: bool = True,
) -> DataFrame:
    """:func:`ewma` with bounded per-worker memory — the chunk-and-chain
    variant for series too long to fit one worker (the 100 TB mitigation
    that plain ``ewma``'s docstring promises).

    CACHING SIDE-EFFECT, stated plainly: with ``cache=True`` (default)
    the per-chunk fold output is ``.persist()``-ed (MEMORY_AND_DISK) and
    stays pinned on executors until the blocks age out by LRU or the
    caller releases them (``spark.catalog.clearCache()``, or collect the
    result and move on — one-shot pipelines never notice).  A long-lived
    session invoking this operator repeatedly should pass
    ``cache=False``, which trades the pinned blocks for re-executing the
    per-chunk fold twice (once for the summary agg, once for the final
    join).

    EWMA is a linear recurrence, so it admits the classic two-pass scan
    decomposition (Blelloch):

    1. **Local fold** per ``(key, chunk)`` where ``chunk = ts_ms div
       chunk_ms``: run the recursion with zero carry-in, recording for
       each row its local state ``L_i`` and decay ``β^i`` (i = 1-based
       position in the chunk).  Each Arrow batch holds ONE chunk, not the
       whole series — memory is O(chunk), independent of series length.
    2. **Chain** per ``key`` over the per-chunk summaries (last local
       state, ``β^n``, first value — one tiny row per chunk): the carry
       into chunk k+1 is ``end_local_k + β^{n_k}·carry_k``, exactly how
       ``streaming.stateful.ema_stream`` chains state across micro-batches.
       The init rule ``s_1 = x_1`` is algebraically a virtual carry-in
       equal to the first value: ``x = α·x + β·x``.
    3. **Recombine**: join carries back on ``(key, chunk)`` and emit
       ``s_i = L_i + β^i · carry`` — per-row arithmetic, no state.

    Recombination reorders float ops vs the sequential fold, so agreement
    with :func:`ewma` is exact-after-rounding (6 dp), not bit-for-bit
    before it; ``tests/test_timeseries.py`` locks the equality on real
    data and the same DuckDB recursive-CTE oracle covers both.  ``β^i``
    underflows to 0.0 for rows deep inside a chunk — benign: the carry's
    true influence decays identically.

    Cost: one extra exchange over plain ``ewma`` (chunk-grouped fold +
    carry join vs one series-grouped fold) — the price of bounded memory.
    Same template applies to :func:`holt_smoothing` (2-dim linear state
    (level, trend) — chain a 2×2 matrix product), :func:`resample_interpolate`
    and :func:`lttb` (chunk at bucket boundaries; only boundary points
    cross chunks).
    """
    import numpy as np

    sort_cols = [ts_ms] + ([tiebreak] if tiebreak else [])
    beta = 1.0 - alpha

    base = df.select(key, *sort_cols, value).withColumn(
        "_chunk", F.floor(F.col(ts_ms) / F.lit(chunk_ms)).cast("long")
    )

    def _local(pdf):
        pdf = pdf.sort_values(sort_cols)
        vals = pdf[value].to_numpy(dtype="float64")
        n = len(vals)
        loc = np.empty(n)
        dec = np.empty(n)
        s, d = 0.0, 1.0
        for i, x in enumerate(vals):
            s = alpha * x + beta * s
            d *= beta
            loc[i] = s
            dec[i] = d
        pdf["_local"] = loc
        pdf["_decay"] = dec
        return pdf

    # StructType.add mutates in place — build a fresh schema so ``base``'s
    # own schema object is left untouched
    local_schema = T.StructType(
        list(base.schema.fields)
        + [T.StructField("_local", T.DoubleType()), T.StructField("_decay", T.DoubleType())]
    )
    # persist: the fold output feeds BOTH the summary agg and the final
    # join — without it Spark re-executes the whole per-chunk fold twice
    # (verified in the physical plan).  MEMORY_AND_DISK default spills
    # oversized partitions instead of OOMing; at cluster scale a temp
    # table write serves the same role.  See the docstring's caching
    # side-effect note; cache=False trades pinned blocks for recompute.
    rows = base.groupBy(key, "_chunk").applyInPandas(_local, schema=local_schema)
    if cache:
        rows = rows.persist()

    # one tiny row per chunk; _decay is strictly decreasing so min = β^n
    summaries = rows.groupBy(key, "_chunk").agg(
        F.max_by("_local", F.struct(*sort_cols)).alias("_end_local"),
        F.min("_decay").alias("_end_decay"),
        F.min_by(F.col(value), F.struct(*sort_cols)).alias("_first_val"),
    )

    def _chain(pdf):
        pdf = pdf.sort_values("_chunk")
        carries = np.empty(len(pdf))
        c = 0.0
        for i, (el, ed, fv) in enumerate(
            zip(pdf["_end_local"], pdf["_end_decay"], pdf["_first_val"])
        ):
            c = fv if i == 0 else c
            carries[i] = c
            c = el + ed * c
        pdf["_carry"] = carries
        return pdf[[key, "_chunk", "_carry"]]

    chain_schema = T.StructType(
        [summaries.schema[key], summaries.schema["_chunk"], T.StructField("_carry", T.DoubleType())]
    )
    carries = summaries.groupBy(key).applyInPandas(_chain, schema=chain_schema)

    return (
        rows.join(carries, [key, "_chunk"])
        .withColumn("ewma", F.round(F.col("_local") + F.col("_decay") * F.col("_carry"), 6))
        .select(key, *sort_cols, value, "ewma")
    )


def holt_smoothing(
    df: DataFrame,
    key: str,
    alpha: float,
    beta: float,
    ts_ms: str = "ts_ms",
    value: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """Holt double-exponential smoothing per series — level + trend, the
    step past EWMA for drifting series (Holt 1957; the non-seasonal core
    of Holt-Winters):

        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    Initialization is l_1 = x_1, b_1 = 0 (trend learned from data), so
    single-point series are well-defined and the recursion needs no
    lookahead.  ``forecast`` is the one-step-ahead l_t + b_t.

    Like :func:`ewma`, the recursion is written out with the exact
    constants (α, 1−α, β, 1−β precomputed as Python floats) in the exact
    order a recursive-CTE oracle evaluates, so both engines agree
    bit-for-bit before the 6-dp output rounding.  Same scale contract as
    ewma: one shuffle on the series key; chain boundary state across
    coarse time chunks for a pathological series.
    """
    import numpy as np

    sort_cols = [ts_ms] + ([tiebreak] if tiebreak else [])
    a, oma = alpha, 1.0 - alpha
    bt, omb = beta, 1.0 - beta

    def _holt(pdf):
        pdf = pdf.sort_values(sort_cols)
        vals = pdf[value].to_numpy(dtype="float64")
        levels = np.empty(len(vals))
        trends = np.empty(len(vals))
        l = b = 0.0
        for i, x in enumerate(vals):
            if i == 0:
                l, b = x, 0.0
            else:
                lp = l
                l = a * x + oma * (lp + b)
                b = bt * (l - lp) + omb * b
            levels[i] = l
            trends[i] = b
        pdf["level"] = np.round(levels, 6)
        pdf["trend"] = np.round(trends, 6)
        pdf["forecast"] = np.round(levels + trends, 6)
        return pdf

    out_schema = (
        df.select(key, *sort_cols, value)
        .schema.add("level", "double")
        .add("trend", "double")
        .add("forecast", "double")
    )
    return (
        df.select(key, *sort_cols, value)
        .groupBy(key)
        .applyInPandas(_holt, schema=out_schema)
    )


def holt_chunked(
    df: DataFrame,
    key: str,
    alpha: float,
    beta: float,
    chunk_ms: int = 86_400_000,
    ts_ms: str = "ts_ms",
    value: str = "value",
    tiebreak: str | None = None,
    cache: bool = True,
) -> DataFrame:
    """:func:`holt_smoothing` with bounded per-worker memory — the 2-dim
    instantiation of the :func:`ewma_chunked` chunk-and-chain template
    (including its caching side-effect: ``cache=True`` persists the
    per-chunk fold output until released — see ewma_chunked's note —
    and ``cache=False`` re-executes the fold twice instead).

    Substituting the level update into the trend update shows Holt is a
    linear recurrence in the state vector s = (l, b):

        s_t = A·s_{t−1} + (α, αβ)·x_t,   A = [[1−α, 1−α], [−αβ, 1−αβ]]

    with A CONSTANT, so the scan decomposition carries a 2×2 matrix power
    instead of ewma's scalar β^i:

    1. **Local fold** per ``(key, chunk)``: zero-carry state L_i plus the
       cumulative matrix power A^i (4 doubles per row).
    2. **Chain** per ``key`` over per-chunk summaries: carry into chunk
       k+1 is ``L_n + A^n·carry_k``.  The init rule (l₁, b₁) = (x₁, 0)
       is the virtual carry s₀ = (x₁, 0): A·(x₁,0) = ((1−α)x₁, −αβx₁)
       matches the first step exactly.
    3. **Recombine**: ``(l_i, b_i) = L_i + A^i·carry`` per row.

    Same exact-after-6-dp-rounding contract as ewma_chunked (recombination
    reorders float ops); shares holt_smoothing's recursive-CTE oracle.
    """
    import numpy as np

    sort_cols = [ts_ms] + ([tiebreak] if tiebreak else [])
    a, oma = alpha, 1.0 - alpha
    ab = alpha * beta

    # A = [[1-α, 1-α], [-αβ, 1-αβ]]
    A = np.array([[oma, oma], [-ab, 1.0 - ab]], dtype="float64")

    base = df.select(key, *sort_cols, value).withColumn(
        "_chunk", F.floor(F.col(ts_ms) / F.lit(chunk_ms)).cast("long")
    )

    def _local(pdf):
        pdf = pdf.sort_values(sort_cols)
        vals = pdf[value].to_numpy(dtype="float64")
        n = len(vals)
        out = np.empty((n, 6))
        s = np.zeros(2)
        P = np.eye(2)
        for i, x in enumerate(vals):
            s = A @ s + np.array([a * x, ab * x])
            P = A @ P
            out[i, 0:2] = s
            out[i, 2:6] = P.ravel()
        for j, c in enumerate(["_ll", "_lb", "_p11", "_p12", "_p21", "_p22"]):
            pdf[c] = out[:, j]
        return pdf

    local_schema = T.StructType(
        list(base.schema.fields)
        + [T.StructField(c, T.DoubleType()) for c in ["_ll", "_lb", "_p11", "_p12", "_p21", "_p22"]]
    )
    rows = base.groupBy(key, "_chunk").applyInPandas(_local, schema=local_schema)
    if cache:
        rows = rows.persist()

    last = F.struct(*sort_cols)
    summaries = rows.groupBy(key, "_chunk").agg(
        *[F.max_by(c, last).alias("_e" + c) for c in ["_ll", "_lb", "_p11", "_p12", "_p21", "_p22"]],
        F.min_by(F.col(value), last).alias("_first_val"),
    )

    def _chain(pdf):
        pdf = pdf.sort_values("_chunk")
        n = len(pdf)
        out = np.empty((n, 2))
        c = np.zeros(2)
        for i in range(n):
            r = pdf.iloc[i]
            if i == 0:
                c = np.array([r["_first_val"], 0.0])
            out[i] = c
            P = np.array([[r["_e_p11"], r["_e_p12"]], [r["_e_p21"], r["_e_p22"]]])
            c = np.array([r["_e_ll"], r["_e_lb"]]) + P @ c
        pdf["_cl"] = out[:, 0]
        pdf["_cb"] = out[:, 1]
        return pdf[[key, "_chunk", "_cl", "_cb"]]

    chain_schema = T.StructType(
        [
            summaries.schema[key],
            summaries.schema["_chunk"],
            T.StructField("_cl", T.DoubleType()),
            T.StructField("_cb", T.DoubleType()),
        ]
    )
    carries = summaries.groupBy(key).applyInPandas(_chain, schema=chain_schema)

    lvl = F.col("_ll") + F.col("_p11") * F.col("_cl") + F.col("_p12") * F.col("_cb")
    trd = F.col("_lb") + F.col("_p21") * F.col("_cl") + F.col("_p22") * F.col("_cb")
    return (
        rows.join(carries, [key, "_chunk"])
        .withColumn("level", F.round(lvl, 6))
        .withColumn("trend", F.round(trd, 6))
        .withColumn("forecast", F.round(lvl + trd, 6))
        .select(key, *sort_cols, value, "level", "trend", "forecast")
    )


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


def resample_interpolate_expr(
    df: DataFrame,
    key: str,
    step_ms: int,
    ts_ms: str = "ts_ms",
    value: str = "value",
) -> DataFrame:
    """:func:`resample_interpolate` as pure JVM expressions — same output
    (np.interp semantics: linear between bracketing observations, clamp
    to first/last value outside the observed range), no Python boundary
    and NO per-series-fits-a-worker constraint.

    Shape (the :func:`gapfill_locf` pattern): per-series bounds → JVM
    ``sequence``+``explode`` grid, union with the observations, then ONE
    series-key window pass computes each grid point's bracketing
    observation on both sides via ``last(..., ignorenulls)`` /
    ``first(..., ignorenulls)`` ROWS frames — observations sort before
    coincident grid points, so a grid point exactly on a sample
    reproduces that sample bit-for-bit (the lerp term is exactly 0).
    Two series-keyed exchanges total; rows stream through the window
    operator, so a years-long series costs sort time, not worker memory.
    Requires strictly increasing ``ts_ms`` per series (same contract as
    np.interp's neighbour choice — collapse duplicates first).
    """
    obs = df.select(
        key,
        F.col(ts_ms).cast("long").alias(ts_ms),
        F.col(value).cast("double").alias(value),
    )
    bounds = obs.groupBy(key).agg(
        (F.floor(F.min(ts_ms) / step_ms).cast("long") * step_ms).alias("_lo"),
        F.max(ts_ms).alias("_hi"),
    )
    grid = (
        bounds.select(
            key,
            F.explode(F.sequence("_lo", "_hi", F.lit(step_ms))).alias(ts_ms),
        )
        .withColumn(value, F.lit(None).cast("double"))
        .withColumn("_is_grid", F.lit(1))
    )
    tagged = obs.withColumn("_is_grid", F.lit(0)).unionByName(grid)
    order = [F.col(ts_ms).asc(), F.col("_is_grid").asc()]
    wprev = W.partitionBy(key).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    wnext = W.partitionBy(key).orderBy(*order).rowsBetween(0, W.unboundedFollowing)
    obs_ts = F.when(F.col(value).isNotNull(), F.col(ts_ms))
    lerp = F.col("_pv") + (F.col("_nv") - F.col("_pv")) / (
        F.col("_nt") - F.col("_pt")
    ).cast("double") * (F.col(ts_ms) - F.col("_pt")).cast("double")
    return (
        tagged.withColumn("_pv", F.last(value, ignorenulls=True).over(wprev))
        .withColumn("_pt", F.last(obs_ts, ignorenulls=True).over(wprev))
        .withColumn("_nv", F.first(value, ignorenulls=True).over(wnext))
        .withColumn("_nt", F.first(obs_ts, ignorenulls=True).over(wnext))
        .filter(F.col("_is_grid") == 1)
        .select(
            key,
            F.col(ts_ms),
            F.round(
                F.when(F.col("_pv").isNull(), F.col("_nv"))
                .when(F.col("_nv").isNull(), F.col("_pv"))
                .otherwise(lerp),
                6,
            ).alias(value),
        )
    )


def mad_anomalies(
    df: DataFrame,
    keys: list[str],
    ts_ms: str = "ts_ms",
    value: str = "value",
    n_sigmas: float = 3.0,
) -> DataFrame:
    """Robust anomaly detection: flag points whose absolute deviation from
    the per-series MEDIAN exceeds ``n_sigmas`` × 1.4826 × MAD (median
    absolute deviation; 1.4826 scales MAD to σ under normality).  Unlike
    the mean/stddev z-score (``zscore_anomalies``), one huge outlier can't
    inflate its own baseline.

    Shape: ONE exchange on the series key — the median and the MAD are
    exact ``percentile`` aggregates over two Window nodes that share the
    same partitioning (no order needed for an unbounded frame), so
    Catalyst plans a single shuffle.  Both medians are quantized to 6 dp
    before the deviation/threshold math so results are reproducible
    across engines and partitionings.
    """
    w = W.partitionBy(*keys)
    med = F.round(F.expr(f"percentile({value}, 0.5)").over(w), 6)
    with_med = df.select(
        *keys, F.col(ts_ms), F.col(value), med.alias("med")
    ).withColumn("dev", F.abs(F.col(value) - F.col("med")))
    mad = F.round(F.expr("percentile(dev, 0.5)").over(w), 6)
    return (
        with_med.withColumn("mad", mad)
        .withColumn(
            "is_anomaly", F.col("dev") > F.lit(n_sigmas) * F.lit(1.4826) * F.col("mad")
        )
        .drop("dev")
    )


def gapfill_locf(
    df: DataFrame,
    key: str,
    step_ms: int,
    ts_ms: str = "ts_ms",
    value: str = "value",
) -> DataFrame:
    """Gap-fill each series to a regular ``step_ms`` grid, carrying the
    last observation forward (TimescaleDB ``time_bucket_gapfill`` +
    ``locf`` semantics; grid points before the first observation stay
    NULL).  Entirely built-in JVM ops — ``sequence``+``explode`` builds
    the grid, real observations union in beneath their grid slots, and one
    ``last(ignorenulls)`` window per series does the carry; no Python in
    the path.

    Duplicate timestamps within a series collapse with ``max(value)``
    first so the carried value is deterministic.  Scale shape: the fact
    table moves twice — one explicit repartition on the series key that
    the (key, ts) collapse AND the per-series bounds agg both reuse
    (hash(key) clusters every (key, ts) group, so neither re-exchanges),
    then the carry window's own exchange after the grid unions in; the
    grid itself is |series| × buckets rows (tiny).
    """
    pts = (
        df.select(key, ts_ms, value)
        .repartition(F.col(key))
        .groupBy(key, ts_ms)
        .agg(F.max(value).alias(value))
    )
    lo = (F.floor(F.min(ts_ms) / step_ms) * step_ms).cast("long")
    bounds = pts.groupBy(key).agg(lo.alias("lo"), F.max(ts_ms).alias("hi"))
    grid = bounds.select(
        key,
        F.explode(F.sequence("lo", "hi", F.lit(step_ms).cast("long"))).alias(ts_ms),
        F.lit(1).alias("is_grid"),
        F.lit(None).cast("double").alias(value),
    )
    union = pts.withColumn("is_grid", F.lit(0)).unionByName(grid)
    w = (
        W.partitionBy(key)
        .orderBy(ts_ms, "is_grid")  # real row wins a tie with its grid slot
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        union.withColumn("value_locf", F.last(value, ignorenulls=True).over(w))
        .filter(F.col("is_grid") == 1)
        .select(key, ts_ms, "value_locf")
    )


def lttb(
    df: DataFrame,
    key: str,
    n_out: int,
    ts_ms: str = "ts_ms",
    value: str = "value",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) —
    the standard TSDB visualization downsampler (TimescaleDB ``lttb``
    hyperfunction parity).  Keeps first and last point per series, splits
    the middle into ``n_out - 2`` buckets, and per bucket picks the point
    forming the largest triangle with the previous pick and the next
    bucket's centroid.  Series with ≤ ``n_out`` points pass through.

    The pick is sequential per series → ``applyInPandas``.  Cross-engine
    determinism: duplicate timestamps collapse with max(value) first,
    bucket index uses integer floor division, the centroid y is quantized
    to 6 dp, the area expression is the same IEEE double expression the
    SQL oracle evaluates, and ties take the earliest point (np.argmax).

    Scale shape: one shuffle on the series key; each series must fit a
    worker (LTTB is inherently sequential per series).  At 100 TB use
    :func:`lttb_chunked`, which bounds worker memory at one
    (series, chunk) group via per-chunk independent anchoring.
    """
    def pick(pdf):
        return _lttb_pick_pdf(pdf, n_out, key, ts_ms, value)

    schema = f"{key} string, {ts_ms} long, {value} double"
    return df.select(key, ts_ms, value).groupBy(key).applyInPandas(pick, schema=schema)


def _lttb_pick_pdf(pdf, n_out: int, key: str, ts_ms: str, value: str):
    """The sequential LTTB picker over ONE in-memory group (a whole
    series for :func:`lttb`, one (series, chunk) for
    :func:`lttb_chunked`) — duplicate timestamps collapse with max,
    integer floor-division bucketing, 6-dp centroid y, first-max
    tie-break; see the callers' docstrings for the cross-engine
    determinism contract."""
    import numpy as np

    pdf = (
        pdf.groupby(ts_ms, as_index=False)
        .agg({value: "max", key: "first"})
        .sort_values(ts_ms)
        .reset_index(drop=True)
    )
    n = len(pdf)
    if n <= n_out:
        return pdf[[key, ts_ms, value]]
    xs = pdf[ts_ms].to_numpy(dtype="float64")
    ys = pdf[value].to_numpy(dtype="float64")
    nb = n_out - 2
    # middle points 1..n-2 → local j = i-1 in [0, n-3]; bucket k = j*nb // (n-2)
    j = np.arange(n - 2, dtype="int64")
    bucket = (j * nb) // (n - 2)
    sel = [0]
    for k in range(nb):
        cand = np.where(bucket == k)[0] + 1  # global indices of bucket k
        if k < nb - 1:
            nxt = np.where(bucket == k + 1)[0] + 1
            bx = float(np.mean(xs[nxt]))
            by = round(float(np.mean(ys[nxt])), 6)
        else:
            bx, by = float(xs[n - 1]), float(ys[n - 1])
        ax, ay = float(xs[sel[-1]]), float(ys[sel[-1]])
        area = np.abs(
            (ax - bx) * (ys[cand] - ay) - (ax - xs[cand]) * (by - ay)
        )
        sel.append(int(cand[int(np.argmax(area))]))
    sel.append(n - 1)
    return pdf.iloc[sel][[key, ts_ms, value]]


def lttb_chunked(
    df: DataFrame,
    key: str,
    n_out: int,
    chunk_ms: int,
    ts_ms: str = "ts_ms",
    value: str = "value",
) -> DataFrame:
    """Bounded-memory approximate LTTB: split each series into
    ``chunk_ms`` time chunks, run the exact sequential picker
    INDEPENDENTLY per chunk with an output quota proportional to the
    chunk's share of the series' (distinct-timestamp) points —
    ``max(2, (n_out · cnt) // n_total)`` — and union the picks.

    Why it exists: exact LTTB's triangle anchor is a sequential carry
    through the whole series, so :func:`lttb` must hold ONE ENTIRE
    SERIES in a worker's memory — a billion-point series OOMs it
    (SCALE.md names this residual).  Chunking caps the Arrow batch at
    one (series, chunk) group regardless of series length.  The price,
    stated plainly: each chunk re-anchors from its own first point and
    always keeps its own endpoints, so picks near chunk boundaries can
    differ from exact LTTB's (a test quantifies the divergence on the
    driver data) and total output is Σ quotas ≈ ``n_out`` + up to one
    extra point per chunk from quota flooring and the ≥2 endpoint
    floor.

    Shape: the (series, chunk) quota table is series×chunks rows
    (tiny); joining it back re-uses the SAME (key, chunk) hash
    partitioning the ``applyInPandas`` grouping needs, so the corpus
    crosses exactly one exchange, same as exact :func:`lttb`.
    """
    base = df.select(key, ts_ms, value).withColumn(
        "_chunk", (F.col(ts_ms) - F.col(ts_ms) % F.lit(chunk_ms)).cast("long")
    )
    # quota ∝ distinct-ts count (LTTB collapses duplicate timestamps
    # before bucketing, so proportionality must count what it keeps)
    cnts = base.groupBy(key, "_chunk").agg(
        F.countDistinct(ts_ms).alias("_cnt")
    )
    quotas = (
        cnts.withColumn("_ntot", F.sum("_cnt").over(W.partitionBy(key)))
        .withColumn(
            "_quota",
            F.greatest(
                F.lit(2).cast("long"),
                F.floor((F.lit(n_out) * F.col("_cnt")) / F.col("_ntot")).cast("long"),
            ),
        )
        .select(key, "_chunk", "_quota")
    )

    def pick(pdf):
        return _lttb_pick_pdf(pdf, int(pdf["_quota"].iloc[0]), key, ts_ms, value)

    schema = f"{key} string, {ts_ms} long, {value} double"
    return (
        base.join(quotas, [key, "_chunk"])
        .groupBy(key, "_chunk")
        .applyInPandas(pick, schema=schema)
    )


def seasonal_baseline(
    df: DataFrame,
    keys: list[str],
    ts_ms: str = "ts_ms",
    value: str = "value",
    period_ms: int = 86_400_000,
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Seasonal-profile decomposition: for each series, the mean value per
    phase-of-period bucket (default: hour-of-day over a daily period) is
    the seasonal baseline; each point's residual is its deviation from the
    baseline — the standard first step of seasonal anomaly detection and
    the seasonal-naive forecast (next value ≈ baseline of its phase).

    The baseline is QUANTIZED to 6 dp before residuals are formed, so
    residuals are reproducible across engines and partitionings (raw float
    means differ in summation order).

    Scale shape: one groupBy over (series, phase) — at most |series|×24
    rows — broadcast back onto the fact table; the fact table itself never
    shuffles.
    """
    phase = ((F.col(ts_ms) % period_ms) / bucket_ms).cast("long")
    with_phase = df.withColumn("phase", phase)
    baseline = (
        with_phase.groupBy(*keys, "phase")
        .agg(F.round(F.avg(value), 6).alias("baseline"))
    )
    return (
        with_phase.join(F.broadcast(baseline), [*keys, "phase"])
        .select(
            *keys,
            F.col(ts_ms),
            "phase",
            F.col(value),
            "baseline",
            F.round(F.col(value) - F.col("baseline"), 6).alias("residual"),
        )
    )


def stl_decompose(
    df: DataFrame,
    keys: list[str],
    ts_ms: str = "ts_ms",
    value: str = "value",
    period_ms: int = 86_400_000,
    bucket_ms: int = 3_600_000,
    trend_buckets: int = 25,
    value_decimals: int = 2,
) -> DataFrame:
    """STL-style seasonal-trend decomposition (Cleveland et al. 1990,
    moving-average flavor): regularize each series to ``bucket_ms``
    means, estimate TREND as a centered ``trend_buckets``-wide moving
    average, SEASONAL as the per-phase mean of the detrended series
    (centered to zero mean per series so trend and seasonal are
    identifiable), and RESIDUAL as what's left — the full additive
    y = trend + seasonal + residual decomposition that
    :func:`seasonal_baseline` only approximates (its baseline absorbs
    trend; here a drifting series doesn't contaminate the seasonal
    profile).  Classical STL iterates loess fits; the single
    moving-average pass is the standard scalable variant and keeps the
    op exactly SQL-reproducible.

    Edge buckets average over the rows available in the frame (ROWS
    BETWEEN n PRECEDING AND n FOLLOWING), the usual boundary handling.
    Every intermediate is quantized to 6 dp before the next stage —
    same discipline as :func:`seasonal_baseline` — and every DERIVED
    mean (trend, seasonal, seasonal centering) is computed as an exact
    integer sum of the 1e6-scaled 6-dp inputs divided once at the end:
    float summation is order-dependent, and with four chained stages a
    single summation-order flip at a .xxxxxx5 round boundary cascades;
    integer sums make the decomposition bit-reproducible across
    engines and partitionings regardless of aggregation order.

    Scale shape: one (keys, bucket) aggregate shrinks the corpus to
    series-length rows; the trend window and the two seasonal
    aggregates all run on that reduced table (per-series partitions,
    phase tables at most |series| x period/bucket rows, broadcast
    back).  The raw fact table shuffles exactly once.
    """
    half = trend_buckets // 2
    per = period_ms // bucket_ms

    def _int6(c):  # 6-dp value -> exact 1e6-scaled integer
        return F.round(c * 1e6, 0).cast("bigint")

    def _mean6(int_sum, cnt):  # exact-int sum -> 6-dp mean
        return F.round((int_sum / cnt) / 1e6, 6)

    # the bucket mean itself must be exact-integer derived too: float
    # avg() is sum-order dependent, and across engines a ~1e-13 drift
    # lands a few of the thousands of 6-dp rounds per sf0.1 series on a
    # boundary (measured: 2/3600 rows).  Inputs are fixed-decimal in
    # practice (sensor/financial feeds; ``value_decimals`` names the
    # precision, default 2), so sum(value·10^d as long)/n is exact IEEE
    # in any engine — inputs with MORE entropy than 10^-d are quantized
    # at ingestion grain, stated rather than silently float-summed.
    scale = float(10**value_decimals)
    hourly = (
        df.groupBy(*keys, (F.col(ts_ms) / bucket_ms).cast("long").alias("bucket"))
        .agg(
            F.round(
                F.sum(F.round(F.col(value) * scale, 0).cast("long"))
                / F.count("*")
                / F.lit(scale),
                6,
            ).alias("y")
        )
        .withColumn("_yi", _int6(F.col("y")))
    )
    w = W.partitionBy(*keys).orderBy("bucket").rowsBetween(-half, half)
    det = (
        hourly.withColumn(
            "trend", _mean6(F.sum("_yi").over(w), F.count("_yi").over(w))
        )
        .withColumn("phase", F.col("bucket") % per)
        .withColumn("det", F.round(F.col("y") - F.col("trend"), 6))
    )
    seas = det.groupBy(*keys, "phase").agg(
        _mean6(F.sum(_int6(F.col("det"))), F.count("*")).alias("s_raw")
    )
    smean = seas.groupBy(*keys).agg(
        _mean6(F.sum(_int6(F.col("s_raw"))), F.count("*")).alias("s_mean")
    )
    seas_c = seas.join(F.broadcast(smean), [*keys]).select(
        *keys,
        "phase",
        F.round(F.col("s_raw") - F.col("s_mean"), 6).alias("seasonal"),
    )
    return det.join(F.broadcast(seas_c), [*keys, "phase"]).select(
        *keys,
        "bucket",
        "phase",
        "y",
        "trend",
        "seasonal",
        F.round(F.col("y") - F.col("trend") - F.col("seasonal"), 6).alias("residual"),
    )



def holt_winters(
    df: DataFrame,
    key: str,
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
    ts_col: str = "bucket",
    value: str = "y",
) -> DataFrame:
    """Holt-Winters additive TRIPLE exponential smoothing per series —
    level + trend + seasonal, completing the exponential family
    (:func:`ewma` -> :func:`holt_smoothing` -> here; Winters 1960):

        s_old = s_{t-period}
        l_t = α·(x_t − s_old) + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ·(x_t − l_t) + (1−γ)·s_old

    Textbook initialization (zero-seeded seasonals diverge — the
    level/trend pair chases the raw oscillation and the seasonal state
    grows without bound; measured on a pure sine before this was
    switched): the first period is consumed as warm-up —

        l_m = mean(x_1..x_m)              (exact-integer mean of the
        b_m = (mean(x_{m+1}..x_{2m}) − l_m) / m    1e6-scaled inputs,
        s_i = x_i − l_m  for i = 1..m      the stl_decompose discipline)

    with b_m = 0 when the series is shorter than two periods, and
    emission starting at t = m+1 (series with ≤ period points emit
    nothing — they never leave warm-up).  ``forecast`` is the
    one-step-ahead l_t + b_t + s_{t+1−period}.

    Expects a REGULAR series (bucket first, as :func:`stl_decompose`
    does) — on irregular rows "period" would mean "every N
    observations".  Arithmetic is written constant-for-constant in
    recursive-CTE evaluation order so the DuckDB oracle (which seeds
    the recursion with the warm-up state and carries the seasonal
    history as a LIST) agrees bit-for-bit before 6-dp rounding.
    Scale contract as holt_smoothing: one shuffle on the series key;
    per-series state is O(period), so chunk-and-chain across coarse
    time chunks (carry level, trend, and the period-length seasonal
    ring) bounds worker memory for a pathological series.
    """
    import numpy as np

    a, oma = alpha, 1.0 - alpha
    bt, omb = beta, 1.0 - beta
    g, omg = gamma, 1.0 - gamma
    m = period

    def _hw(pdf):
        pdf = pdf.sort_values(ts_col)
        vals = pdf[value].to_numpy(dtype="float64")
        n = len(vals)
        if n <= m:
            return pdf.iloc[0:0].assign(
                level=np.empty(0), trend=np.empty(0),
                seasonal=np.empty(0), forecast=np.empty(0),
            )
        yi = np.round(vals * 1e6).astype(np.int64)
        l = (int(yi[:m].sum()) / m) / 1e6
        if n >= 2 * m:
            l1 = (int(yi[m : 2 * m].sum()) / m) / 1e6
            b = (l1 - l) / m
        else:
            b = 0.0
        ss = [float(x) - l for x in vals[:m]]
        k = n - m
        Q_D = 1073741824.0  # 2^30
        levels = np.empty(k)
        trends = np.empty(k)
        seas = np.empty(k)
        fcst = np.empty(k)
        for j in range(k):
            t = m + j + 1
            x = float(vals[t - 1])
            s_old = ss[t - m - 1]
            lp = l
            # BINARY-grid state quantization (2^-30) each step, both
            # engines: cross-engine float drift otherwise COMPOUNDS
            # through the recursion to ~1e-9 by sf0.1 series lengths and
            # straddles 6-dp output-round boundaries (measured: 9/3480
            # rows).  A decimal per-step round would re-create the
            # problem one level down (10-dp states sit ON 6-dp midpoints
            # ~1e-4 of the time, where engines' decimal-scaling
            # internals disagree); floor(x*2^30 + 0.5)/2^30 is exact
            # IEEE arithmetic, bit-identical everywhere, and its 9.3e-10
            # grid is far above the 1e-15 single-step drift it resets
            l = np.floor((a * (x - s_old) + oma * (lp + b)) * Q_D + 0.5) / Q_D
            b = np.floor((bt * (l - lp) + omb * b) * Q_D + 0.5) / Q_D
            s = np.floor((g * (x - l) + omg * s_old) * Q_D + 0.5) / Q_D
            ss.append(s)
            levels[j] = l
            trends[j] = b
            seas[j] = s
            fcst[j] = l + b + ss[t + 1 - m - 1]
        out = pdf.iloc[m:].copy()
        out["level"] = np.round(levels, 6)
        out["trend"] = np.round(trends, 6)
        out["seasonal"] = np.round(seas, 6)
        out["forecast"] = np.round(fcst, 6)
        return out

    out_schema = (
        df.select(key, ts_col, value)
        .schema.add("level", "double")
        .add("trend", "double")
        .add("seasonal", "double")
        .add("forecast", "double")
    )
    return df.select(key, ts_col, value).groupBy(key).applyInPandas(
        _hw, schema=out_schema
    )


def hw_backtest(
    df: DataFrame,
    key: str,
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
    horizons: tuple[int, ...] = (1, 3, 6, 12),
    ts_col: str = "bucket",
    value: str = "y",
) -> DataFrame:
    """Rolling-origin forecast backtest (Tashman 2000's evaluation
    protocol) for :func:`holt_winters`: EVERY post-warm-up point is a
    forecast origin, the additive h-step forecast
    ``l_t + h·b_t + s_{t+h−period}`` is scored against the realized
    value h steps later, and errors aggregate to per-(series, horizon)
    MAE/RMSE — the table that answers "how far ahead is this model
    usable?".

    The trick that keeps this ONE pass: the smoothing recursion already
    computes the state at every t, so an h-step forecast from origin t
    is a pure window expression over the fitted output — ``lag(seasonal,
    period−h)`` fetches s_{t+h−period}, ``lead(y, h)`` fetches the
    actual — no re-fitting per origin (the naive backtest re-runs the
    fit O(n) times).  All horizons share one (key, ts) window spec, so
    the whole backtest adds ZERO shuffles beyond holt_winters' own
    series-key exchange.  Origins where the series has a gap (lead/lag
    bucket isn't exactly ±h/±(period−h)) are dropped, not silently
    mis-scored.  Requires h < period (the first seasonal cycle of
    forecasts reuses in-sample seasonal state).
    """
    if not all(0 < h < period for h in horizons):
        raise ValueError("horizons must be in (0, period)")
    hw = holt_winters(df, key, alpha, beta, gamma, period, ts_col, value)
    w = W.partitionBy(key).orderBy(ts_col)
    # window expressions must be materialized as plain columns before the
    # explode (generators reject window functions); all lags/leads share
    # one window spec, so this is still a single sort within one exchange
    wide = hw.select(
        F.col(key),
        F.col(ts_col),
        "level",
        "trend",
        *[
            c
            for h in horizons
            for c in (
                F.lead(ts_col, h).over(w).alias(f"_nb{h}"),
                F.lead(value, h).over(w).alias(f"_ny{h}"),
                F.lag("seasonal", period - h).over(w).alias(f"_sl{h}"),
                F.lag(ts_col, period - h).over(w).alias(f"_sb{h}"),
            )
        ],
    )
    entries = []
    for h in horizons:
        ok = (F.col(f"_nb{h}") == F.col(ts_col) + h) & (
            F.col(f"_sb{h}") == F.col(ts_col) - (period - h)
        )
        fc = F.round(
            F.col("level") + F.lit(float(h)) * F.col("trend") + F.col(f"_sl{h}"), 6
        )
        entries.append(
            F.struct(
                F.lit(h).alias("horizon"),
                F.when(ok, fc - F.col(f"_ny{h}")).alias("err"),
            )
        )
    ex = (
        wide.select(F.col(key), F.explode(F.array(*entries)).alias("e"))
        .select(key, "e.horizon", "e.err")
        .filter(F.col("err").isNotNull())
    )
    return ex.groupBy(key, "horizon").agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.abs("err")), 6).alias("mae"),
        F.round(F.sqrt(F.avg(F.col("err") * F.col("err"))), 6).alias("rmse"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_ms: str = "ts_ms",
    period_ms: int = 7 * 24 * 3_600_000,
) -> DataFrame:
    """Cohort retention grid — the classic product-analytics rollup: users
    are cohorted by the period of their FIRST event, and each
    (cohort, period-offset) cell counts how many of them were active
    that period, as a fraction of the cohort.

    Plan shape (all id-keyed, nothing corpus-quadratic):
      1. distinct (user, period) — one exchange with map-side partial
         dedup; rows out = active user-periods, not raw events;
      2. min(period) per user — user-keyed exchange over the deduped
         rows;
      3. activity ⋈ first-seen on user, then count(*) per
         (cohort, offset) — the join is user-keyed, and because step 1
         already deduped, a plain count IS the distinct-user count;
      4. cohort sizes are the offset-0 cells (every cohort member is by
         definition active in their first period) — a tiny self-join on
         cohort, broadcast-sized (#periods rows).

    Integer period arithmetic (``ts DIV period``) keeps the bucketing
    exact and engine-portable.  Output: one row per (cohort_start_ms,
    period_offset) with n_active, cohort_size, retention_rate.
    """
    p = F.expr(f"{ts_ms} div {period_ms}")
    act = df.select(F.col(user_col).alias("u"), p.alias("p")).distinct()
    first = act.groupBy("u").agg(F.min("p").alias("cohort"))
    cell = (
        act.join(first, "u")
        .groupBy("cohort", (F.col("p") - F.col("cohort")).alias("period_offset"))
        .agg(F.count("*").alias("n_active"))
    )
    sizes = cell.filter(F.col("period_offset") == 0).select(
        "cohort", F.col("n_active").alias("cohort_size")
    )
    return (
        cell.join(F.broadcast(sizes), "cohort")
        .select(
            (F.col("cohort") * period_ms).alias("cohort_start_ms"),
            "period_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention_rate"),
        )
    )


def stl_anomalies(
    df: DataFrame,
    keys: list[str],
    ts_ms: str = "ts_ms",
    value: str = "value",
    period_ms: int = 86_400_000,
    bucket_ms: int = 3_600_000,
    trend_buckets: int = 25,
    n_sigmas: float = 3.0,
) -> DataFrame:
    """Seasonal-aware anomaly detection — the seasonal-hybrid pattern
    (Twitter's S-H-ESD shape, Hochenbaum et al. 2017, with the MAD
    threshold of :func:`mad_anomalies` in place of repeated ESD tests):
    decompose via :func:`stl_decompose`, then flag buckets whose
    RESIDUAL deviates from the per-series residual median by more than
    ``n_sigmas`` x 1.4826 x MAD.  A perfectly periodic spike (rush-hour
    load) never alarms because the seasonal component absorbs it — the
    failure mode of plain :func:`zscore_anomalies`/:func:`mad_anomalies`
    on seasonal series.

    Shape: everything after the decomposition runs on the bucketed
    series table (|series| x buckets rows, corpus already reduced), and
    both percentile windows share the decomposition's series-key
    partitioning.  Returns only the anomalous buckets.
    """
    dec = stl_decompose(df, keys, ts_ms, value, period_ms, bucket_ms, trend_buckets)
    w = W.partitionBy(*keys)
    med = F.round(F.expr("percentile(residual, 0.5)").over(w), 6)
    d = dec.select(*keys, "bucket", "y", "residual", med.alias("med")).withColumn(
        "dev", F.abs(F.col("residual") - F.col("med"))
    )
    mad = F.round(F.expr("percentile(dev, 0.5)").over(w), 6)
    return (
        d.withColumn("mad", mad)
        .filter(F.col("dev") > F.lit(n_sigmas) * F.lit(1.4826) * F.col("mad"))
        .select(*keys, "bucket", "y", "residual", "med", "mad")
    )


def xcorr_lagged(
    df: DataFrame,
    key: str,
    bucket_ms: int,
    max_lag: int,
    value: str = "value",
    ts_ms: str = "ts_ms",
    min_overlap: int = 2,
) -> DataFrame:
    """Lagged cross-correlation between every ordered pair of series:
    corr(a(t), b(t + lag)) for lag in [-max_lag, +max_lag] bucket steps
    — the lead/lag dependency probe of a TSDB's analytics tier (does
    `error` rise N hours AFTER `purchase` spikes?).  The sign
    convention: positive lag means b is SHIFTED LATER, i.e. a leads b.

    Scale shape: the raw table collapses FIRST to one row per (series,
    bucket) via a map-side partial average — everything after runs on
    |series| x |buckets| rows, invariant to the raw row count, so the
    pair-lag fan-out ((2*max_lag+1) x |pairs|) never touches raw data.
    The bucketed table self-joins on the equi-key (bucket + lag offset)
    after an explode of the 2*max_lag+1 lag values — no range join, no
    cross product; Spark broadcasts the smaller side automatically at
    real-world series counts.

    Returns (key_a, key_b, lag, xcorr, n_buckets) for key_a < key_b,
    xcorr rounded 6 dp, pairs with fewer than ``min_overlap``
    overlapping buckets dropped (corr undefined).
    """
    b = (
        df.select(
            F.col(key).alias("k"),
            (F.col(ts_ms) - F.col(ts_ms) % F.lit(bucket_ms)).alias("bucket"),
            F.col(value).alias("v"),
        )
        .groupBy("k", "bucket")
        .agg(F.avg("v").alias("v"))
    )
    lags = F.explode(
        F.sequence(F.lit(-max_lag), F.lit(max_lag))
    ).alias("lag")
    a = b.select(
        F.col("k").alias("key_a"), F.col("bucket").alias("ba"), F.col("v").alias("va")
    ).select("*", lags)
    bb = b.select(
        F.col("k").alias("key_b"), F.col("bucket").alias("bb"), F.col("v").alias("vb")
    )
    joined = a.join(
        bb,
        (F.col("bb") == F.col("ba") + F.col("lag") * F.lit(bucket_ms))
        & (F.col("key_a") < F.col("key_b")),
    )
    return (
        joined.groupBy("key_a", "key_b", "lag")
        .agg(
            F.round(F.corr("va", "vb"), 6).alias("xcorr"),
            F.count("*").alias("n_buckets"),
        )
        .where(F.col("n_buckets") >= F.lit(min_overlap))
    )


def scd2_build(
    df: DataFrame,
    key: str,
    attr: str,
    order: list[str],
    ts_ms: str = "ts_ms",
) -> DataFrame:
    """Collapse an append-only event log into a slowly-changing-dimension
    type-2 history: one row per (key, consecutive run of ``attr``), with
    [valid_from_ms, valid_to_ms) half-open validity, is_current on the
    open run, and a 1-based version counter — the standard warehouse
    dimension build (Kimball SCD type 2), done declaratively instead of
    with per-key MERGE loops.

    Scale shape: ONE key-partitioned window pass over the raw log
    detects run boundaries (lag + null-safe inequality); the second
    window pass (lead + row_number for validity/version) runs on the
    collapsed change rows only — for a dimension with c changes per key
    that is c/|log| of the data, and both passes share the same
    partitioning key so the second shuffle moves only change rows.
    No driver-side loop, no MERGE-per-batch.
    """
    w = W.partitionBy(key).orderBy(*order)
    changes = (
        df.select(key, attr, ts_ms, *[c for c in order if c not in (key, attr, ts_ms)])
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev", F.lag(attr).over(w))
        .where((F.col("_rn") == 1) | ~F.col(attr).eqNullSafe(F.col("_prev")))
    )
    w2 = W.partitionBy(key).orderBy(*order)
    return changes.select(
        F.col(key),
        F.col(attr),
        F.col(ts_ms).alias("valid_from_ms"),
        F.lead(ts_ms).over(w2).alias("valid_to_ms"),
        F.lead(ts_ms).over(w2).isNull().alias("is_current"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


def slo_burn_rate(
    df: DataFrame,
    error_col: str,
    slo: float,
    bucket_ms: int = 3_600_000,
    long_buckets: int = 6,
    alert_burn: float = 1.2,
    ts_ms: str = "ts_ms",
) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the Google SRE workbook
    pattern, batch form): per time bucket, the error-budget burn rate
    over the SHORT window (one bucket) and the LONG window (trailing
    ``long_buckets``), alerting only when BOTH exceed ``alert_burn`` —
    the short window gives fast reset, the long window suppresses
    one-bucket blips.

    burn = error_rate / (1 - slo); burn 1.0 means spending budget
    exactly at the rate that exhausts it by period end.

    Scale shape: the raw log collapses to one row per bucket via a
    map-side partial sum FIRST; the trailing-window pass runs on the
    collapsed hourly table (|period| / bucket_ms rows — hundreds, not
    billions), so the unpartitioned RANGE window at the end is the same
    deliberately-tiny finish window as the PSI operators
    (profile.psi_drift), never a skew hazard.

    ``error_col`` is a boolean column (or SQL expression string) marking
    failed requests.  Returns (bucket_ms, n, n_err, err_rate_short,
    err_rate_long, burn_short, burn_long, alert), rates/burns rounded
    6 dp.
    """
    err = F.expr(error_col) if isinstance(error_col, str) else F.col(error_col)
    hourly = (
        df.select(
            (F.col(ts_ms) - F.col(ts_ms) % F.lit(bucket_ms)).alias("bucket_ms"),
            err.cast("int").alias("e"),
        )
        .groupBy("bucket_ms")
        .agg(F.count("*").alias("n"), F.sum("e").alias("n_err"))
    )
    return burn_from_counts(
        hourly,
        slo=slo,
        bucket_ms=bucket_ms,
        long_buckets=long_buckets,
        alert_burn=alert_burn,
    )


def burn_from_counts(
    hourly: DataFrame,
    slo: float,
    bucket_ms: int = 3_600_000,
    long_buckets: int = 6,
    alert_burn: float = 1.2,
) -> DataFrame:
    """Price burn rates from MERGEABLE per-bucket (bucket_ms, n, n_err)
    counts — the finish stage of :func:`slo_burn_rate`, factored out so
    the streaming leg (``streaming.ingest.stream_burn_rate``) re-prices
    its merged epoch state with the IDENTICAL float recipe: stream
    output == batch op on the union of all rows seen (the
    psi_from_counts / decayed_topk merge-identity discipline)."""
    lw = (
        W.orderBy("bucket_ms")
        .rangeBetween(-(long_buckets - 1) * bucket_ms, 0)
    )
    budget = F.lit(1.0 - slo)
    short_rate = F.col("n_err") / F.col("n")
    long_rate = F.sum("n_err").over(lw) / F.sum("n").over(lw)
    return hourly.select(
        "bucket_ms",
        "n",
        F.col("n_err").cast("long").alias("n_err"),
        F.round(short_rate, 6).alias("err_rate_short"),
        F.round(long_rate, 6).alias("err_rate_long"),
        F.round(short_rate / budget, 6).alias("burn_short"),
        F.round(long_rate / budget, 6).alias("burn_long"),
        (
            (F.round(short_rate / budget, 6) > F.lit(alert_burn))
            & (F.round(long_rate / budget, 6) > F.lit(alert_burn))
        ).alias("alert"),
    )


def rolling_corr(
    df: DataFrame,
    key: str,
    key_a: str,
    key_b: str,
    bucket_ms: int,
    window_buckets: int,
    value: str = "value",
    ts_ms: str = "ts_ms",
    min_overlap: int = 2,
) -> DataFrame:
    """Trailing-window correlation between two named series — the
    TIME-LOCAL companion of :func:`xcorr_lagged` (which scores the whole
    period at once): did the error/purchase coupling BREAK last Tuesday?

    Both series collapse map-side to (bucket, mean); one bucket-keyed
    equi-join aligns them into (bucket, va, vb) rows — |period/bucket|
    of them, invariant to raw volume — and corr runs over a trailing
    RANGE frame on that calendar-bounded table (the psi_drift /
    slo_burn_rate tiny-finish-window discipline).  Buckets where either
    series is absent contribute nothing (inner alignment); windows with
    fewer than ``min_overlap`` aligned buckets return NULL corr.
    """
    def series(k, out):
        return (
            df.where(F.col(key) == F.lit(k))
            .select(
                (F.col(ts_ms) - F.col(ts_ms) % F.lit(bucket_ms)).alias("bucket"),
                F.col(value).alias(out),
            )
            .groupBy("bucket")
            .agg(F.avg(out).alias(out))
        )

    aligned = series(key_a, "va").join(series(key_b, "vb"), "bucket")
    w = (
        W.orderBy("bucket")
        .rangeBetween(-(window_buckets - 1) * bucket_ms, 0)
    )
    return aligned.select(
        "bucket",
        F.when(
            F.count("va").over(w) >= F.lit(min_overlap),
            F.round(F.corr("va", "vb").over(w), 6),
        ).alias("rolling_corr"),
        F.count("va").over(w).alias("n_in_window"),
    )


def theil_sen_trend(
    df: DataFrame,
    keys: list[str],
    bucket_ms: int,
    value: str = "value",
    ts_ms: str = "ts_ms",
) -> DataFrame:
    """Theil-Sen robust trend per series (Theil 1950 / Sen 1968): slope =
    median of all pairwise bucket-to-bucket slopes, intercept = median
    of (v - slope·t) — breakdown point 29%, so a burst of outlier hours
    cannot swing the trend the way OLS (``series_trend``) lets it.

    Scale shape: the estimator is quadratic IN BUCKETS, not rows — raw
    data collapses map-side to (key, bucket, mean) first, and the pair
    self-join runs on the calendar-bounded bucketed table (720 hourly
    buckets/month → ≤ C(720,2) ≈ 259k slope rows per series regardless
    of raw volume).  Slopes never leave their key partition before the
    median (Spark `percentile` ↔ DuckDB `quantile_cont`, the
    value_percentiles pairing).  Time enters in HOURS-from-epoch for
    EVERY bucket size (bucket start ms / 3.6e6, not the bucket index —
    ADVICE r10), so ``slope_per_hour`` is honestly per-hour and slope
    magnitudes stay in a well-conditioned float range.

    Returns (keys..., slope_per_hour, intercept, n_buckets, n_pairs),
    slope/intercept rounded 6 dp.
    """
    b = (
        df.select(
            *keys,
            ((F.col(ts_ms) - F.col(ts_ms) % F.lit(bucket_ms)) / F.lit(3_600_000.0))
            .cast("double")
            .alias("t"),
            F.col(value).alias("v"),
        )
        .groupBy(*keys, "t")
        .agg(F.avg("v").alias("v"))
        .localCheckpoint(eager=False)  # reused by the pair join AND the intercept pass
    )
    # SALTED pair self-join (guide-§2.5 shape): the join key is the bare
    # series key, so parallelism is capped by key cardinality — and with
    # a handful of series AQE byte-coalescing puts the whole C(buckets,2)
    # pair fan-out plus the partial percentile on ONE task (measured
    # 1.9 s serialized at sf0.1).  Salting t1 deterministically
    # (xxhash64, never rand — retry-safe) and replicating the
    # calendar-bounded bucket table across salts spreads pair generation
    # over keys × width groups; every (t1, t2) pair still appears exactly
    # once, so the slope multiset per key — and the median — is
    # unchanged.  The replicated side is ≤ buckets × width rows (tiny by
    # the operator's own quadratic-in-buckets contract).
    # Cap the salt fan-out (VERDICT r12 #4): the replicated side is
    # buckets × width rows per key, so at cluster shuffle widths (2000+)
    # an uncapped salt would blow the replication up 60× for no extra
    # useful parallelism — C(720,2) ≈ 259k pairs per key spread over 128
    # salts is already ~2k pairs/task.  Salting never changes results
    # (every (t1,t2) pair appears exactly once for any width).
    width = min(_shuffle_width(b.sparkSession), 128)
    b1 = b.select(
        *keys,
        F.col("t").alias("t1"),
        F.col("v").alias("v1"),
        F.pmod(F.xxhash64(F.col("t")), F.lit(width)).alias("_salt"),
    ).repartition(width, *keys, "_salt")
    # the explicit-width repartition matters twice: locally the planner
    # broadcasts the replicated side (BHJ preserves b1's partitioning, so
    # without it pair generation runs on the checkpointed table's 1-2
    # partitions), and at scale an SMJ on (keys, salt) reuses it directly
    b2 = b.select(*keys, F.col("t").alias("t2"), F.col("v").alias("v2")).withColumn(
        "_salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(width - 1).cast("long")))
    )
    slopes = (
        b1.join(b2, [*keys, "_salt"])
        .where(F.col("t1") < F.col("t2"))
        .select(
            *keys,
            ((F.col("v2") - F.col("v1")) / (F.col("t2") - F.col("t1"))).alias("s"),
        )
    )
    # r13 negative result (VERDICT r12 #5): a rank-based exact median
    # (row_number + count windows on the key, pick the two middle order
    # statistics, interpolate with percentile's exact
    # (higher-pos)*a + (pos-lower)*b formula) was built, proven
    # value-identical at sf0.001/0.01/0.1, and measured SLOWER: 1.54 s vs
    # 1.31 s for the pairs+median leg — the per-key window sort of ~1.3 M
    # slope rows costs more than percentile's map-side partial maps.  The
    # single-reducer percentile buffer is bounded by the operator's own
    # quadratic-in-buckets contract (≤ C(720,2) doubles ≈ 4 MB per key),
    # so it is not a scale hazard.  percentile stays.
    est = slopes.groupBy(*keys).agg(
        F.round(F.expr("percentile(s, 0.5)"), 6).alias("slope_per_hour"),
        F.count("*").alias("n_pairs"),
    )
    return (
        b.join(est, keys)
        .groupBy(*keys, "slope_per_hour", "n_pairs")
        .agg(
            F.round(
                F.expr("percentile(v - slope_per_hour * t, 0.5)"), 6
            ).alias("intercept"),
            F.count("*").alias("n_buckets"),
        )
        .select(*keys, "slope_per_hour", "intercept", "n_buckets", "n_pairs")
    )


def survival_km(
    df: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    horizon_days: int = 3,
) -> DataFrame:
    """Kaplan-Meier survival curve over entity lifetimes (Kaplan & Meier
    1958) — the censoring-aware churn member of the warehouse tier:
    :func:`cohort_retention` reports the fraction active per period;
    KM answers "what fraction of users SURVIVE past lifetime t" while
    correctly treating still-active users as right-censored instead of
    counting them as churned (the bias naive retention curves carry).

    Lifetime per entity = whole days between its first and last event.
    An entity whose last event is within ``horizon_days`` of the
    table's global max timestamp is CENSORED (still alive at the
    observation edge); otherwise its lifetime ended (event).  NULL
    entity ids and NULL timestamps are excluded up front (no lifetime —
    the quantile_normalize NULL-key discipline).  At each
    distinct lifetime t with d_t events among n_t entities still at
    risk:

        S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)

    computed as exp(Σ ln(1 − d/n)) with an any-zero-factor guard
    (d = n on the last stratum → S exactly 0, no ln(0)).  Returns one
    row per distinct lifetime: (duration_days, n_risk, n_events,
    n_censored, survival), survival rounded 6 dp.

    Scale shape: ONE exchange — the per-entity first/last reduce
    (partial map-side min/max, then n_entities-sized state).  The
    global max rides a one-row broadcast crossJoin; the KM finish
    windows only DISTINCT lifetimes (bounded by the observation span
    in days — ~30 rows for a month of events at any corpus size), so
    the unpartitioned window never sees raw rows.  All counts exact
    integers; the only floats are the final ln/exp chain.
    """
    pts = df.where(F.col(id_col).isNotNull() & F.col(ts_col).isNotNull())
    per = pts.groupBy(F.col(id_col).alias("_id")).agg(
        F.min(ts_col).alias("_first"),
        F.max(ts_col).alias("_last"),
    )
    gmax = F.broadcast(pts.agg(F.max(ts_col).alias("_gmax")))
    life = per.crossJoin(gmax).select(
        F.floor(
            (F.unix_timestamp("_last") - F.unix_timestamp("_first")) / F.lit(86400)
        ).alias("duration_days"),
        F.when(
            F.unix_timestamp("_gmax") - F.unix_timestamp("_last")
            > F.lit(int(horizon_days) * 86400),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_event"),
    )
    strata = life.groupBy("duration_days").agg(
        F.sum("_event").alias("n_events"),
        F.sum(F.lit(1) - F.col("_event")).alias("n_censored"),
    )
    w_all = W.orderBy("duration_days").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    w_cum = W.orderBy("duration_days").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    at_risk = strata.select(
        "duration_days",
        "n_events",
        "n_censored",
        (
            F.sum(F.col("n_events") + F.col("n_censored")).over(w_all)
            - F.sum(F.col("n_events") + F.col("n_censored")).over(w_cum)
            + F.col("n_events")
            + F.col("n_censored")
        ).alias("n_risk"),
    )
    factor_ln = F.when(
        F.col("n_events") < F.col("n_risk"),
        F.log(F.lit(1) - F.col("n_events") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    dead = F.when(F.col("n_events") >= F.col("n_risk"), F.lit(1)).otherwise(F.lit(0))
    return at_risk.select(
        "duration_days",
        "n_risk",
        "n_events",
        "n_censored",
        F.when(F.max(dead).over(w_cum) == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum(factor_ln).over(w_cum)), 6))
        .alias("survival"),
    ).orderBy("duration_days")
