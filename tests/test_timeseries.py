"""Window operators on crafted series."""

from pyspark.sql import functions as F

from time_series_databse_engine_spark.operators.timeseries import (
    autocorrelation,
    counter_rate,
    deltas,
    detect_gaps,
    downsample,
    ewma,
    moving_avg,
    ohlc_bars,
    resample_interpolate,
    sessionize,
    time_weighted_avg,
    topk_per_group,
    zscore_anomalies,
)


def _series(spark):
    rows = [("m", t * 1000, float(i)) for i, t in enumerate([0, 1, 2, 10, 11, 7200])]
    return spark.createDataFrame(rows, "metric string, ts_ms long, value double")


def test_downsample(spark):
    out = downsample(_series(spark), 10_000, ["metric"]).collect()
    got = {r.bucket_ms: (r.n, r.sum_value) for r in out}
    assert got[0] == (3, 3.0)          # t=0,1,2
    assert got[10_000] == (2, 7.0)     # t=10,11
    assert got[7_200_000] == (1, 5.0)


def test_moving_avg(spark):
    out = moving_avg(_series(spark), ["metric"], ["ts_ms"], preceding=1)
    vals = [r.mov_avg for r in out.orderBy("ts_ms").collect()]
    assert vals == [0.0, 0.5, 1.5, 2.5, 3.5, 4.5]


def test_deltas(spark):
    out = deltas(_series(spark), ["metric"], ["ts_ms"]).orderBy("ts_ms").collect()
    assert out[0].delta_value is None
    assert [r.delta_value for r in out[1:]] == [1.0, 1.0, 1.0, 1.0, 1.0]
    assert out[5].delta_ms == (7200 - 11) * 1000


def test_detect_gaps(spark):
    out = detect_gaps(_series(spark), ["metric"], min_gap_ms=3_600_000).collect()
    assert len(out) == 1 and out[0].gap_ms == (7200 - 11) * 1000


def test_sessionize(spark):
    out = sessionize(_series(spark), ["metric"], gap_ms=5000).collect()
    by_ts = {r.ts_ms: r.session_id for r in out}
    assert by_ts[0] == by_ts[1000] == by_ts[2000] == 0
    assert by_ts[10_000] == by_ts[11_000] == 1
    assert by_ts[7_200_000] == 2


def test_topk_per_group(spark):
    out = topk_per_group(_series(spark), ["metric"], "value", 2, tiebreak=["ts_ms"])
    assert sorted(r.value for r in out.collect()) == [4.0, 5.0]


def test_resample_interpolate(spark):
    rows = [("m", 0, 0.0), ("m", 2000, 2.0), ("m", 4000, 8.0)]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    out = resample_interpolate(df, "metric", 1000)
    got = {r.ts_ms: r.value for r in out.collect()}
    assert got == {0: 0.0, 1000: 1.0, 2000: 2.0, 3000: 5.0, 4000: 8.0}


def test_ohlc_bars(spark):
    # two buckets of 10s; first bucket has a ts tie broken by the id column
    rows = [
        ("m", 1000, 1, 5.0),
        ("m", 1000, 2, 9.0),   # same ts, higher id → not the open
        ("m", 9000, 3, 1.0),   # low + close of bucket 0
        ("m", 12000, 4, 7.0),
    ]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, event_id long, value double")
    out = ohlc_bars(df, 10_000, ["metric"], tiebreak=["event_id"])
    got = {r.bucket_ms: (r.open, r.high, r.low, r.close, r.n) for r in out.collect()}
    assert got[0] == (5.0, 9.0, 1.0, 1.0, 3)
    assert got[10_000] == (7.0, 7.0, 7.0, 7.0, 1)


def test_counter_rate_reset(spark):
    # counter: 10 → 15 → 3 (reset) → 6 ; increase = 0 + 5 + 3 + 3 = 11
    rows = [("m", t * 1000, v) for t, v in [(0, 10.0), (1, 15.0), (2, 3.0), (3, 6.0)]]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    out = counter_rate(df, 3_600_000, ["metric"], ["ts_ms"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.increase == 11.0 and r.n_samples == 4
    assert abs(r.rate_per_sec - 11.0 / 3600.0) < 1e-12


def test_time_weighted_avg(spark):
    # step function: value 2 for 1s, value 10 for 3s over window [0, 4000)
    rows = [("m", 0, 2.0), ("m", 1000, 10.0)]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    r = time_weighted_avg(df, ["metric"], 0, 4000).collect()[0]
    assert r.covered_ms == 4000 and r.n_points == 2
    assert abs(r.time_weighted_avg - (2.0 * 1 + 10.0 * 3) / 4.0) < 1e-9


def test_zscore_anomalies(spark):
    # 50 flat points then one spike; baseline excludes the current row so
    # sd>0 comes from tiny noise; the spike is the only flagged row
    rows = [("m", i * 1000, 10.0 + (0.01 if i % 2 else -0.01)) for i in range(50)]
    rows.append(("m", 50_000, 100.0))
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    out = zscore_anomalies(df, ["metric"], ["ts_ms"], lookback=100, min_points=30).collect()
    assert [r.ts_ms for r in out] == [50_000]
    assert out[0].zscore > 3


def test_autocorrelation_alternating(spark):
    # perfectly alternating series → lag-1 autocorrelation ≈ -1
    rows = [("m", i * 1000, float(i % 2)) for i in range(40)]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    r = autocorrelation(df, ["metric"], ["ts_ms"], lag=1).collect()[0]
    assert r.n_pairs == 39
    assert abs(r.autocorr - (-1.0)) < 1e-3


def test_ewma_matches_recursion(spark):
    vals = [1.0, 5.0, 3.0, 9.0, 2.0]
    rows = [("m", i * 1000, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    out = ewma(df, "metric", alpha=0.3).orderBy("ts_ms").collect()
    s, expect = None, []
    for v in vals:
        s = v if s is None else 0.3 * v + 0.7 * s
        expect.append(round(s, 6))
    assert [r.ewma for r in out] == expect


def test_seasonal_baseline_profile_and_residuals(spark):
    """Planted diurnal pattern: phase-0 points at 10, phase-1 at 20, one
    outlier — baseline recovers the profile, residual isolates the outlier."""
    from time_series_databse_engine_spark.operators.timeseries import seasonal_baseline

    H = 3_600_000
    rows = []
    for day in range(3):
        rows.append(("m", day * 24 * H, 10.0))        # phase 0
        rows.append(("m", day * 24 * H + H, 20.0))    # phase 1
    rows.append(("m", 3 * 24 * H, 40.0))              # phase-0 outlier
    df = spark.createDataFrame(rows, "event_type string, ts_ms long, value double")
    out = seasonal_baseline(df, ["event_type"]).collect()
    by_phase = {}
    for r in out:
        by_phase.setdefault(r.phase, set()).add(r.baseline)
    assert by_phase[0] == {17.5}   # (10+10+10+40)/4
    assert by_phase[1] == {20.0}
    outlier = [r for r in out if r.value == 40.0][0]
    assert outlier.residual == 22.5


def test_gapfill_locf_grid_carry_and_leading_null(spark):
    """Grid spans floor(min/step)*step..max; values carry forward across
    gaps; grid points before the first observation stay NULL; a real point
    exactly on a grid slot wins the tie."""
    from time_series_databse_engine_spark.operators.timeseries import gapfill_locf

    rows = [
        ("a", 150, 1.0),   # off-grid: grid starts at 100 (NULL), 200 carries 1.0
        ("a", 400, 2.0),   # exactly on grid
        ("a", 650, 3.0),
        ("b", 100, 9.0),   # on-grid single point
    ]
    df = spark.createDataFrame(rows, "event_type string, ts_ms long, value double")
    out = {
        (r.event_type, r.ts_ms): r.value_locf
        for r in gapfill_locf(df, "event_type", step_ms=100).collect()
    }
    assert out == {
        ("a", 100): None,
        ("a", 200): 1.0,
        ("a", 300): 1.0,
        ("a", 400): 2.0,
        ("a", 500): 2.0,
        ("a", 600): 2.0,
        ("b", 100): 9.0,
    }


def test_gapfill_locf_duplicate_ts_collapses_deterministically(spark):
    from time_series_databse_engine_spark.operators.timeseries import gapfill_locf

    rows = [("a", 100, 5.0), ("a", 100, 7.0), ("a", 300, 1.0)]
    df = spark.createDataFrame(rows, "event_type string, ts_ms long, value double")
    out = {
        r.ts_ms: r.value_locf
        for r in gapfill_locf(df, "event_type", step_ms=100).collect()
    }
    assert out == {100: 7.0, 200: 7.0, 300: 1.0}  # max(value) wins the dup


def test_lttb_endpoints_count_and_pick(spark):
    """Endpoints always kept, output size = n_out, and the bucket pick is
    the point with the largest triangle area (planted spike wins)."""
    from time_series_databse_engine_spark.operators.timeseries import lttb

    rows = [("m", i * 100, 1.0) for i in range(20)]
    rows[7] = ("m", 700, 50.0)  # spike inside one middle bucket
    df = spark.createDataFrame(rows, "event_type string, ts_ms long, value double")
    out = lttb(df, "event_type", n_out=6).orderBy("ts_ms").collect()
    assert len(out) == 6
    ts = [r.ts_ms for r in out]
    assert ts[0] == 0 and ts[-1] == 1900
    assert 700 in ts  # the spike is picked


def test_lttb_passthrough_small_series(spark):
    from time_series_databse_engine_spark.operators.timeseries import lttb

    rows = [("m", i * 100, float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "event_type string, ts_ms long, value double")
    out = lttb(df, "event_type", n_out=10).orderBy("ts_ms").collect()
    assert [(r.ts_ms, r.value) for r in out] == [(i * 100, float(i)) for i in range(5)]


def test_lttb_chunked_divergence_vs_exact(spark):
    """Quantifies the chunked approximation against exact LTTB at
    sf0.01 (the driver's correctness SF): comparable output volume,
    every chunk's endpoints kept (the re-anchoring contract), and a
    majority of exact picks are recovered despite independent per-chunk
    anchors.  The recovered fraction is asserted as a floor, so a
    regression in the picker or the quota math shows up as a number,
    not a vibe."""
    from time_series_databse_engine_spark.operators.timeseries import lttb, lttb_chunked
    from time_series_databse_engine_spark.sources import load_table

    T1, T2 = 1_704_153_600_000, 1_704_240_000_000
    e = load_table(spark, "/root/testdata/sf0.01", "events").filter(
        F.col("ts_ms").between(T1, T2)
    )
    exact = lttb(e, "event_type", n_out=48).collect()
    chunked = lttb_chunked(e, "event_type", n_out=48, chunk_ms=21_600_000).collect()
    ex = {(r.event_type, r.ts_ms) for r in exact}
    ch = {(r.event_type, r.ts_ms) for r in chunked}
    # volume: Σ quotas ≈ n_out, within one extra point per 6h chunk (4/day)
    per_series_ch = {}
    for k, _ in ch:
        per_series_ch[k] = per_series_ch.get(k, 0) + 1
    per_series_ex = {}
    for k, _ in ex:
        per_series_ex[k] = per_series_ex.get(k, 0) + 1
    for k, n_ex in per_series_ex.items():
        assert abs(per_series_ch[k] - n_ex) <= 4
    # divergence floor: the chunked picks recover most exact picks
    recovered = len(ex & ch) / len(ex)
    assert recovered >= 0.5, f"chunked LTTB recovered only {recovered:.2f} of exact picks"
    # re-anchoring contract: both endpoints of every (series, chunk) kept
    rows = e.select("event_type", "ts_ms").collect()
    bounds = {}
    for r in rows:
        c = r.ts_ms - r.ts_ms % 21_600_000
        lo, hi = bounds.get((r.event_type, c), (r.ts_ms, r.ts_ms))
        bounds[(r.event_type, c)] = (min(lo, r.ts_ms), max(hi, r.ts_ms))
    for (k, _c), (lo, hi) in bounds.items():
        assert (k, lo) in ch and (k, hi) in ch


def test_lttb_chunked_groups_per_chunk_not_per_series(spark, sf_dir):
    """The bounded-memory claim in plan terms: the picker's Arrow groups
    are (series, chunk), never a whole series."""
    import re

    from time_series_databse_engine_spark.operators.timeseries import lttb_chunked
    from time_series_databse_engine_spark.sources import load_table

    e = load_table(spark, sf_dir, "events")
    df = lttb_chunked(e, "event_type", n_out=48, chunk_ms=21_600_000)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"FlatMapGroupsInPandas \[event_type#\d+, _chunk#\d+L\]", plan)


def test_mad_anomalies_robust_to_outlier(spark):
    """One huge outlier: MAD flags it while leaving the baseline points
    unflagged (a mean/stddev z-score would inflate sigma instead)."""
    from time_series_databse_engine_spark.operators.timeseries import mad_anomalies

    rows = [("m", i * 1000, 10.0 + (i % 3) * 0.1) for i in range(20)]
    rows.append(("m", 20_000, 1000.0))
    df = spark.createDataFrame(rows, "event_type string, ts_ms long, value double")
    out = mad_anomalies(df, ["event_type"]).collect()
    flagged = {r.ts_ms for r in out if r.is_anomaly}
    assert flagged == {20_000}
    meds = {r.med for r in out}
    assert len(meds) == 1 and abs(next(iter(meds)) - 10.1) < 1e-9


def test_holt_constant_and_ramp(spark):
    """Constant series: level == the constant, trend == 0 forever.  Linear
    ramp: the explicit recursion matches a Python replay exactly."""
    from time_series_databse_engine_spark.operators.timeseries import holt_smoothing

    const = [("c", i * 1000, 5.0) for i in range(10)]
    ramp = [("r", i * 1000, float(i)) for i in range(10)]
    df = spark.createDataFrame(
        const + ramp, "event_type string, ts_ms long, value double"
    )
    out = holt_smoothing(df, "event_type", alpha=0.5, beta=0.2).collect()
    for r in out:
        if r.event_type == "c":
            assert r.level == 5.0 and r.trend == 0.0 and r.forecast == 5.0
    # replay the ramp recursion in python
    a, oma, bt, omb = 0.5, 0.5, 0.2, 0.8
    l = b = 0.0
    expect = []
    for i, x in enumerate([float(i) for i in range(10)]):
        if i == 0:
            l, b = x, 0.0
        else:
            lp = l
            l = a * x + oma * (lp + b)
            b = bt * (l - lp) + omb * b
        expect.append((round(l, 6), round(b, 6)))
    got = sorted(
        [(r.level, r.trend) for r in out if r.event_type == "r"],
        key=lambda t: t[0],
    )
    assert sorted(expect) == got


def test_ewma_chunked_matches_sequential(spark):
    """Chunk-and-chain decomposition agrees with the sequential fold after
    the 6-dp rounding, including across chunk boundaries and for the
    init-rule first element (virtual carry-in = first value)."""
    from time_series_databse_engine_spark.operators.timeseries import ewma_chunked

    # transcendental values: recombination reorders float ops vs the
    # sequential fold (1-ulp differences), so states must not sit on a
    # 6-dp rounding boundary — dyadic inputs like 4.5 land exactly on
    # 6.5390625-style midpoints and flip the rounded digit
    import math

    rows = [
        ("a", i * 600_000, 10.0 * math.sin(i + 1)) for i in range(60)
    ] + [("b", i * 600_000, 10.0 * math.cos(i)) for i in range(7)]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    # chunk_ms=3.6e6 → 6 rows per chunk for series a (10 chunks), so every
    # chain step and the single-chunk series b are both exercised
    seq = ewma(df, "metric", alpha=0.3).orderBy("metric", "ts_ms").collect()
    chk = (
        ewma_chunked(df, "metric", alpha=0.3, chunk_ms=3_600_000)
        .orderBy("metric", "ts_ms")
        .collect()
    )
    assert seq == chk


def test_holt_chunked_matches_sequential(spark):
    """2-dim chunk-and-chain (matrix-power carry) agrees with the
    sequential Holt fold after 6-dp rounding, across chunk boundaries and
    for single-chunk series."""
    import math

    from time_series_databse_engine_spark.operators.timeseries import (
        holt_chunked,
        holt_smoothing,
    )

    rows = [
        ("a", i * 600_000, 10.0 * math.sin(i + 1) + 0.5 * i) for i in range(60)
    ] + [("b", i * 600_000, 10.0 * math.cos(i)) for i in range(7)]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    seq = (
        holt_smoothing(df, "metric", alpha=0.5, beta=0.2)
        .orderBy("metric", "ts_ms")
        .collect()
    )
    chk = (
        holt_chunked(df, "metric", alpha=0.5, beta=0.2, chunk_ms=3_600_000)
        .orderBy("metric", "ts_ms")
        .collect()
    )
    assert seq == chk


def test_resample_interpolate_expr_matches_pandas_variant(spark):
    """The JVM-expression resample reproduces np.interp exactly: interior
    lerp, clamp on both ends, grid points coincident with samples."""
    from time_series_databse_engine_spark.operators.timeseries import (
        resample_interpolate_expr,
    )

    rows = [
        ("m", 500, 1.0),     # grid starts at 0 → left-clamp region
        ("m", 2000, 2.0),    # exactly on grid
        ("m", 4500, 9.5),
        ("n", 1000, 3.0),    # single-point series → all clamps
    ]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    a = resample_interpolate(df, "metric", 1000).orderBy("metric", "ts_ms").collect()
    b = resample_interpolate_expr(df, "metric", 1000).orderBy("metric", "ts_ms").collect()
    assert a == b


def test_resample_interpolate_expr_no_python_two_exchanges(spark, sf_dir):
    """Expression variant has NO Arrow/Python stage and at most two
    series-keyed shuffle exchanges (bounds agg + window)."""
    from time_series_databse_engine_spark.operators.timeseries import (
        resample_interpolate_expr,
    )
    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.plans import num_shuffle_exchanges, simple_plan
    from time_series_databse_engine_spark.sources import load_table

    e = load_table(spark, sf_dir, "events").groupBy("event_type", "ts_ms").agg(
        F.min("value").alias("value")
    )
    df = resample_interpolate_expr(e, "event_type", 60_000)
    p = simple_plan(df)
    assert "FlatMapGroupsInPandas" not in p and "ArrowEvalPython" not in p
    assert num_shuffle_exchanges(df) <= 3


def test_funnel_ordering_window_and_partials(spark):
    """Funnel requires strict step ordering from the earliest anchor,
    enforces the completion window, and reports partial users with
    suffix-closed nulls."""
    from time_series_databse_engine_spark.operators.timeseries import funnel

    rows = [
        # u1 completes in order
        (1, "view", 1000), (1, "click", 2000), (1, "purchase", 3000),
        # u2: click BEFORE first view → step 2 not satisfied by it
        (2, "click", 500), (2, "view", 1000),
        # u3: purchase outside the window from t1
        (3, "view", 0), (3, "click", 100), (3, "purchase", 20_000),
        # u4 never viewed → absent entirely
        (4, "purchase", 50),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_ms long")
    out = {
        r.user_id: (r.t1, r.t2, r.t3, r.steps_completed)
        for r in funnel(df, ["view", "click", "purchase"], within_ms=10_000).collect()
    }
    assert out[1] == (1000, 2000, 3000, 3)
    assert out[2] == (1000, None, None, 1)
    assert out[3] == (0, 100, None, 2)
    assert 4 not in out


def test_rolling_median_rejects_spike(spark):
    """A single spike leaves the trailing median untouched (the property
    that distinguishes it from a moving mean)."""
    from time_series_databse_engine_spark.operators.timeseries import rolling_median

    rows = [("m", i * 1000, 10.0) for i in range(9)] + [("m", 9000, 1000.0)]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    out = {r.ts_ms: r.rolling_median for r in rolling_median(df, ["metric"], lookback=5).collect()}
    assert out[9000] == 10.0          # spike in-window, median unmoved
    assert out[4000] == 10.0
    got_n = {r.ts_ms: r.n_window for r in rolling_median(df, ["metric"], lookback=5).collect()}
    assert got_n[0] == 1 and got_n[9000] == 5


def test_rolling_median_sketch_within_one_bin_of_exact(spark, sf_dir):
    """The sketch estimator's midpoint stays within one bin width of the
    exact trailing median over the whole driver dataset, and its chosen
    bin is exactly the lower-median order statistic's bin (the
    definitional check, bin-exact not just tolerance)."""
    from time_series_databse_engine_spark.operators.timeseries import (
        rolling_median,
        rolling_median_sketch,
    )
    from time_series_databse_engine_spark.sources import load_table

    e = load_table(spark, sf_dir, "events")
    exact = {
        (r.event_type, r.ts_ms): r.rolling_median
        for r in rolling_median(
            e, ["event_type"], lookback=100, tiebreak="event_id"
        ).collect()
    }
    est = rolling_median_sketch(
        e, ["event_type"], lo=0.0, hi=600.0, lookback=100, bins=60,
        tiebreak="event_id",
    ).collect()
    assert len(est) == len(exact)
    bin_w = 10.0
    # odd frames: the exact median IS a data value, so the estimator's
    # midpoint sits within half a bin of it — the definitional bin-exact
    # check, valid at any window fill including n=1
    worst_odd = max(
        abs(r.rolling_median_est - exact[(r.event_type, r.ts_ms)])
        for r in est
        if r.n_window % 2 == 1
    )
    assert worst_odd <= bin_w / 2, f"odd-frame sketch off by {worst_odd}"
    # even frames interpolate between the two middle order statistics;
    # once the window has real fill they share a bin (±1) and the error
    # stays under one bin width.  A 2-row window of two DISTANT values is
    # the structural exception (exact = their midpoint, sketch = the
    # lower one's bin) — that is a property of any histogram estimator,
    # not a bug, so the bound is asserted on windows with n ≥ 20.
    worst_warm = max(
        abs(r.rolling_median_est - exact[(r.event_type, r.ts_ms)])
        for r in est
        if r.n_window >= 20
    )
    assert worst_warm <= bin_w, f"sketch median off by {worst_warm} > one bin"


def test_rolling_median_sketch_single_exchange_no_sliding_agg(spark, sf_dir):
    """The O(rows×bins) claim in plan terms: ONE series-key exchange
    shared by both window passes (running sums, then lags), and no
    sliding-frame aggregate anywhere — sliding SUM frames re-scan the
    whole buffer per row in Spark, which would restore O(rows×frame)."""
    from time_series_databse_engine_spark.operators.timeseries import (
        rolling_median_sketch,
    )
    from time_series_databse_engine_spark.plans import (
        num_shuffle_exchanges,
        simple_plan,
    )
    from time_series_databse_engine_spark.sources import load_table

    e = load_table(spark, sf_dir, "events")
    df = rolling_median_sketch(e, ["event_type"], lo=0.0, hi=600.0, bins=60)
    assert num_shuffle_exchanges(df) == 1
    # running frames print as "unboundedpreceding$(), currentrow$()";
    # a sliding frame would print a bounded "-99, currentrow" frame spec
    assert "-99" not in simple_plan(df)


def test_cap_events_keeps_earliest_deterministically(spark):
    """Cap keeps the earliest `cap` events per (key, bucket) with an id
    tiebreak; later buckets reset the budget."""
    from time_series_databse_engine_spark.operators.timeseries import cap_events_per_key

    rows = [
        (1, 1, 100, 0.0), (1, 2, 100, 0.0), (1, 3, 200, 0.0),  # same bucket
        (1, 4, 10_100, 0.0),                                    # next bucket
        (2, 5, 150, 0.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts_ms long, value double")
    kept = {
        r.event_id
        for r in cap_events_per_key(df, ["user_id"], bucket_ms=10_000, cap=2, tiebreak="event_id").collect()
    }
    # user 1 bucket 0: ids 1,2 (ts tie → lower id) ; id 3 dropped; id 4 new bucket
    assert kept == {1, 2, 4, 5}


def test_cusum_detects_level_shift(spark):
    """Retrospective two-sided CUSUM anchored at the GLOBAL series mean
    (μ=11.5 for a 10→13 shift): the below-mean pre-shift segment drives
    the negative statistic, the above-mean post-shift segment drives the
    positive one, and each side alarms ONLY in its own regime — the sign
    flip localizes the change point."""
    from time_series_databse_engine_spark.operators.timeseries import cusum_changepoints

    rows = [("m", i * 1000, 10.0) for i in range(20)] + [
        ("m", (20 + i) * 1000, 13.0) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    out = sorted(cusum_changepoints(df, "metric", k=0.5, h=5.0).collect(), key=lambda r: r.ts_ms)
    pos_alarms = [r.ts_ms for r in out if r.cusum_pos > 5.0]
    neg_alarms = [r.ts_ms for r in out if r.cusum_neg > 5.0]
    # onset positions: negative side fires early in the low segment
    # (accumulating +1/step from t=0), positive side 6 steps after the
    # shift; the decayING tail of the negative statistic rightly persists
    # a few points past the shift (it drains at 2/step), so only onsets
    # are asserted
    assert neg_alarms and min(neg_alarms) <= 7_000
    assert pos_alarms and 25_000 <= min(pos_alarms) <= 27_000
    # a flat series never alarms
    flat = spark.createDataFrame(
        [("m", i * 1000, 10.0) for i in range(40)], "metric string, ts_ms long, value double"
    )
    assert all(not r.alarm for r in cusum_changepoints(flat, "metric", k=0.5, h=5.0).collect())


def test_cusum_window_form_matches_pandas_recursion_and_stays_jvm_side(spark):
    """The production CUSUM (prefix-sum/running-min window identity in
    integer micro-units) agrees with the raw-double applyInPandas
    recursion within the fixed-point quantization bound (≤5e-7/step), and
    its physical plan has NO Python boundary — the whole point of the
    rewrite is that WindowExec spills where a whole-series pandas group
    OOMs."""
    import random

    from time_series_databse_engine_spark.operators.timeseries import (
        cusum_changepoints,
        cusum_changepoints_pandas,
    )

    rng = random.Random(7)
    rows = [
        (m, i * 1000, 10.0 + (3.0 if i > 60 else 0.0) + rng.uniform(-1, 1))
        for m in ("a", "b")
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    fast = cusum_changepoints(df, "metric", k=0.5, h=5.0)
    slow = cusum_changepoints_pandas(df, "metric", k=0.5, h=5.0)
    f = {(r.metric, r.ts_ms): r for r in fast.collect()}
    s = {(r.metric, r.ts_ms): r for r in slow.collect()}
    assert f.keys() == s.keys()
    tol = 5e-7 * 120 + 1e-6
    for key_ in f:
        assert abs(f[key_].cusum_pos - s[key_].cusum_pos) <= tol
        assert abs(f[key_].cusum_neg - s[key_].cusum_neg) <= tol
    # AQE's toString appends the pre-adaptive "== Initial Plan ==" — keep
    # only the final plan before counting nodes
    plan = fast._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "FlatMapGroupsInPandas" not in plan and "ArrowEvalPython" not in plan
    # one hash exchange for the mu groupBy + one for the windows (both
    # Window nodes stack on a single Sort/Exchange on the series key)
    assert plan.count("Exchange hashpartitioning") <= 2


def test_stl_decompose_recovers_planted_trend_plus_seasonality(spark):
    """A synthetic series = linear trend + daily sine + 0 noise: the
    decomposition's residuals are near zero away from the edges, the
    seasonal component is zero-mean, and y == trend+seasonal+residual
    identically (additivity is exact by construction)."""
    import math

    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.operators.timeseries import stl_decompose

    rows = [
        (
            "s",
            h * 3_600_000,
            0.01 * h + 10.0 * math.sin(2 * math.pi * (h % 24) / 24.0),
        )
        for h in range(24 * 14)
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts_ms", "value"])
    out = stl_decompose(df, ["event_type"]).orderBy("bucket").collect()
    assert len(out) == 24 * 14
    for r in out:
        assert abs(r["y"] - (r["trend"] + r["seasonal"] + r["residual"])) < 1e-6
    core = [r for r in out if 24 <= r["bucket"] < 24 * 13]
    assert max(abs(r["residual"]) for r in core) < 0.5
    smean = sum(r["seasonal"] for r in out[:24]) / 24.0
    assert abs(smean) < 0.05
    assert max(r["seasonal"] for r in core) > 8.0      # sine amplitude seen


def test_holt_winters_learns_seasonality_and_beats_holt_on_forecast(spark):
    """On a pure seasonal series (daily sine, no noise) the one-step
    forecast error after two learned periods is far below the signal
    amplitude, and the seasonal state tracks the sine's shape."""
    import math

    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.operators.timeseries import holt_winters

    rows = [
        ("s", h, 50.0 + 10.0 * math.sin(2 * math.pi * (h % 24) / 24.0))
        for h in range(24 * 8)
    ]
    df = spark.createDataFrame(rows, ["event_type", "bucket", "y"])
    out = holt_winters(
        df, "event_type", alpha=1 / 3, beta=1 / 6, gamma=1 / 7, period=24
    ).orderBy("bucket").collect()
    assert len(out) == 24 * 7                    # first period consumed as warm-up
    # compare forecast at t against actual at t+1, late in the series
    late = out[24 * 5 : -1]
    errs = [abs(r["forecast"] - out[i + 24 * 5 + 1]["y"]) for i, r in enumerate(late)]
    assert sum(errs) / len(errs) < 1.0           # amplitude is 10
    # seasonal component tracks the sine's shape
    seas = [r["seasonal"] for r in out[24 * 5 :]]
    assert max(seas) > 8.0 and min(seas) < -8.0
    # a series shorter than one period never leaves warm-up
    short = spark.createDataFrame(rows[:20], ["event_type", "bucket", "y"])
    assert holt_winters(short, "event_type", alpha=1 / 3, beta=1 / 6,
                        gamma=1 / 7, period=24).count() == 0


def test_cohort_retention_planted_grid(spark):
    """Two cohorts with known activity: retention cells match hand truth,
    offset-0 rate is always 1.0."""
    from time_series_databse_engine_spark.operators.timeseries import cohort_retention

    P = 1000  # 1s periods for the fixture
    rows = []
    # cohort 0: users 1,2,3 start in period 0; 1,2 return in p1; only 1 in p2
    for u, ps in [(1, [0, 1, 2]), (2, [0, 1]), (3, [0])]:
        rows += [(u, p * P + 5) for p in ps]
    # cohort 1: users 4,5 start in period 1; 5 returns in p2 (twice — dedup)
    rows += [(4, 1 * P + 5), (5, 1 * P + 5), (5, 2 * P + 7), (5, 2 * P + 8)]
    df = spark.createDataFrame(rows, "user_id long, ts_ms long")
    got = {
        (r["cohort_start_ms"], r["period_offset"]): (
            r["n_active"], r["cohort_size"], r["retention_rate"]
        )
        for r in cohort_retention(df, period_ms=P).collect()
    }
    assert got[(0, 0)] == (3, 3, 1.0)
    assert got[(0, 1)] == (2, 3, round(2 / 3, 6))
    assert got[(0, 2)] == (1, 3, round(1 / 3, 6))
    assert got[(P, 0)] == (2, 2, 1.0)
    assert got[(P, 1)] == (1, 2, 0.5)  # user 5's two p2 events count once
    assert len(got) == 5


def test_stl_anomaly_ignores_seasonal_spike_flags_real_one(spark):
    """A perfectly periodic daily spike is absorbed by the seasonal
    component (no alarm); a one-off level break alarms."""
    import math

    from time_series_databse_engine_spark.operators.timeseries import stl_anomalies

    H = 3_600_000
    rows = []
    for h in range(24 * 12):  # 12 days hourly
        v = 100.0 + (50.0 if h % 24 == 8 else 0.0)  # daily 8am spike
        if h == 150:
            v += 300.0  # the real anomaly
        rows.append(("m", h * H + 1, v))
    df = spark.createDataFrame(rows, "event_type string, ts_ms long, value double")
    out = stl_anomalies(df, ["event_type"]).collect()
    buckets = {r["bucket"] for r in out}
    assert 150 in buckets
    # the periodic spike hours must NOT dominate the alarms: only the
    # trend-window edges (series start/end, where the centered MA frame
    # is asymmetric) and the break's neighborhood may leak through
    spike_hours = {
        b
        for b in buckets
        if b % 24 == 8 and abs(b - 150) > 13 and 12 <= b < 24 * 12 - 12
    }
    assert not spike_hours


def test_hw_backtest_near_zero_error_on_clean_signal(spark):
    """On an exactly additive series (linear trend + pure seasonal), the
    Holt-Winters fit converges and every-horizon forecasts are
    near-perfect; MAE must be tiny and n must count every valid origin."""
    import math

    from time_series_databse_engine_spark.operators.timeseries import hw_backtest

    m = 12
    rows = [
        # pure seasonal (no trend): the textbook warm-up seasonals are then
        # exact and the backtest should report near-zero error everywhere;
        # with a trend the warm-up seasonals absorb the ramp and decay only
        # at rate gamma per cycle -- a model-bias fact, not a backtest bug
        ("s", t, round(10.0 * math.sin(2 * math.pi * (t % m) / m), 6))
        for t in range(1, 140)
    ]
    df = spark.createDataFrame(rows, "k string, bucket long, y double")
    out = {
        r.horizon: r
        for r in hw_backtest(
            df, "k", alpha=0.5, beta=0.1, gamma=0.1, period=m, horizons=(1, 3, 6)
        ).collect()
    }
    assert set(out) == {1, 3, 6}
    for h, r in out.items():
        assert r.mae < 0.2, (h, r.mae)
        assert r.rmse >= r.mae
        # origins: points m+1..139 minus h lead-out minus (m-h) lag-in
        assert r.n == (139 - m) - h - (m - h)


def test_zscore_chunked_row_identical_even_with_thin_chunks(spark, sf_dir):
    """The (key, chunk)-parallel form equals the plain whole-key window
    row-for-row (zscore values included) at the default day chunks AND
    at hourly chunks thin enough that every cross-boundary frame must
    pull context from several chunks back; the heavy window partitions
    on (key, chunk) — that is the point."""
    from time_series_databse_engine_spark.operators.timeseries import (
        zscore_anomalies,
        zscore_anomalies_chunked,
    )
    from time_series_databse_engine_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "event_type", "zscore"]
    plain = sorted(
        map(tuple, zscore_anomalies(ev, ["event_type"], ["ts_ms", "event_id"]).select(*cols).collect())
    )
    assert len(plain) > 0
    for chunk_ms in (86_400_000, 3_600_000):
        chunked = sorted(
            map(
                tuple,
                zscore_anomalies_chunked(
                    ev, ["event_type"], ["ts_ms", "event_id"], chunk_ms=chunk_ms
                ).select(*cols).collect(),
            )
        )
        assert chunked == plain
    # the heavy window must key on (event_type, chunk), never bare key
    plan = zscore_anomalies_chunked(
        ev, ["event_type"], ["ts_ms", "event_id"]
    )._jdf.queryExecution().executedPlan().toString()
    import re

    windows = re.findall(r"Window \[.*?windowspecdefinition\(([^)]*)\)", plan)
    assert windows and all("_tchunk" in w or "_chunk" in w for w in windows), plan[:4000]


def test_moving_avg_time_chunked_row_identical(spark, sf_dir):
    """The (key, chunk)-parallel RANGE-frame form equals the plain
    whole-key window row-for-row — at day chunks, hourly chunks, and
    chunks SMALLER than the 5-min window (multi-chunk forward copy);
    every window partitions on (key, chunk)."""
    from time_series_databse_engine_spark.operators.timeseries import (
        moving_avg_time,
        moving_avg_time_chunked,
    )
    from time_series_databse_engine_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "event_type", "mov_avg_time", "n_in_window"]
    plain = sorted(map(tuple, moving_avg_time(ev, ["event_type"]).select(*cols).collect()))
    for chunk_ms in (86_400_000, 3_600_000, 200_000):
        chunked = sorted(
            map(
                tuple,
                moving_avg_time_chunked(ev, ["event_type"], chunk_ms=chunk_ms)
                .select(*cols)
                .collect(),
            )
        )
        assert chunked == plain
    import re

    import pytest

    plan = (
        moving_avg_time_chunked(ev, ["event_type"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    windows = re.findall(r"Window \[.*?windowspecdefinition\(([^)]*)\)", plan)
    assert windows and all("_tchunk" in w for w in windows), plan[:4000]
    with pytest.raises(ValueError):
        moving_avg_time_chunked(ev, ["event_type"], window_ms=10**9, chunk_ms=1000)


def test_decayed_topk_recency_beats_raw_count(spark):
    """An item with fewer but fresher events outranks one with more but
    stale events once the age gap spans enough half-lives; the mergeable
    identity score(t2) = score(t1)*decay + fresh holds exactly; the
    half-life guard raises."""
    import pytest

    from time_series_databse_engine_spark.operators.timeseries import decayed_topk

    hl = 1000  # 1s half-life
    now = 100_000
    rows = (
        # "stale": 8 events, 10 half-lives old -> mass 8 * 2^-10 ~ 0.0078
        [(i, "stale", now - 10_000) for i in range(8)]
        # "fresh": 2 events at now -> mass 2.0
        + [(100 + i, "fresh", now) for i in range(2)]
    )
    df = spark.createDataFrame(rows, "event_id long, item string, ts_ms long")
    out = decayed_topk(df, ["item"], half_life_ms=hl, k=2, now_ms=now).collect()
    assert [r["item"] for r in out] == ["fresh", "stale"]
    got = {r["item"]: r for r in out}
    assert got["fresh"]["decayed_score"] == 2.0
    assert abs(got["stale"]["decayed_score"] - 8 * 2**-10) < 1e-6
    assert got["stale"]["n_events"] == 8

    # mergeability: yesterday's score decayed to `now` + fresh events
    old = decayed_topk(
        df.filter("ts_ms < 100000"), ["item"], half_life_ms=hl, k=10, now_ms=now - 10_000
    ).collect()[0]
    assert abs(old["decayed_score"] * 2**-10 - got["stale"]["decayed_score"]) < 1e-6

    with pytest.raises(ValueError):
        decayed_topk(df, ["item"], half_life_ms=0)


def test_xcorr_lagged_planted_shift(spark):
    """B is A shifted 2 buckets later: xcorr(A,B) peaks at lag +2 with
    corr ~1.0, and the peak beats every other lag."""
    from time_series_databse_engine_spark.operators.timeseries import xcorr_lagged

    import math

    rows = []
    for t in range(60):
        v = math.sin(t / 3.0) + 0.1 * t
        rows.append(("a", t * 1000, v))
        rows.append(("b", (t + 2) * 1000, v))  # same value, 2 buckets later
    df = spark.createDataFrame(rows, "k string, ts_ms long, value double")
    out = {
        r.lag: r
        for r in xcorr_lagged(
            df, "k", bucket_ms=1000, max_lag=3, min_overlap=2
        ).collect()
    }
    assert set(out) == set(range(-3, 4))
    assert all(r.key_a == "a" and r.key_b == "b" for r in out.values())
    assert abs(out[2].xcorr - 1.0) < 1e-6
    # at the true lag the windows align fully; at lag 0 the 2-bucket
    # offset costs 2 overlap buckets
    assert out[2].n_buckets == 60 and out[0].n_buckets == 58
    assert all(out[lag].xcorr < out[2].xcorr for lag in out if lag != 2)


def test_scd2_build_runs_and_validity(spark):
    from time_series_databse_engine_spark.operators.timeseries import scd2_build

    rows = [
        # user 1: A A B A  -> runs A[0,2) v1, B[2,3) v2, A[3,-) v3
        (1, "A", 0, 0), (1, "A", 1, 1), (1, "B", 2, 2), (1, "A", 3, 3),
        # user 2: single row -> one current run
        (2, "X", 5, 4),
        # user 3: null attr then value -> null run closes at the change
        (3, None, 0, 5), (3, "C", 4, 6),
    ]
    df = spark.createDataFrame(rows, "user_id int, attr string, ts_ms long, event_id long")
    out = scd2_build(df, "user_id", "attr", ["ts_ms", "event_id"]).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r.version)
    assert [(r.attr, r.valid_from_ms, r.valid_to_ms, r.is_current) for r in u1] == [
        ("A", 0, 2, False), ("B", 2, 3, False), ("A", 3, None, True)
    ]
    assert [r.version for r in u1] == [1, 2, 3]
    (u2,) = by_user[2]
    assert u2.attr == "X" and u2.is_current and u2.version == 1
    u3 = sorted(by_user[3], key=lambda r: r.version)
    assert u3[0].attr is None and u3[0].valid_to_ms == 4 and not u3[0].is_current
    assert u3[1].attr == "C" and u3[1].is_current


def test_slo_burn_rate_multiwindow_alert(spark):
    """A one-bucket error spike trips the short window but NOT the long
    confirmation window; a sustained burn trips both."""
    from time_series_databse_engine_spark.operators.timeseries import slo_burn_rate

    B = 1000
    rows = []
    # buckets 0-9: clean (10 ok each); bucket 10: pure spike (10 err);
    # buckets 11-13: clean again; buckets 20-25: sustained 100% errors
    for t in range(10):
        rows += [(t * B + i, False) for i in range(10)]
    rows += [(10 * B + i, True) for i in range(10)]
    for t in range(11, 14):
        rows += [(t * B + i, False) for i in range(10)]
    for t in range(20, 26):
        rows += [(t * B + i, True) for i in range(10)]
    df = spark.createDataFrame(rows, "ts_ms long, is_err boolean")
    out = {
        r.bucket_ms // B: r
        for r in slo_burn_rate(
            df, "is_err", slo=0.75, bucket_ms=B, long_buckets=6, alert_burn=1.2
        ).collect()
    }
    spike = out[10]
    assert spike.burn_short == 4.0          # 100% errors / 25% budget
    assert spike.err_rate_long == round(10 / 60, 6)
    assert not spike.alert                   # long window holds it back
    assert not out[9].alert and not out[11].alert
    # sustained burn: by bucket 25 the whole 6-bucket window is errors
    assert out[25].burn_long == 4.0 and out[25].alert
    # bucket 20 alerts too: gap before it means the long window only
    # contains the (all-error) buckets that exist in range
    assert out[20].alert


def test_rolling_corr_coupling_break(spark):
    """Series b tracks a for 30 buckets then flips sign: trailing-10
    correlation decays from +1 after the break; early windows below
    min_overlap return NULL."""
    from time_series_databse_engine_spark.operators.timeseries import rolling_corr

    rows = []
    for t in range(60):
        va = float(t % 7) + 0.5 * t
        vb = va if t < 30 else -va
        rows += [("a", t * 1000, va), ("b", t * 1000, vb)]
    df = spark.createDataFrame(rows, "k string, ts_ms long, value double")
    out = {
        r.bucket // 1000: r
        for r in rolling_corr(
            df, "k", "a", "b", 1000, window_buckets=10, min_overlap=5
        ).collect()
    }
    assert out[2].rolling_corr is None and out[2].n_in_window == 3
    assert out[20].rolling_corr == 1.0
    assert out[45].rolling_corr == -1.0
    assert out[31].rolling_corr < 1.0  # the break is visible immediately


def test_theil_sen_outlier_robust(spark):
    """A clean slope-2 line with 3 wild outliers: Theil-Sen recovers
    slope 2 exactly; OLS on the same data would not."""
    from time_series_databse_engine_spark.operators.timeseries import theil_sen_trend

    B = 1000
    rows = [("m", t * B, 2.0 * t + 5.0) for t in range(30)]
    rows += [("m", t * B, 500.0) for t in (30, 31, 32)]  # burst
    df = spark.createDataFrame(rows, "event_type string, ts_ms long, value double")
    # value rises 2.0 per 1000 ms bucket -> 7200.0 per hour (t is in
    # hours-from-epoch for every bucket size, ADVICE r10)
    r = theil_sen_trend(df, ["event_type"], B).collect()[0]
    assert r.slope_per_hour == 7200.0
    assert r.intercept == 5.0
    assert r.n_buckets == 33 and r.n_pairs == 33 * 32 // 2


def test_survival_km_hand_computed(spark):
    from datetime import datetime

    from time_series_databse_engine_spark.operators.timeseries import survival_km

    def ts(d, h=0):
        return datetime(2024, 1, d, h)

    # global max = Jan 20.  horizon 3 days: last event before Jan 17 -> event.
    # u1: lifetime 1d, churned.  u2: lifetime 1d, churned.
    # u3: lifetime 2d, churned.  u4: lifetime 2d, censored (last=Jan 19).
    # u5: lifetime 5d, censored (last=Jan 20 = gmax).
    rows = []
    for uid, pairs in [
        (1, [ts(2), ts(3)]),
        (2, [ts(5), ts(6)]),
        (3, [ts(4), ts(6)]),
        (4, [ts(17), ts(19)]),
        (5, [ts(15), ts(20)]),
    ]:
        rows += [(uid, p) for p in pairs]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r.duration_days: r for r in survival_km(df, horizon_days=3).collect()}
    # t=1: n_risk=5, d=2 -> S=0.6 ; t=2: n_risk=3, d=1, c=1 -> S=0.6*(2/3)=0.4
    # t=5: n_risk=1, d=0, c=1 -> S stays 0.4
    assert out[1].n_risk == 5 and out[1].n_events == 2 and out[1].survival == 0.6
    assert out[2].n_risk == 3 and out[2].n_events == 1 and out[2].n_censored == 1
    assert out[2].survival == 0.4
    assert out[5].n_risk == 1 and out[5].n_events == 0 and out[5].survival == 0.4


def test_survival_km_all_die_reaches_zero_and_censor_bias(spark):
    from datetime import datetime

    from time_series_databse_engine_spark.operators.timeseries import survival_km

    def ts(d):
        return datetime(2024, 1, d)

    # everyone churned well before the horizon: last stratum d=n -> S=0 exactly
    rows = []
    for uid, span in [(1, 1), (2, 1), (3, 2)]:
        rows += [(uid, ts(1)), (uid, ts(1 + span))]
    rows += [(99, ts(28)), (99, ts(28))]  # anchor gmax far out; lifetime 0, censored? no: churn..
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r.duration_days: r for r in survival_km(df, horizon_days=3).collect()}
    # lifetimes: u1=1,u2=1,u3=2 churned; u99=0 censored(last=Jan28=gmax)
    assert out[0].n_risk == 4 and out[0].n_censored == 1 and out[0].n_events == 0
    assert out[0].survival == 1.0
    assert out[1].n_risk == 3 and out[1].survival == round(1 / 3, 6)
    # t=2: n_risk=1, d=1 -> zero factor -> survival exactly 0.0
    assert out[2].n_risk == 1 and out[2].n_events == 1 and out[2].survival == 0.0
    # censoring vs naive: the censored user never counts as a death
    assert sum(r.n_events for r in out.values()) == 3
