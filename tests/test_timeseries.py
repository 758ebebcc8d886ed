"""Window operators on crafted series."""

from time_series_databse_engine_spark.operators.timeseries import (
    deltas,
    detect_gaps,
    downsample,
    moving_avg,
    resample_interpolate,
    sessionize,
    topk_per_group,
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
