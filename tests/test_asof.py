"""As-of join: hand-built cases incl. exact-tie inclusivity, no-match rows,
tolerance, and agreement between the window and merge_asof implementations."""

from pyspark.sql import functions as F

from time_series_databse_engine_spark.operators.asof import asof_join, asof_join_pandas


def _fixtures(spark):
    left = spark.createDataFrame(
        [("a", 100), ("a", 250), ("a", 300), ("b", 100), ("c", 50)],
        "metric string, ts_ms long",
    )
    right = spark.createDataFrame(
        [("a", 100, 1.0), ("a", 200, 2.0), ("a", 400, 4.0), ("b", 90, 9.0)],
        "metric string, ts_ms long, value double",
    )
    return left, right


def test_asof_basic(spark):
    left, right = _fixtures(spark)
    out = asof_join(left, right, on="ts_ms", by=["metric"], right_cols=["value"])
    got = {(r.metric, r.ts_ms): r.value_right for r in out.collect()}
    assert got == {
        ("a", 100): 1.0,   # exact tie matches (inclusive <=)
        ("a", 250): 2.0,
        ("a", 300): 2.0,
        ("b", 100): 9.0,
        ("c", 50): None,   # key with no right side
    }


def test_asof_tolerance(spark):
    left, right = _fixtures(spark)
    out = asof_join(
        left, right, on="ts_ms", by=["metric"], right_cols=["value"], tolerance_ms=60
    )
    got = {(r.metric, r.ts_ms): r.value_right for r in out.collect()}
    assert got[("a", 250)] == 2.0      # 50ms old — within tolerance
    assert got[("a", 300)] is None     # 100ms old — voided
    assert got[("a", 100)] == 1.0


def test_asof_matches_pandas_impl(spark):
    left, right = _fixtures(spark)
    a = asof_join(left, right, on="ts_ms", by=["metric"], right_cols=["value"])
    b = asof_join_pandas(left, right, on="ts_ms", by="metric", right_cols=["value"])
    ka = sorted([(r.metric, r.ts_ms, r.value_right) for r in a.collect()])
    kb = sorted([(r.metric, r.ts_ms, r.value_right) for r in b.collect()])
    assert ka == kb
