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


def test_asof_forward_fixture(spark):
    from time_series_databse_engine_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("m", 100), ("m", 250), ("m", 500)], "metric string, ts_ms long"
    )
    right = spark.createDataFrame(
        [("m", 100, 1.0), ("m", 300, 3.0), ("m", 400, 4.0)],
        "metric string, ts_ms long, value double",
    )
    got = {
        r.ts_ms: (r.ts_ms_right, r.value_right)
        for r in asof_join(left, right, by=["metric"], direction="forward").collect()
    }
    # inclusive >=: 100 matches the equal-ts right row
    assert got == {100: (100, 1.0), 250: (300, 3.0), 500: (None, None)}


def test_asof_nearest_fixture_and_ties(spark):
    from time_series_databse_engine_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("m", 200), ("m", 240), ("m", 350)], "metric string, ts_ms long"
    )
    right = spark.createDataFrame(
        [("m", 100, 1.0), ("m", 300, 3.0)], "metric string, ts_ms long, value double"
    )
    got = {
        r.ts_ms: (r.ts_ms_right, r.value_right)
        for r in asof_join(left, right, by=["metric"], direction="nearest").collect()
    }
    assert got[240] == (300, 3.0)          # 60 forward beats 140 backward
    assert got[350] == (300, 3.0)          # backward only side
    assert got[200] == (100, 1.0)          # exact tie (100 each) -> backward


def test_asof_nearest_tolerance_disqualifies_sides(spark):
    from time_series_databse_engine_spark.operators.asof import asof_join

    left = spark.createDataFrame([("m", 1000)], "metric string, ts_ms long")
    right = spark.createDataFrame(
        [("m", 100, 1.0), ("m", 1900, 9.0)], "metric string, ts_ms long, value double"
    )
    got = asof_join(
        left, right, by=["metric"], direction="nearest", tolerance_ms=500
    ).collect()[0]
    assert got.ts_ms_right is None and got.value_right is None


def test_asof_forward_matches_pandas(spark, sf_dir):
    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.operators.asof import asof_join, asof_join_pandas
    from time_series_databse_engine_spark.sources import load_table

    # load twice: cogroup over two branches of ONE scan hits Spark's
    # self-join attribute-id collision inside FlatMapCoGroupsInPandas
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts_ms")
    )
    clicks = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id", "ts_ms", "value")
    )
    a = {
        (r.event_id, r.value_right)
        for r in asof_join(
            purchases, clicks, by=["user_id"], right_cols=["value"], direction="forward"
        ).select("event_id", "value_right").collect()
    }
    b = {
        (r.event_id, r.value_right)
        for r in asof_join_pandas(
            purchases, clicks, by="user_id", right_cols=["value"], direction="forward"
        ).select("event_id", "value_right").collect()
    }
    assert a == b


def test_interval_bucket_join_exact_and_no_nested_loop(spark):
    """Bucket-decomposed keyless interval join: (1) equals the naive theta
    join on a fixture with boundary hits, multi-bucket intervals and
    overlapping windows; (2) each qualifying pair appears exactly once
    (a point has ONE bucket); (3) the plan is an equi join on the bucket,
    never BroadcastNestedLoopJoin/cartesian."""
    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.operators.asof import interval_bucket_join

    pts = spark.createDataFrame(
        [(i, t) for i, t in enumerate([0, 999, 1000, 3500, 7200, 9999, 10000])],
        "event_id long, ts_ms long",
    )
    iv = spark.createDataFrame(
        [(0, 0, 999), (1, 500, 7200), (2, 7000, 12000)],  # overlapping, multi-bucket
        "window_id long, start_ms long, end_ms long",
    )
    out = interval_bucket_join(pts, iv, bucket_ms=1000)
    got = sorted((r.event_id, r.window_id) for r in out.collect())
    naive = sorted(
        (p.event_id, w.window_id)
        for p in pts.collect()
        for w in iv.collect()
        if w.start_ms <= p.ts_ms <= w.end_ms
    )
    assert got == naive and len(got) == len(set(got))
    plan = out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" not in plan and "Cartesian" not in plan
