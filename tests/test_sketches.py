"""KMV (theta) sketch tests: estimator accuracy, merge closure, set-op
estimates vs exact truth."""

from pyspark.sql import functions as F
def test_kmv_estimate_accuracy_and_exact_small_groups(spark):
    """KMV estimate is exact below k and within ~2/sqrt(k) relative error
    above it; sketches are tiny (≤k hashes per group)."""
    from time_series_databse_engine_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketches,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    sk = kmv_sketches(ev, ["event_type"], "user_id", k=64)
    assert all(len(r["kmv"]) <= 64 for r in sk.collect())
    est = {r["event_type"]: r["approx_distinct"] for r in kmv_estimate(sk, ["event_type"], k=64).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for t, n in exact.items():
        if n < 64:
            assert est[t] == n
        else:
            assert abs(est[t] - n) / n < 0.5  # k=64 → ~12% typical, 50% bound

    # small synthetic group: exact path
    df = spark.createDataFrame([("a", i % 10) for i in range(100)], "g string, v int")
    sk2 = kmv_sketches(df, ["g"], "v", k=64)
    assert kmv_estimate(sk2, ["g"], 64).collect()[0]["approx_distinct"] == 10.0


def test_kmv_union_merge_equals_direct_sketch(spark):
    """Merging per-day sketches gives EXACTLY the sketch of the union —
    closure under merge is what makes the persisted rollup answer any
    later range without rescan."""
    from time_series_databse_engine_spark.operators.sketches import (
        kmv_sketches,
        kmv_union,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").withColumn(
        "day", F.to_date("ts")
    )
    per_day = kmv_sketches(ev, ["event_type", "day"], "user_id", k=32)
    merged = kmv_union(per_day.drop("day"), ["event_type"], k=32)
    direct = kmv_sketches(ev, ["event_type"], "user_id", k=32)
    m = {r["event_type"]: r["kmv"] for r in merged.collect()}
    d = {r["event_type"]: r["kmv"] for r in direct.collect()}
    assert m == d


def test_kmv_set_ops_jaccard_close_to_truth(spark):
    from time_series_databse_engine_spark.operators.sketches import (
        kmv_set_ops,
        kmv_sketches,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    va = kmv_sketches(ev.filter(F.col("event_type") == "view"), [], "user_id", k=64)
    cb = kmv_sketches(ev.filter(F.col("event_type") == "click"), [], "user_id", k=64)
    r = kmv_set_ops(va, cb, k=64).collect()[0]
    A = {x["user_id"] for x in ev.filter("event_type='view'").select("user_id").distinct().collect()}
    B = {x["user_id"] for x in ev.filter("event_type='click'").select("user_id").distinct().collect()}
    true_u, true_i = len(A | B), len(A & B)
    assert abs(r["union_est"] - true_u) / true_u < 0.5
    assert abs(r["jaccard_est"] - true_i / true_u) < 0.3
