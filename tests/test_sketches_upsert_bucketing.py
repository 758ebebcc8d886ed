"""HLL sketch rollups, store upsert, and bucketed co-located joins."""

import pytest
from pyspark.sql import functions as F

from time_series_databse_engine_spark import TimeSeriesStore
from time_series_databse_engine_spark.operators.sketches import (
    DAY_MS,
    hll_daily_sketches,
    hll_estimate,
)
from time_series_databse_engine_spark.plans import num_shuffle_exchanges
from time_series_databse_engine_spark.sources import load_table, write_bucketed


# ------------------------------------------------------------------ sketches

def test_hll_estimate_accuracy(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sk = hll_daily_sketches(ev, ["event_type"], "user_id")
    est = {r.event_type: r.approx_distinct for r in hll_estimate(sk, ["event_type"]).collect()}
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 0.05, (k, est[k], n)


def test_hll_range_union_vs_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    lo = ev.agg(F.min("ts_ms")).collect()[0][0]
    lo_day = lo - lo % DAY_MS
    hi_day = lo_day + 3 * DAY_MS
    sk = hll_daily_sketches(ev, ["event_type"], "user_id")
    est = {
        r.event_type: r.approx_distinct
        for r in hll_estimate(sk, ["event_type"], lo_day, hi_day).collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.filter((F.col("ts_ms") >= lo_day) & (F.col("ts_ms") < hi_day))
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(est[k] - n) / max(n, 1) < 0.05
    # the union read only 3 sketch rows per series, not the raw table
    assert sk.filter((F.col("day_ms") >= lo_day) & (F.col("day_ms") < hi_day)).count() <= 3 * len(exact)


def test_hll_register_daily_accuracy_and_merge(spark, sf_dir):
    """The md5-register HLL rollup (the oracle-backed twin of the
    DataSketches path): estimates within 5% of exact per series; register
    tables from two disjoint ingests UNION + re-estimate to EXACTLY the
    full-scan answer (semigroup merge — never a rescan); the xxhash64
    production config lands the same accuracy with the same shapes."""
    from time_series_databse_engine_spark.operators.sketches import (
        hll_register_daily,
        hll_register_estimate,
    )

    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for hash_fn in ("md5", "xxhash64"):
        sk = hll_register_daily(ev, ["event_type"], "user_id", hash_fn=hash_fn)
        est = {
            r.event_type: r.approx_distinct
            for r in hll_register_estimate(sk, ["event_type"]).collect()
        }
        for k, n in exact.items():
            assert abs(est[k] - n) / n < 0.05, (hash_fn, k, est[k], n)

    # mergeability: split by user parity, union the register tables,
    # re-estimate — bit-identical to the one-pass rollup
    half = F.coalesce(F.col("user_id") % 2, F.lit(0))
    a = hll_register_daily(ev.where(half == 0), ["event_type"], "user_id")
    b = hll_register_daily(ev.where(half == 1), ["event_type"], "user_id")
    merged = hll_register_estimate(a.unionByName(b), ["event_type"])
    full = hll_register_estimate(
        hll_register_daily(ev, ["event_type"], "user_id"), ["event_type"]
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_simhash_md5_sliced_near_dup_behavior(spark):
    """simhash64_md5_sliced keeps SimHash's contract: near-identical docs
    land within a few bits (hamming), unrelated docs far apart, and the
    signature is deterministic across evaluations."""
    from time_series_databse_engine_spark.operators.dedup import (
        hamming64,
        simhash64_md5_sliced,
    )

    base = "the quick brown fox jumps over the lazy dog " * 6
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base + "extra token"),
            (2, "completely different content about spark shuffles and parquet row groups"),
        ],
        "doc_id long, text string",
    )
    sig = simhash64_md5_sliced(docs)
    j = (
        sig.alias("a")
        .crossJoin(sig.alias("b"))
        .select(
            F.col("a.doc_id").alias("i"),
            F.col("b.doc_id").alias("j"),
            hamming64("a.simhash", "b.simhash").alias("d"),
        )
    )
    d = {(r.i, r.j): r.d for r in j.collect()}
    assert d[(0, 0)] == 0
    assert d[(0, 1)] <= 8, d[(0, 1)]
    assert d[(0, 2)] >= 16, d[(0, 2)]
    assert sorted(map(tuple, sig.collect())) == sorted(map(tuple, sig.collect()))


# -------------------------------------------------------------------- upsert

def _mk_store(spark, tmp_path):
    store = TimeSeriesStore(spark, str(tmp_path / "pts"))
    rows = [("m", 1000, 1.0), ("m", 2000, 2.0), ("m", 3_600_000 + 500, 3.0), ("x", 1000, 9.0)]
    store.ingest(spark.createDataFrame(rows, "metric string, ts_ms long, value double"))
    return store


def test_upsert_replaces_and_inserts(spark, tmp_path):
    store = _mk_store(spark, tmp_path)
    up = [
        ("m", 2000, 20.0),       # replace existing
        ("m", 2500, 25.0),       # new point, existing hour
        ("y", 7_200_000, 7.0),   # new metric, new hour partition
    ]
    store.upsert(spark.createDataFrame(up, "metric string, ts_ms long, value double"))
    got = {(r.metric, r.ts_ms): r.value for r in store.points().collect()}
    assert got[("m", 2000)] == 20.0          # replaced
    assert got[("m", 2500)] == 25.0          # inserted
    assert got[("m", 1000)] == 1.0           # carried over in touched hour
    assert got[("x", 1000)] == 9.0           # other series in touched hour intact
    assert got[("m", 3_600_000 + 500)] == 3.0  # untouched hour intact
    assert got[("y", 7_200_000)] == 7.0      # new partition created
    assert len(got) == 6


def test_upsert_batch_duplicates_deterministic(spark, tmp_path):
    store = _mk_store(spark, tmp_path)
    up = [("m", 2000, 5.0), ("m", 2000, 7.0)]  # same key twice in one batch
    store.upsert(spark.createDataFrame(up, "metric string, ts_ms long, value double"))
    got = store.points().filter((F.col("metric") == "m") & (F.col("ts_ms") == 2000)).collect()
    assert len(got) == 1 and got[0].value == 7.0  # max wins, documented


def test_upsert_preserves_roundtrip_query(spark, tmp_path):
    store = _mk_store(spark, tmp_path)
    store.upsert(
        spark.createDataFrame([("m", 1500, 1.5)], "metric string, ts_ms long, value double")
    )
    vals = [r.value for r in store.query_range(0, 3000, metrics=["m"]).collect()]
    assert vals == [1.0, 1.5, 2.0]  # ordered by ts, inclusive bounds


# ------------------------------------------------------------ bucketed joins

@pytest.mark.usefixtures("spark")
def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # a killed previous run can leave the managed-table DIRECTORY behind
    # without a catalog entry — DROP TABLE alone won't clear it and
    # saveAsTable then fails with LOCATION_ALREADY_EXISTS
    import shutil

    for tbl in ("t_cust_b", "t_orders_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{tbl}", ignore_errors=True)
    write_bucketed(cust, "t_cust_b", ("c_custkey",), num_buckets=4, sort_cols=("c_custkey",))
    write_bucketed(
        orders, "t_orders_b", ("o_custkey",), num_buckets=4, sort_cols=("o_custkey",)
    )
    try:
        with_bucketing = spark.table("t_cust_b").join(
            spark.table("t_orders_b"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        # force SMJ so the assertion is about bucketing, not broadcast
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            assert num_shuffle_exchanges(with_bucketing) == 0
            assert with_bucketing.count() == orders.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cust_b")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")


def test_histogram_sketch_percentile_within_half_bin(spark, sf_dir):
    """The sketch-derived p95 is within ONE bin width of the exact
    (interpolated) percentile per series: the midpoint is ≤ half a bin
    from every value in its bin, and the interpolated exact percentile
    can sit up to the adjacent order statistic across the bin edge."""
    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.operators.sketches import (
        histogram_sketches,
        percentile_from_sketches,
    )
    from time_series_databse_engine_spark.sources import load_table

    e = load_table(spark, sf_dir, "events")
    s = histogram_sketches(e, ["event_type"], lo=0.0, hi=500.0, bins=64)
    est = {
        r.event_type: r.p95_est
        for r in percentile_from_sketches(
            s, ["event_type"], q=0.95, lo=0.0, hi=500.0, bins=64
        ).collect()
    }
    exact = {
        r.event_type: r.p
        for r in e.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.95)").alias("p"))
        .collect()
    }
    bin_w = 500.0 / 64
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) <= bin_w + 1e-9, (k, est[k], exact[k])


def test_histogram_sketches_merge_exactly(spark, sf_dir):
    """Summing per-day sketch rows equals the sketch of the whole table —
    the mergeable-state property, exact because counts are integers."""
    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.operators.sketches import histogram_sketches
    from time_series_databse_engine_spark.sources import load_table

    e = load_table(spark, sf_dir, "events")
    daily = histogram_sketches(e, ["event_type"], lo=0.0, hi=500.0, bins=64)
    merged = sorted(
        map(
            tuple,
            daily.groupBy("event_type", "bin").agg(F.sum("cnt").alias("cnt")).collect(),
        )
    )
    whole = sorted(
        map(
            tuple,
            histogram_sketches(
                e, ["event_type"], lo=0.0, hi=500.0, bins=64, bucket_ms=1 << 60
            )
            .select("event_type", "bin", "cnt")
            .collect(),
        )
    )
    assert merged == whole


def test_cms_topk_never_underestimates_and_finds_heavy_hitters(spark):
    """CMS estimates are >= true counts (one-sided error) and the true
    heavy hitters dominate the top-k; counters are mergeable (sum of two
    half-corpus sketches == whole-corpus sketch)."""
    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.operators.sketches import (
        cms_counters,
        cms_topk,
    )

    base = spark.range(2000).select(
        "id",
        F.when(F.col("id") % 10 == 0, "heavy")
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 400).cast("string")))
        .alias("item"),
    )
    df = base.select("item")
    out = cms_topk(df, "item", k=5, depth=4, width=64).collect()
    assert all(r["est_cnt"] >= r["true_cnt"] for r in out)
    assert out[0]["item"] == "heavy" and out[0]["true_cnt"] == 200
    # mergeability: sketch(first half) + sketch(second half) == sketch(all)
    a = cms_counters(base.filter("id < 1000"), "item", depth=2, width=32)
    b = cms_counters(base.filter("id >= 1000"), "item", depth=2, width=32)
    whole = {(r["row"], r["col"]): r["cnt"]
             for r in cms_counters(df, "item", depth=2, width=32).collect()}
    merged: dict = {}
    for r in a.unionAll(b).collect():
        merged[(r["row"], r["col"])] = merged.get((r["row"], r["col"]), 0) + r["cnt"]
    assert merged == whole


def test_write_bucketed_sweep_only_clears_spark_table_dirs(spark, sf_dir):
    """ADVICE r6: the stale-location sweep must only remove directories
    that are recognizably a prior Spark parquet-table write.  A foreign
    directory sharing the table name survives (write_bucketed fails
    loudly instead of deleting it); a genuine stale part-file dir is
    swept and the write succeeds."""
    import os
    import shutil

    cust = load_table(spark, sf_dir, "customer")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")

    # (a) foreign dir: user data that merely shares the name
    foreign = os.path.join(wh, "t_sweep_foreign")
    spark.sql("DROP TABLE IF EXISTS t_sweep_foreign")
    shutil.rmtree(foreign, ignore_errors=True)
    os.makedirs(foreign)
    with open(os.path.join(foreign, "precious.txt"), "w") as fh:
        fh.write("not a spark table")
    try:
        with pytest.raises(Exception):
            write_bucketed(cust, "t_sweep_foreign", ("c_custkey",), num_buckets=2)
        assert os.path.exists(os.path.join(foreign, "precious.txt"))
    finally:
        shutil.rmtree(foreign, ignore_errors=True)
        spark.sql("DROP TABLE IF EXISTS t_sweep_foreign")

    # (b) stale spark-table dir: part files + _SUCCESS, no catalog entry
    stale = os.path.join(wh, "t_sweep_stale")
    spark.sql("DROP TABLE IF EXISTS t_sweep_stale")
    shutil.rmtree(stale, ignore_errors=True)
    os.makedirs(stale)
    for fname in ("part-00000-dead.parquet", "_SUCCESS"):
        open(os.path.join(stale, fname), "w").close()
    try:
        write_bucketed(cust, "t_sweep_stale", ("c_custkey",), num_buckets=2)
        assert spark.table("t_sweep_stale").count() == cust.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_sweep_stale")
        shutil.rmtree(stale, ignore_errors=True)
