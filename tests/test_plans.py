"""Plan-shape assertions: the 100 TB posture, checked programmatically."""

from pyspark.sql import functions as F

from time_series_databse_engine_spark.plans import (
    has_cartesian_product,
    num_shuffles,
    partition_filters,
    pushed_filters,
    uses_broadcast_join,
)
from time_series_databse_engine_spark.sources import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    assert any("l_quantity" in p for p in pushed_filters(df))


def test_small_dim_join_broadcasts(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    df = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    assert uses_broadcast_join(df)
    assert not has_cartesian_product(df)


def test_store_partition_pruning(spark, tmp_path):
    from time_series_databse_engine_spark import TimeSeriesStore

    store = TimeSeriesStore(spark, str(tmp_path / "p"))
    store.ingest(
        spark.createDataFrame(
            [("m", 1000, 1.0), ("m", 7_200_000, 2.0)],
            "metric string, ts_ms long, value double",
        )
    )
    df = store.query_range(0, 3000)
    assert any("hour_bucket" in p for p in partition_filters(df))


def test_windowed_agg_single_shuffle(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    from time_series_databse_engine_spark.operators.timeseries import moving_avg

    df = moving_avg(ev, ["event_type"], ["ts_ms"])
    assert num_shuffles(df) <= 1
