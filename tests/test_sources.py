"""Source/sink roundtrips: csv, json, orc (parquet is exercised by the
store and every driver query; bucketed tables by test_sketches_upsert_
bucketing)."""

from pyspark.sql import functions as F

from time_series_databse_engine_spark.sources import (
    read_csv,
    read_json,
    read_orc,
    write_orc,
    write_parquet,
)


def _pts(spark):
    rows = [("cpu", 1000 * i, float(i)) for i in range(10)]
    return spark.createDataFrame(rows, "metric string, ts_ms long, value double")


def test_csv_roundtrip_with_schema(spark, tmp_path):
    p = str(tmp_path / "pts_csv")
    _pts(spark).write.option("header", "true").csv(p)
    back = read_csv(spark, p, schema="metric string, ts_ms long, value double")
    assert back.count() == 10
    assert dict(back.dtypes) == {"metric": "string", "ts_ms": "bigint", "value": "double"}


def test_json_roundtrip(spark, tmp_path):
    p = str(tmp_path / "pts_json")
    _pts(spark).write.json(p)
    back = read_json(spark, p, schema="metric string, ts_ms long, value double")
    assert {r.ts_ms for r in back.collect()} == {1000 * i for i in range(10)}


def test_orc_roundtrip_partitioned_and_pruned(spark, tmp_path):
    """ORC sink partitions like the parquet path and the reader gets
    partition pruning + predicate pushdown from the same declarative
    filter."""
    p = str(tmp_path / "pts_orc")
    df = _pts(spark).withColumn("bucket", (F.col("ts_ms") / 5000).cast("long"))
    write_orc(df, p, partition_by=("bucket",))
    back = read_orc(spark, p)
    assert back.count() == 10
    filtered = back.filter(F.col("bucket") == 1)
    assert filtered.count() == 5
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan


def test_orc_parquet_same_rows(spark, tmp_path):
    """Same DataFrame lands identically through both columnar sinks."""
    po, pp = str(tmp_path / "o"), str(tmp_path / "p")
    df = _pts(spark)
    write_orc(df, po)
    write_parquet(df, pp)
    a = sorted(map(tuple, read_orc(spark, po).collect()))
    b = sorted(map(tuple, spark.read.parquet(pp).collect()))
    assert a == b
