"""Focused tests for operators._util (r13: the `_parallelize` guard must
not round-robin-shuffle a table whose few files already SPLIT into enough
scan tasks — VERDICT r12 #7 — and `_shuffle_width` must survive
non-numeric vendor conf values)."""

from pyspark.sql import functions as F

from time_series_databse_engine_spark.operators._util import (
    _estimated_scan_splits,
    _parallelize,
    _shuffle_width,
)


def _has_round_robin(df) -> bool:
    plan = df._jdf.queryExecution().logical().toString()
    return "Repartition" in plan


def test_parallelize_noop_on_wide_enough_split(spark, tmp_path):
    """One file larger than maxPartitionBytes estimates >= parallelism
    splits — the guard must leave the scan alone (no repartition node)."""
    p = str(tmp_path / "big.parquet")
    spark.range(200_000).select(
        F.col("id"), F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad")
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # force the size/maxPartitionBytes estimate above the target
        spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
        assert (
            _estimated_scan_splits(spark, list(df.inputFiles()))
            >= spark.sparkContext.defaultParallelism
        )
        out = _parallelize(df)
        assert out is df, "few-huge-files table must not be reshuffled"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_parallelize_spreads_single_small_file(spark, tmp_path):
    """The original purpose stays: a single small file (fewer estimated
    splits than cores) is round-robin spread."""
    p = str(tmp_path / "small.parquet")
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    out = _parallelize(df)
    assert out is not df and _has_round_robin(out)
    assert out.count() == 100


def test_estimated_scan_splits_fallback_counts_files(spark):
    # unstat-able URIs fall back to one split per file (old behaviour)
    assert _estimated_scan_splits(spark, ["hdfs://nn/a.parquet", "hdfs://nn/b.parquet"]) == 2


def test_shuffle_width_numeric_and_fallback(spark):
    assert _shuffle_width(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    # vanilla Spark rejects a non-numeric value at set() time, but vendor
    # runtimes ship e.g. "auto" — exercise the fallback through a stub
    class _Conf:
        def get(self, key):
            return "auto"

    class _Stub:
        conf = _Conf()
        sparkContext = spark.sparkContext

    assert _shuffle_width(_Stub()) == spark.sparkContext.defaultParallelism
