"""Streaming dedup: dropDuplicatesWithinWatermark removes replayed events
inside the watermark delay — the streaming analogue of exact dedup."""

import shutil
import tempfile

from pyspark.sql import functions as F


def test_drop_duplicates_within_watermark(spark):
    d = tempfile.mkdtemp()
    try:
        schema = "event_id long, ts timestamp, value double"
        rows = [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:00:05", 1.0),   # replay of event 1 (different ts)
            (2, "2024-01-01 00:01:00", 2.0),
        ]
        df = spark.createDataFrame(rows, "event_id long, ts string, value double").select(
            "event_id", F.to_timestamp("ts").alias("ts"), "value"
        )
        df.coalesce(1).write.parquet(d + "/src/b1")
        stream = spark.readStream.schema(schema).parquet(d + "/src/*")
        q = (
            stream.withWatermark("ts", "10 minutes")
            .dropDuplicatesWithinWatermark(["event_id"])
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_out")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        ids = sorted(r.event_id for r in spark.sql("SELECT * FROM dedup_out").collect())
        assert ids == [1, 2]
    finally:
        shutil.rmtree(d)


def test_streaming_neardup_suppression_to_exactly_once_sink(spark, tmp_path):
    """End-to-end: streaming LSH band-index suppression chained into the
    idempotent epoch sink — the full production shape.  Two micro-batches
    (batch 2 = one near-dup of batch 1 + one fresh doc) flow through
    minhash → banding → neardup_stream; a foreachBatch stage keeps only
    docs whose every band claimed first and writes them via
    ``ingest_epoch``.  Then the CRASH REPLAY: checkpoint wiped, the whole
    stream re-fires with the same epoch ids — the store must converge to
    the same 2 unique docs, not double (exactly-once), and the rebuilt
    band-index state must suppress the same near-dup (determinism)."""
    import time

    from time_series_databse_engine_spark import TimeSeriesStore
    from time_series_databse_engine_spark.operators.dedup import (
        banded_keys,
        minhash_signatures,
    )
    from time_series_databse_engine_spark.streaming.stateful import neardup_stream

    d = str(tmp_path)
    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    schema = "doc_id long, text string"
    spark.createDataFrame([(1, dup)], schema).coalesce(1).write.parquet(d + "/src/b1")
    time.sleep(1.1)  # distinct mtimes pin micro-batch order (stable epoch ids)
    spark.createDataFrame(
        [(2, dup), (3, "completely different words entirely unrelated text")], schema
    ).coalesce(1).write.parquet(d + "/src/b2")

    store = TimeSeriesStore(spark, d + "/points")

    def sink(batch_df, epoch_id):
        kept = (
            batch_df.groupBy("doc_id")
            .agg(F.min(F.col("is_first").cast("int")).alias("all_first"))
            .filter(F.col("all_first") == 1)
            .select(
                F.lit("doc").alias("metric"),
                F.col("doc_id").alias("ts_ms"),
                F.lit(1.0).alias("value"),
            )
        )
        store.ingest_epoch(kept, epoch_id=epoch_id, target_partitions=1)

    for attempt in range(2):  # second pass = full crash replay, ckpt wiped
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d + "/src/*")
        )
        flags = neardup_stream(banded_keys(minhash_signatures(stream)))
        q = (
            flags.writeStream.foreachBatch(sink)
            .option("checkpointLocation", d + "/ckpt")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        shutil.rmtree(d + "/ckpt")
        kept_ids = sorted(
            r.ts_ms for r in store.points().select("ts_ms").collect()
        )
        assert kept_ids == [1, 3], f"attempt {attempt}: {kept_ids}"
