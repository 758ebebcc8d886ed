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
