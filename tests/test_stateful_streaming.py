"""Custom stateful streaming operator (applyInPandasWithState EMA):
state carries across micro-batches."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from time_series_databse_engine_spark.streaming.stateful import ema_stream


@pytest.fixture()
def two_batch_source(spark):
    """Two parquet files → two micro-batches with maxFilesPerTrigger=1."""
    d = tempfile.mkdtemp()
    b1 = [("m", 1000, 10.0), ("m", 2000, 20.0)]
    b2 = [("m", 3000, 30.0)]
    schema = "metric string, ts_ms long, value double"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(d + "/src/b1")
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(d + "/src/b2")
    yield d
    shutil.rmtree(d)


def test_ema_carries_state_across_batches(spark, two_batch_source):
    d = two_batch_source
    stream = (
        spark.readStream.schema("metric string, ts_ms long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(d + "/src/*")
    )
    q = (
        ema_stream(stream, alpha=0.5)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ema_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r.ts_ms: r.ema for r in spark.sql("SELECT * FROM ema_out").collect()}
    assert rows[1000] == 10.0                      # seed
    assert rows[2000] == 15.0                      # 0.5*20 + 0.5*10
    assert rows[3000] == 22.5                      # 0.5*30 + 0.5*15 — state crossed batches


def test_cusum_stream_carries_state_and_matches_sequential(spark, two_batch_source):
    """Streaming CUSUM state (sp, sn) persists across micro-batches: the
    statistics after the second batch equal the sequential recursion over
    all three points."""
    from time_series_databse_engine_spark.streaming.stateful import cusum_stream

    d = two_batch_source
    stream = (
        spark.readStream.schema("metric string, ts_ms long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(d + "/src/*")
    )
    q = (
        cusum_stream(stream, mu0=10.0, k=0.5, h=5.0)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cusum_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r.ts_ms: r for r in spark.sql("SELECT * FROM cusum_out").collect()}
    # sequential replay: values 10, 20, 30 vs mu0=10, k=0.5
    sp = sn = 0.0
    expect = {}
    for ts, x in [(1000, 10.0), (2000, 20.0), (3000, 30.0)]:
        sp = max(0.0, sp + (x - 10.0 - 0.5))
        sn = max(0.0, sn - (x - 10.0) - 0.5)
        expect[ts] = (sp, sn, sp > 5.0 or sn > 5.0)
    assert set(rows) == set(expect)
    for ts, (esp, esn, ealarm) in expect.items():
        r = rows[ts]
        assert (r.cusum_pos, r.cusum_neg, r.alarm) == (esp, esn, ealarm)
    # the cross-batch point (3000) must see state from batch 1
    assert rows[3000].cusum_pos == 9.5 + 19.5  # (20-10.5) + (30-10.5)


def test_heavy_hitters_state_across_batches(spark):
    """Misra–Gries counters persist: a token spread across two
    micro-batches is counted across both, within the MG error bound."""
    import shutil
    import tempfile

    from time_series_databse_engine_spark.streaming.stateful import (
        heavy_hitters_stream,
    )

    d = tempfile.mkdtemp()
    try:
        schema = "item string"
        # batch 1: 30×hot, 10×warm, 8 distinct cold; batch 2: 20×hot + cold
        b1 = [("hot",)] * 30 + [("warm",)] * 10 + [(f"c{i}",) for i in range(8)]
        b2 = [("hot",)] * 20 + [(f"d{i}",) for i in range(8)]
        spark.createDataFrame(b1, schema).coalesce(1).write.parquet(d + "/src/b1")
        spark.createDataFrame(b2, schema).coalesce(1).write.parquet(d + "/src/b2")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d + "/src/*")
        )
        q = (
            heavy_hitters_stream(stream, k=4, n_buckets=2)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("hh_out")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # last emission per (bucket, item): memory sink in update mode
        # appends every trigger — take the max est_count per item
        rows = spark.sql(
            "SELECT item, max(est_count) AS est, max(max_err) AS err"
            " FROM hh_out GROUP BY item"
        ).collect()
        got = {r.item: (r.est, r.err) for r in rows}
        assert "hot" in got
        est, err = got["hot"]
        # MG bound: true - err <= est <= true (true = 50 across batches)
        assert est <= 50
        assert est + err >= 50
        assert est >= 30  # must have survived both batches' pruning
    finally:
        shutil.rmtree(d)


def test_sessionize_stream_evicts_state_on_event_time_timeout(spark):
    """A user's session closes (and its state is REMOVED) when the
    watermark — advanced by later batches — passes last_event + gap."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.streaming.stateful import sessionize_stream

    d = tempfile.mkdtemp()
    try:
        schema = "user_id long, ts_ms long"
        # b1: user 1's burst; b2: a far-future event advances the watermark
        spark.createDataFrame(
            [(1, 1_000), (1, 5_000), (1, 3_000)], schema
        ).coalesce(1).write.parquet(d + "/src/b1")
        spark.createDataFrame([(9, 100_000_000)], schema).coalesce(1).write.parquet(
            d + "/src/b2"
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d + "/src/*")
            .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
            .withWatermark("ts", "1 second")
        )
        q = (
            sessionize_stream(stream, gap_ms=10_000)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("sess_out")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        rows = spark.sql("SELECT * FROM sess_out").collect()
        got = {(r.user_id): (r.session_start_ms, r.session_end_ms, r.n_events) for r in rows}
        # user 1's session was closed by the watermark advance; user 9's
        # session is still open (no later watermark) so NOT emitted
        assert got == {1: (1_000, 5_000, 3)}
    finally:
        shutil.rmtree(d)


def test_neardup_stream_flags_cross_batch_duplicate(spark):
    """Streaming LSH band index: batch 2's copy of a batch-1 doc collides
    in every band (is_first=False, first_seen_id = the batch-1 doc);
    fresh text claims its own buckets.  Agreement with the batch
    incremental op is by construction: same signatures, same banding."""
    import shutil
    import tempfile
    import time

    from time_series_databse_engine_spark.operators.dedup import (
        banded_keys,
        minhash_signatures,
    )
    from time_series_databse_engine_spark.streaming.stateful import neardup_stream

    d = tempfile.mkdtemp()
    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    schema = "doc_id long, text string"
    spark.createDataFrame([(1, dup)], schema).coalesce(1).write.parquet(d + "/src/b1")
    time.sleep(1.1)  # distinct mtimes pin micro-batch order
    spark.createDataFrame(
        [(2, dup), (3, "completely different words entirely unrelated text")], schema
    ).coalesce(1).write.parquet(d + "/src/b2")
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d + "/src/*")
        )
        banded = banded_keys(minhash_signatures(stream))
        q = (
            neardup_stream(banded)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("neardup_out")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        rows = spark.sql("SELECT * FROM neardup_out").collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert all(r.is_first for r in by_doc[1])            # batch-1 claims
        assert all(not r.is_first for r in by_doc[2])        # cross-batch dup
        assert all(r.first_seen_id == 1 for r in by_doc[2])
        assert all(r.is_first for r in by_doc[3])            # fresh text
        assert len(by_doc[2]) == 4                           # one row per band
    finally:
        shutil.rmtree(d)


def test_claim_bucket_min_holds_across_chunks():
    """The bucket claimant is the batch-wide min doc_id even when the
    bucket's rows arrive split across Arrow chunks with the smaller id in
    a LATER chunk (the per-chunk-min bug shape)."""
    from time_series_databse_engine_spark.streaming.stateful import _claim_bucket

    # chunk 1 = [30, 40], chunk 2 = [10] — generator mimics chained chunks
    first_id, claims = _claim_bucket(None, iter([30, 40, 10]))
    assert first_id == 10
    assert claims == [(10, 10, True), (30, 10, False), (40, 10, False)]
    # existing state wins regardless of batch contents
    first_id, claims = _claim_bucket(5, iter([30, 10]))
    assert first_id == 5
    assert claims == [(10, 5, False), (30, 5, False)]
