"""Empty-input and degenerate-input behaviour of the round-3 operators:
every op must return an empty (or well-defined) result, never raise."""

from pyspark.sql import functions as F


def _empty_events(spark):
    return spark.createDataFrame([], "user_id long, event_type string, ts_ms long, value double")


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string, lang string")


def test_funnel_empty_and_no_step1(spark):
    from time_series_databse_engine_spark.operators.timeseries import funnel

    assert funnel(_empty_events(spark), ["view", "click"]).count() == 0
    df = spark.createDataFrame(
        [(1, "click", 100, 0.0)], "user_id long, event_type string, ts_ms long, value double"
    )
    assert funnel(df, ["view", "click"]).count() == 0


def test_chunked_smoothers_single_row_series(spark):
    from time_series_databse_engine_spark.operators.timeseries import (
        ewma_chunked,
        holt_chunked,
    )

    df = spark.createDataFrame([("m", 1000, 7.5)], "metric string, ts_ms long, value double")
    e = ewma_chunked(df, "metric", alpha=0.3, chunk_ms=100).collect()
    assert len(e) == 1 and e[0].ewma == 7.5
    h = holt_chunked(df, "metric", alpha=0.5, beta=0.2, chunk_ms=100).collect()
    assert len(h) == 1 and h[0].level == 7.5 and h[0].trend == 0.0


def test_semantic_dedup_empty_and_singleton(spark):
    from time_series_databse_engine_spark.operators.similarity import semantic_dedup

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert semantic_dedup(empty, threshold=0.5).count() == 0
    one = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<float>")
    kept = semantic_dedup(one, threshold=0.5, n_cells=4).collect()
    assert [r.vec_id for r in kept] == [1]


def test_dup_span_ranges_and_dsir_empty(spark):
    from time_series_databse_engine_spark.operators.dedup import duplicate_span_ranges
    from time_series_databse_engine_spark.operators.text import dsir_importance_weights

    docs = _empty_docs(spark)
    assert duplicate_span_ranges(docs, n=8).count() == 0
    assert dsir_importance_weights(docs, F.col("lang") == "en").count() == 0


def test_histogram_sketch_empty_and_out_of_range(spark):
    from time_series_databse_engine_spark.operators.sketches import (
        histogram_sketches,
        percentile_from_sketches,
    )

    empty = _empty_events(spark)
    s = histogram_sketches(empty, ["event_type"], lo=0.0, hi=10.0, bins=4)
    assert s.count() == 0
    assert percentile_from_sketches(s, ["event_type"], q=0.5, lo=0.0, hi=10.0, bins=4).count() == 0
    # out-of-range values clamp into edge bins, never drop
    df = spark.createDataFrame(
        [(1, "a", 0, -5.0), (2, "a", 0, 99.0)],
        "user_id long, event_type string, ts_ms long, value double",
    )
    bins = {r.bin: r.cnt for r in histogram_sketches(df, ["event_type"], lo=0.0, hi=10.0, bins=4).collect()}
    assert bins == {0: 1, 3: 1}


def test_resample_expr_empty(spark):
    from time_series_databse_engine_spark.operators.timeseries import resample_interpolate_expr

    df = spark.createDataFrame([], "metric string, ts_ms long, value double")
    assert resample_interpolate_expr(df, "metric", 1000).count() == 0
