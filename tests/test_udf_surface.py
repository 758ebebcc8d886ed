"""UDF/UDAF/UDTF API surface: each Python entry point agrees with the
JVM-expression (or built-in aggregate) implementation of the same logic."""

import pandas as pd
from pyspark.sql import functions as F

from time_series_databse_engine_spark.operators.text import (
    chunk_documents,
    make_chunk_udtf,
)
from time_series_databse_engine_spark.sources import load_table


def test_udtf_chunking_matches_expression_form(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    expr = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(docs, chunk_size=20).collect()
    }

    spark.udtf.register("chunk_docs", make_chunk_udtf())
    docs.createOrReplaceTempView("docs_for_udtf")
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens)
        for r in spark.sql(
            "SELECT d.doc_id, c.* FROM docs_for_udtf d, "
            "LATERAL chunk_docs(d.text, 20) c"
        ).collect()
    }
    assert got == expr


def test_grouped_agg_pandas_udaf_matches_builtin_regr_slope(spark, sf_dir):
    @F.pandas_udf("double")
    def slope_udaf(x: pd.Series, y: pd.Series) -> float:
        import numpy as np

        xm, ym = x - x.mean(), y - y.mean()
        return float(np.dot(xm, ym) / np.dot(xm, xm))

    e = load_table(spark, sf_dir, "events")
    x = F.col("ts_ms") / 3600000.0
    # grouped-agg pandas UDFs can't share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — compute the two separately
    udaf = {
        r.event_type: r.s
        for r in e.groupBy("event_type").agg(slope_udaf(x, F.col("value")).alias("s")).collect()
    }
    builtin = {
        r.event_type: r.s
        for r in e.groupBy("event_type").agg(F.regr_slope("value", x).alias("s")).collect()
    }
    assert len(udaf) == len(builtin) == 5
    for k, s_builtin in builtin.items():
        assert abs(udaf[k] - s_builtin) <= 1e-9 + 1e-6 * abs(s_builtin)
