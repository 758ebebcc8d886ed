"""PySpark-native analytics engine with the capabilities of the reference
Insight-TSDB (KaranSinghDev/Time-Series-Databse-Engine) plus large-scale
data-pipeline operators (dedup, similarity search, text analysis, multimodal).

Design stance (SURVEY.md §7.0): declarative DataFrame/SQL plans, Catalyst
does pruning/pushdown; storage is hour-partitioned ZSTD Parquet — the
reference's hour-shard layout (reference engine/insight.cpp:9-14) done
idiomatically.  Nothing here is a translation of the reference's C++.
"""

from time_series_databse_engine_spark.session import get_spark
from time_series_databse_engine_spark.tsdb import TimeSeriesStore

__all__ = ["get_spark", "TimeSeriesStore"]
