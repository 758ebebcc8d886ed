"""Host-skew wall-clock proof for host_profile (VERDICT r7 #7).

SCALE.md asserts partial aggregation absorbs crawl host skew; this
measures it instead of asserting it.  Two synthetic crawls of N pages,
identical except for the host distribution:

  - uniform: pages spread evenly over 10,007 hosts
  - skewed:  90% of pages on ONE host, the rest over 10,007 hosts
    (every hot page a UNIQUE path — the worst case for map-side
    collapse, since no two rows share a (host, path) key)

If the host-keyed exchange carried raw pages, the skewed run would
serialize 90% of the data through one reducer and the ratio would
approach n_partitions/2.  Because the first aggregate is partial-mode
keyed (host, path) (plan pinned in test_web.py::
test_host_profile_skew_absorbed_map_side), the hot host spreads over
every partition of the first shuffle and only merged partials reach
the host key, so skewed/uniform should stay ~1×.

    python tools/host_skew_probe.py [n_rows] [n_reps]

Prints one JSON line: per-condition best-of-N wall seconds + ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_databse_engine_spark import get_spark
from time_series_databse_engine_spark.operators.web import host_profile


def corpus(spark, n: int, skewed: bool):
    cold = F.concat(
        F.lit("h"), (F.col("id") % 10_007).cast("string"), F.lit(".example.com")
    )
    host = (
        F.when(F.col("id") % 10 < 9, F.lit("hot.example.com")).otherwise(cold)
        if skewed
        else cold
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        host.alias("host"),
        F.concat(F.lit("/p/"), F.col("id").cast("string")).alias("path"),
        (F.col("id") % 3).cast("int").alias("n_params"),
    )


def best_of(fn, reps: int) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="host-skew-probe")
    # warm-up: pay codegen once outside both timings
    host_profile(corpus(spark, 10_000, True)).write.format("noop").mode(
        "overwrite"
    ).save()
    # materialize both corpora so the timed section is host_profile over
    # a parquet scan, not the row-generation expressions (the uniform
    # corpus pays a per-row concat the skewed one mostly skips — first
    # probe version mistook that gen-cost delta for a skew effect)
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="host_skew_")
    try:
        corpus(spark, n, False).write.parquet(tmp + "/uniform")
        corpus(spark, n, True).write.parquet(tmp + "/skewed")
        uni_df = spark.read.parquet(tmp + "/uniform")
        skw_df = spark.read.parquet(tmp + "/skewed")
        uniform = best_of(lambda: host_profile(uni_df), reps)
        skewed = best_of(lambda: host_profile(skw_df), reps)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "host_profile_skew_ratio",
                "n_rows": n,
                "uniform_sec": uniform,
                "skewed_sec": skewed,
                "ratio": round(skewed / uniform, 3),
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
