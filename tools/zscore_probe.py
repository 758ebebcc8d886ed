"""Root-cause probe for the zscore_anomaly bench drift (VERDICT r4 #4 /
r5 #6): r3 recorded 1.55 s, r4/r5 ~2.2-2.3 s at sf0.1 with no code or
plan change.  Hypothesis: suite-level scheduler/GC contention, not the
query.  Method: same session settings as bench.py; time the query N
times in a FRESH session (isolated), then run a 20-query warm-up drawn
from the bench headline list and time it again N times (in-suite
conditions).  Prints one JSON line with both distributions.

    python tools/zscore_probe.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from time_series_databse_engine_spark import get_spark


def timed_runs(fn, n):
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()
    qs = entry_mod.queries()
    z = lambda: qs["zscore_anomaly"](spark, sf_dir)

    isolated = timed_runs(z, n)

    warmup = [
        "range_scan", "downsample_1h", "metric_stats", "pricing_summary",
        "revenue_by_nation", "moving_avg", "asof_join", "sessionize",
        "dedup_exact", "minhash_lsh", "cosine_topk", "text_stats",
        "winnow_fingerprint", "doc_chunks", "quality_score", "ohlc_1h",
        "counter_rate_1h", "repetition_stats", "tfidf_top_terms",
        "contamination",
    ]
    for name in warmup:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    in_suite = timed_runs(z, n)
    print(json.dumps({
        "sf": sf_dir,
        "isolated": isolated,
        "after_20_query_warmup": in_suite,
        "isolated_min": min(isolated),
        "in_suite_min": min(in_suite),
    }))


if __name__ == "__main__":
    main()
