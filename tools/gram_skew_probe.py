"""Planted hot-gram wall-clock proof for purge_dup_spans (VERDICT r8 #3).

Round 9 replaced purge_dup_spans' gram-partitioned WINDOW (min/max over
``Window.partitionBy(h0..h7)``) with a per-gram ``groupBy`` partial
aggregate joined back.  The window shape was a named scale-killer:
WindowExec gets no map-side combine, so a boilerplate gram present in
every doc shuffles EVERY occurrence into one sorted partition on one
task.  This probe measures the fix the way host_skew_probe.py measures
host_profile: two corpora of identical row/token count, one with
uniform grams, one where ~90% of all window positions share ONE gram.

  - uniform: every doc is 24 unique tokens (``d{i}t{j}``) — every gram
    key appears once.
  - skewed:  90% of docs are the SAME 24-token boilerplate (think a
    license header) — with n=8 that is 17 window starts per doc, all
    17 shared by 0.9*N docs; the other 10% stay unique.

Under the old window shape the skewed run funnels ~90% of all exploded
positions through single-key partitions (17 of them); under the
groupBy+join shape the hot grams collapse map-side to one
(min, max) row per partition before the exchange, and AQE's skew-join
splitting bounds the join-back task, so skewed/uniform should stay
~1x (the skewed corpus even does LESS token-hash work: its strings
are shorter and repeat).

    python tools/gram_skew_probe.py [n_docs] [n_reps]

Prints one JSON line: per-condition best-of-N wall seconds + ratio +
``max_task_shuffle_share`` — the worst per-task share of any
shuffle-read stage's total shuffle-read bytes during the SKEWED run
(Spark status REST API, ``taskSummary?quantiles=1.0`` over the stages
of the last rep), with the stage's task count for the 1/N ideal.  A
share near 1/num_tasks proves no single task absorbed the hot grams;
the old WindowExec shape put ~0.9 of one stage's bytes on one task.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_databse_engine_spark import get_spark
from time_series_databse_engine_spark.operators.dedup import purge_dup_spans

BOILER = " ".join(f"boiler{j}" for j in range(24))


def corpus(spark, n: int, skewed: bool):
    uniq = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"d"), F.col("id").cast("string"), F.lit(f"t{j}"))
            for j in range(24)
        ],
    )
    text = (
        F.when(F.col("id") % 10 < 9, F.lit(BOILER)).otherwise(uniq)
        if skewed
        else uniq
    )
    return spark.range(n).select(F.col("id").alias("doc_id"), text.alias("text"))


def best_of(fn, reps: int) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 3)


def _rest(spark, suffix: str):
    app_id = spark.sparkContext.applicationId
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/{suffix}", timeout=10
    ) as resp:
        return json.loads(resp.read())


def max_task_shuffle_share(spark, since_stage: int) -> dict:
    """Worst per-task share of a stage's shuffle-read bytes across all
    shuffle-read stages with stageId > ``since_stage`` (i.e. stages of
    the run being audited).  Uses the status REST API: stage totals
    from /stages, the per-task max from taskSummary at quantile 1.0."""
    worst = {"max_task_shuffle_share": 0.0, "stage_tasks": 0, "stage_id": -1}
    for st in _rest(spark, "stages?status=complete"):
        if st["stageId"] <= since_stage or st.get("shuffleReadBytes", 0) <= 0:
            continue
        summ = _rest(
            spark,
            f"stages/{st['stageId']}/{st['attemptId']}/taskSummary"
            "?quantiles=1.0",
        )
        max_task = summ["shuffleReadMetrics"]["readBytes"][0]
        share = max_task / st["shuffleReadBytes"]
        if share > worst["max_task_shuffle_share"]:
            worst = {
                "max_task_shuffle_share": round(share, 4),
                "stage_tasks": st["numCompleteTasks"],
                "stage_id": st["stageId"],
            }
    return worst


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        app_name="gram-skew-probe",
        # the status REST API (per-task shuffle metrics) needs the UI
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    # warm-up: pay codegen once outside both timings
    purge_dup_spans(corpus(spark, 1_000, True)).write.format("noop").mode(
        "overwrite"
    ).save()
    # materialize both corpora so the timed section is purge over a
    # parquet scan, not the row-generation expressions (host_skew_probe
    # lesson: gen-cost deltas masquerade as skew effects)
    tmp = tempfile.mkdtemp(prefix="gram_skew_")
    try:
        corpus(spark, n, False).write.parquet(tmp + "/uniform")
        corpus(spark, n, True).write.parquet(tmp + "/skewed")
        uni_df = spark.read.parquet(tmp + "/uniform")
        skw_df = spark.read.parquet(tmp + "/skewed")
        uniform = best_of(lambda: purge_dup_spans(uni_df), reps)
        stages = _rest(spark, "stages?status=complete")
        last_stage = max((s["stageId"] for s in stages), default=-1)
        skewed = best_of(lambda: purge_dup_spans(skw_df), reps)
        skew_evidence = max_task_shuffle_share(spark, last_stage)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "purge_gram_skew_ratio",
                "n_docs": n,
                "uniform_sec": uniform,
                "skewed_sec": skewed,
                "ratio": round(skewed / uniform, 3),
                "loadavg_1m": round(os.getloadavg()[0], 2),
                **skew_evidence,
            }
        )
    )


if __name__ == "__main__":
    main()
