"""Plateau-vs-escalation control probe for minhash_containment (VERDICT
r11 "Next round" #2): one table that runs BOTH parameterizations at the
SAME two scales, pinning the claim that the suite's e_hi = 1.21 interval
is the DESIGNED lsh_params_for rows-per-band escalation, not a
super-linear operator.

Cells (sf1 = 50k docs, sf3 = 150k docs):

* sf1, (16 hashes, 4 bands x 4 rows)  — lsh_params_for's sf1 output,
  which IS the "pinned" config (pinned == escalated at the low scale);
* sf3, pinned (16, 4x4)               — parameters frozen at the sf1
  plateau: a linear op should show e ~= 1 here, with the chance-
  collision candidate blow-up quantified;
* sf3, escalated (24, 4x6)            — lsh_params_for's sf3 output:
  1.5x hash work buying the candidate-count reduction.

Per cell: wall time of minhash_containment_estimates(...).count()
(min of reps 2-3 of 3 — rep-1 warms the JVM/IO, min damps host bursts)
and the candidate-pair count from the same banding.
e = log(t3/t1) / log(3).

Run idle (the record_bench discipline):  python tools/probe_minhash_plateau.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/repo/scaledata/sf1"
SF3 = "/root/repo/scaledata/sf3"


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from time_series_databse_engine_spark.operators import dedup as d
    from time_series_databse_engine_spark.sources import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    cells = [
        ("sf1", SF1, "plateau(=escalated)", dict(num_hashes=16, bands=4, rows_per_band=4)),
        ("sf3", SF3, "pinned-at-sf1-plateau", dict(num_hashes=16, bands=4, rows_per_band=4)),
        ("sf3", SF3, "escalated(lsh_params_for)", dict(num_hashes=24, bands=4, rows_per_band=6)),
    ]
    out = []
    for sf, path, label, p in cells:
        docs = load_table(spark, path, "documents")
        n_docs = docs.count()
        # sanity: escalated config matches the rule's output at this scale
        rule = d.lsh_params_for(n_docs)
        times = []
        for rep in range(3):
            t0 = time.time()
            n_rows = d.minhash_containment_estimates(docs, **p).count()
            times.append(round(time.time() - t0, 3))
        t0 = time.time()
        n_cand = d.lsh_candidate_pairs(
            d.minhash_signatures(docs, p["num_hashes"]),
            p["bands"],
            p["rows_per_band"],
        ).count()
        t_cand = round(time.time() - t0, 3)
        out.append(
            dict(
                sf=sf,
                label=label,
                params=p,
                rule_params=rule,
                n_docs=n_docs,
                walls=times,
                wall_min=min(times[1:]),
                n_out_rows=n_rows,
                n_candidates=n_cand,
                wall_cand=t_cand,
            )
        )
        print(json.dumps(out[-1]))

    t1 = out[0]["wall_min"]
    e_pinned = math.log(out[1]["wall_min"] / t1) / math.log(3)
    e_esc = math.log(out[2]["wall_min"] / t1) / math.log(3)
    summary = dict(
        e_pinned=round(e_pinned, 3),
        e_escalated=round(e_esc, 3),
        cand_blowup_pinned=round(out[1]["n_candidates"] / out[0]["n_candidates"], 2),
        cand_ratio_escalated=round(out[2]["n_candidates"] / out[0]["n_candidates"], 2),
        loadavg_end=os.getloadavg(),
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
