"""Measure the corpus-derived LSH banding rule's cost/benefit
(VERDICT r6 "Next round" #6): wall-clock AND candidate counts for the
fixed base banding (4 bands x 2 rows, 8 hashes) vs the rule's derived
config at a given SF, each in THIS fresh process (no in-suite position
tax — the SCALE.md session-state lesson).

The timed pipeline is what banding feeds in every dedup-family entry:
minhash_signatures -> lsh_candidate_pairs -> exact-verify join
(jaccard on the candidate pairs) -> count.

Usage:  python tools/banding_cost_probe.py <sf_dir> base|derived
Prints one JSON line: {"sf": ..., "config": ..., "bands": B, "rows": R,
"n_docs": N, "candidates": C, "verified": V, "sec": S}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_databse_engine_spark import get_spark
from time_series_databse_engine_spark.operators import dedup


def main():
    sf_dir = sys.argv[1]
    mode = sys.argv[2]
    spark = get_spark(app_name=f"banding-probe-{mode}")
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    n_docs = docs.count()
    if mode == "base":
        p = {"num_hashes": 8, "bands": 4, "rows_per_band": 2}
    else:
        p = dedup.lsh_params_for(n_docs)

    # warm-up: same pipeline at the smallest SF pays JVM codegen +
    # Python-worker spawn outside the timing (the bench.py discipline)
    warm = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ws = dedup.minhash_signatures(warm, num_hashes=p["num_hashes"], shingle_n=3)
    dedup.lsh_candidate_pairs(
        ws, bands=p["bands"], rows_per_band=p["rows_per_band"]
    ).count()

    t0 = time.perf_counter()
    sigs = dedup.minhash_signatures(docs, num_hashes=p["num_hashes"], shingle_n=3)
    pairs = dedup.lsh_candidate_pairs(
        sigs, bands=p["bands"], rows_per_band=p["rows_per_band"]
    )
    cands = pairs.count()
    # exact-verify stage: the shingle-jaccard join the candidates feed —
    # this is where chance collisions burn real work
    sh = docs.select("doc_id", dedup.shingle_array(3).alias("sh"))
    verified = (
        pairs.join(
            sh.select(F.col("doc_id").alias("id1"), F.col("sh").alias("s1")), "id1"
        )
        .join(
            sh.select(F.col("doc_id").alias("id2"), F.col("sh").alias("s2")), "id2"
        )
        .withColumn(
            "j",
            F.size(F.array_intersect("s1", "s2"))
            / F.size(F.array_union("s1", "s2")),
        )
        .filter(F.col("j") >= 0.7)
        .count()
    )
    sec = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "sf": sf_dir,
                "config": mode,
                "bands": p["bands"],
                "rows": p["rows_per_band"],
                "n_docs": n_docs,
                "candidates": cands,
                "verified": verified,
                "sec": round(sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
