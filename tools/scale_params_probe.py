"""Measure the two fixed-parameter superlinear bench ops at 10x data
with parameters scaled the way a real 10x deployment would scale them.

bench.py pins num_planes/n_cells as SQL-oracle literals, so at sf1 the
bucket/cell population grows 10x and candidate volume (~Σ|bucket|²)
grows ~100x — real behavior of a mis-sized config, not a plan defect.
The scale rule (SCALE.md): buckets/cells grow with the corpus so the
expected bucket size stays constant — +log2(growth) hyperplanes,
cells ∝ N.  This probe times fixed vs scaled parameters at sf0.1 and
sf1 and prints one JSON line for SCALE.md's table.

Usage: python tools/scale_params_probe.py [sf01_dir] [sf1_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from time_series_databse_engine_spark import get_spark
from time_series_databse_engine_spark.operators import similarity as sim_ops


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main():
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scaledata/sf1"
    spark = get_spark(app_name="scale_probe")
    out = {}
    for tag, d in (("sf0.1", sf01), ("sf1", sf1)):
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        emb.count()  # warm file listing
        for planes, label in ((4, "fixed"), (8, "scaled")):
            if tag == "sf0.1" and label == "scaled":
                continue
            t = timed(
                lambda: sim_ops.cosine_near_dup_lsh(
                    emb, threshold=0.4, num_planes=planes, dim=64
                ).write.format("noop").mode("overwrite").save()
            )
            out[f"near_dup_lsh_{tag}_{label}_p{planes}"] = t
        for cells, label in ((16, "fixed"), (160, "scaled")):
            if tag == "sf0.1" and label == "scaled":
                continue
            t = timed(
                lambda: sim_ops.semantic_dedup(
                    emb, threshold=0.3, n_cells=cells
                ).write.format("noop").mode("overwrite").save()
            )
            out[f"semantic_dedup_{tag}_{label}_c{cells}"] = t
    print(json.dumps(out))


if __name__ == "__main__":
    main()
