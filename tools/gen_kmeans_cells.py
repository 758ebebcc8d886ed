"""Regenerate the committed k-means cell codebook fixture.

Trains similarity.kmeans_lloyd (2 rounds; k from argv, default 32) on
the sf0.1 embeddings table and writes the centroids as exact-repr float
literals to time_series_databse_engine_spark/fixtures/kmeans_cells.py.
The
committed codebook is what makes the `semantic_dedup_served` entry
ORACLE-BACKED with a serving-shaped plan (VERDICT r7 #4): at 100 TB you
train cluster centroids ONCE offline and pin them — re-running Lloyd
inside every dedup query (the `semantic_dedup_trained` lifecycle demo)
costs ~34 shuffles of training lineage per run.  With the centroids
pinned as literals the cell assignment is plain broadcast column math
both engines evaluate identically (the fold sums sequentially; so does
DuckDB's list_dot_product), so the hash gate applies to the full
assignment + within-cell drop rule.

Centroid components are kmeans_lloyd's 6-dp rounded means, so the
literals are short AND bit-exact round-trips.

SIZING (VERDICT r9 #1): the pinned k must be chosen for the LARGEST
corpus the pin will serve, or within-cell pair work turns quadratic —
the r9 sf1 record measured a k=8 pin at 10x data costing 8.6x wall.
k=32 holds the mean cell at 2000/32=62 rows on the sf0.1 bench corpus
and 625 at sf1 (inside semantic_dedup's 4x-of-128 warn bound at sf0.1,
warn-but-run at sf1, raise at 16x); auto_n_cells(corpus) is the
production formula.

Usage:  python tools/gen_kmeans_cells.py [sf_dir] [k]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from time_series_databse_engine_spark import get_spark
from time_series_databse_engine_spark.operators import similarity as sim

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "time_series_databse_engine_spark",
    "fixtures",
    "kmeans_cells.py",
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(app_name="gen-kmeans-cells")
    emb = spark.read.parquet(sf_dir + "/embeddings.parquet")
    out = sim.kmeans_lloyd(emb, k=k, iters=2).collect()
    cents = {}
    for r in out:
        cents.setdefault(int(r.cluster_id), {})[int(r.dim)] = float(r.c)
    cells = [
        (cid, [cents[cid][d] for d in sorted(cents[cid])]) for cid in sorted(cents)
    ]
    with open(OUT, "w") as fh:
        fh.write(
            '"""k-means cell codebook trained once on %s (k=%d, 2 Lloyd\n'
            "rounds, 6-dp quantized means) — regenerate with\n"
            "tools/gen_kmeans_cells.py.  repr() literals round-trip every\n"
            "float64 bit, so Spark and the SQL oracle assign identical\n"
            "cells.  k is sized for the largest corpus the pin serves\n"
            '(VERDICT r9 #1) — see the module docstring of the generator."""\n\n'
            % (sf_dir, len(cells))
        )
        fh.write("TRAINED_ON = %r\nK = %d\nDIM = %d\n\n" % (sf_dir, len(cells), len(cells[0][1])))
        fh.write("# [(cell_id, [centroid components]), ...]\nCELLS = [\n")
        for cid, c in cells:
            fh.write("    (%d, [\n" % cid)
            for x in c:
                fh.write("        %r,\n" % x)
            fh.write("    ]),\n")
        fh.write("]\n")
    print("wrote", OUT, "k=%d dim=%d" % (len(cells), len(cells[0][1])))


if __name__ == "__main__":
    main()
