"""Regenerate the committed PCA basis fixture.

Trains similarity.pca_train (k=8) on the sf0.01 embeddings table and
writes the mean + components as exact-repr float literals to
time_series_databse_engine_spark/fixtures/pca_basis.py.  The committed
basis is what makes the `pca_project` entry ORACLE-BACKED: projection
onto a FIXED trained basis is the production shape (train once, apply
many), and with the basis pinned as literals the projection arithmetic
is plain column math both engines evaluate identically — same
left-associated fp64 sum order, same rounding — so the DuckDB hash gate
applies to an operator whose training step itself is not
SQL-expressible.

Usage:  python tools/gen_pca_basis.py [sf_dir]
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
    "pca_basis.py",
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="gen-pca-basis")
    emb = spark.read.parquet(sf_dir + "/embeddings.parquet")
    mean, comps, ev = sim.pca_train(emb, k=8)
    with open(OUT, "w") as fh:
        fh.write(
            '"""PCA basis trained once on %s (k=8, dim=%d) — regenerate\n'
            "with tools/gen_pca_basis.py.  repr() literals round-trip every\n"
            "float64 bit, so Spark and the SQL oracle see the identical\n"
            'basis."""\n\n' % (sf_dir, len(mean))
        )
        fh.write("TRAINED_ON = %r\n" % sf_dir)
        fh.write("K = %d\nDIM = %d\n\n" % (len(comps), len(mean)))
        fh.write("MEAN = [\n")
        for v in mean:
            fh.write("    %r,\n" % float(v))
        fh.write("]\n\nCOMPS = [\n")
        for row in comps:
            fh.write("    [%s],\n" % ", ".join(repr(float(v)) for v in row))
        fh.write("]\n\nEXPLAINED_VAR = [%s]\n" % ", ".join(
            repr(float(v)) for v in ev
        ))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
