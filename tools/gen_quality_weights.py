"""Train and pin the hashed-BoW quality-classifier weights.

The model-based quality filter (GPT-3 / LLaMA pipelines: a fastText-style
linear classifier scores every crawl page; Joulin et al. 2016) splits
into train-once and serve-everywhere halves exactly like the kmeans
codebook (tools/gen_kmeans_cells.py): this tool is the offline training
half, `text.classifier_score` the corpus-scale serving half.

Labels are self-supervised from the repo's own heuristic: documents in
the TOP third of `quality_score` are positives, the BOTTOM third
negatives, the middle third dropped — the classifier then generalizes
the heuristic onto 64-dim hashed features, which is the standard
bootstrap when no hand-labeled page set exists (in production you'd
label positives from a reference corpus instead; the serving plan is
identical).

Training is DETERMINISTIC: features collect to a |docs| x 64 float64
matrix (the one collect, training-sample-sized by design — at 100 TB
you train on a deterministic_sample), full-batch gradient descent with
fixed iterations/learning rate/L2, no randomness anywhere, and weights
quantize to 6 dp so the committed repr() literals round-trip bit-exactly
into both Spark and the SQL oracle.

Usage:  python tools/gen_quality_weights.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from time_series_databse_engine_spark import get_spark
from time_series_databse_engine_spark.operators import text as text_ops

DIM = 64
ITERS = 500
LR = 1.0
L2 = 1e-3

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "time_series_databse_engine_spark",
    "fixtures",
    "quality_weights.py",
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="gen-quality-weights")
    docs = spark.read.parquet(sf_dir + "/documents.parquet")

    q = {r["doc_id"]: r["quality"] for r in text_ops.quality_score(docs).collect()}
    lo, hi = np.quantile(np.array(sorted(q.values())), [1 / 3, 2 / 3])
    labels = {i: (1.0 if v >= hi else 0.0) for i, v in q.items() if v >= hi or v <= lo}

    feats = text_ops.hashing_vectorize(docs, dim=DIM).collect()
    ids = sorted(labels)
    row_of = {d: j for j, d in enumerate(ids)}
    X = np.zeros((len(ids), DIM))
    for r in feats:
        j = row_of.get(r["doc_id"])
        if j is not None:
            X[j, r["bucket"]] = r["weight"]
    y = np.array([labels[d] for d in ids])

    w = np.zeros(DIM)
    b = 0.0
    for _ in range(ITERS):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        g = p - y
        w -= LR * (X.T @ g / len(y) + L2 * w)
        b -= LR * float(g.mean())
    p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
    acc = float(((p >= 0.5) == (y == 1.0)).mean())

    w = [round(float(x), 6) for x in w]
    b = round(float(b), 6)
    with open(OUT, "w") as fh:
        fh.write(
            '"""Hashed-BoW quality-classifier weights trained once on %s\n'
            "(64-dim hashing trick, logistic regression, %d full-batch GD\n"
            "steps, train accuracy %.3f vs the quality_score-derived\n"
            "labels) — regenerate with tools/gen_quality_weights.py.\n"
            "repr() literals round-trip bit-exactly, so Spark and the SQL\n"
            'oracle score identically."""\n\n' % (sf_dir, ITERS, acc)
        )
        fh.write("TRAINED_ON = %r\nDIM = %d\nBIAS = %r\n\n" % (sf_dir, DIM, b))
        fh.write("WEIGHTS = [\n")
        for x in w:
            fh.write("    %r,\n" % x)
        fh.write("]\n")
    print("wrote", OUT, "dim=%d bias=%r train_acc=%.3f" % (DIM, b, acc))


if __name__ == "__main__":
    main()
