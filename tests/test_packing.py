"""Sequence packing invariants: capacity, coverage, determinism."""

from pyspark.sql import functions as F

from time_series_databse_engine_spark.operators.packing import pack_sequences


def _docs(spark):
    rows = [(i, "w " * ((i * 37) % 300 + 1)) for i in range(120)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_capacity_and_coverage(spark):
    df = _docs(spark)
    out = pack_sequences(df, max_tokens=256, num_groups=4).cache()
    # every doc appears exactly once
    assert out.count() == 120
    assert out.select("doc_id").distinct().count() == 120
    # no bin over budget, except singleton bins holding one oversized doc
    fills = (
        out.groupBy("pack_group", "bin_id")
        .agg(F.sum("n_tokens").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    for r in fills:
        assert r.fill <= 256 or r.n == 1
    # bin_fill column equals the bin's actual fill
    bad = (
        out.groupBy("pack_group", "bin_id", "bin_fill")
        .agg(F.sum("n_tokens").alias("actual"))
        .filter(F.col("bin_fill") != F.col("actual"))
        .count()
    )
    assert bad == 0
    out.unpersist()


def test_oversized_doc_gets_own_bin(spark):
    rows = [(1, "w " * 600), (2, "w " * 10), (3, "w " * 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, max_tokens=100, num_groups=1).collect()
    by_doc = {r.doc_id: r for r in out}
    big_bin = by_doc[1].bin_id
    assert {r.bin_id for r in out if r.doc_id != 1} != {big_bin}
    # the two small docs share one bin (10+10 <= 100)
    assert by_doc[2].bin_id == by_doc[3].bin_id


def test_packing_deterministic(spark):
    df = _docs(spark)
    a = sorted(map(tuple, pack_sequences(df, 256, num_groups=4).collect()))
    b = sorted(map(tuple, pack_sequences(df, 256, num_groups=4).collect()))
    assert a == b


def test_segment_tree_first_fit_matches_linear_scan():
    """The round-10 O(n log n) segment-tree placement must be
    BIT-IDENTICAL to the textbook linear first-fit scan it replaced
    (the recursive-CTE oracle replays that scan step by step): 300
    random (sizes, budget) instances, including oversize docs and
    empty input, compared placement-by-placement.  Pure-Python — this
    pins the algorithm, the Spark plumbing is pinned above."""
    import random

    def linear_first_fit(ts, mx):
        fills, out = [], []
        for t in ts:
            placed = None
            for b, f in enumerate(fills):
                if f + t <= mx:
                    placed = b
                    fills[b] = f + t
                    break
            if placed is None:
                placed = len(fills)
                fills.append(t)
            out.append(placed)
        return out, fills

    def seg_first_fit(ts, mx):
        # mirrors packing.pack_sequences' inner pack() placement loop
        n = len(ts)
        size = 1
        while size < n + 1:
            size <<= 1
        tree = [0] * (2 * size)
        fills, out = [], []

        def upd(p, v):
            i = p + size
            tree[i] = v
            i >>= 1
            while i:
                tree[i] = min(tree[2 * i], tree[2 * i + 1])
                i >>= 1

        for t in ts:
            lim = mx - t
            if lim < 0 or tree[1] > lim:
                placed = len(fills)
                fills.append(0)
            else:
                i = 1
                while i < size:
                    i = 2 * i if tree[2 * i] <= lim else 2 * i + 1
                placed = i - size
                if placed == len(fills):
                    fills.append(0)
            fills[placed] += t
            upd(placed, fills[placed])
            out.append(placed)
        return out, fills

    rng = random.Random(7)
    for _ in range(300):
        n = rng.randint(0, 400)
        mx = rng.randint(1, 100)
        ts = sorted(
            (rng.randint(1, int(mx * 1.5)) for _ in range(n)), reverse=True
        )
        assert linear_first_fit(ts, mx) == seg_first_fit(ts, mx)
