"""Property-based tests (hypothesis): storage roundtrip and operator
invariants over randomized inputs — including the t=0 timestamp the
reference's codec reserves as a sentinel (shard.cpp:36,111) and we
deliberately support (SURVEY.md §1.4)."""

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st

from time_series_databse_engine_spark import TimeSeriesStore
from time_series_databse_engine_spark.operators.dedup import jaccard_pairs

point = st.tuples(
    st.sampled_from(["a", "b"]),
    st.integers(min_value=0, max_value=10 * 3_600_000),  # includes t=0
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)

fast = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(pts=st.lists(point, min_size=1, max_size=30, unique_by=lambda p: (p[0], p[1])))
@fast
def test_store_roundtrip_lossless(spark, pts):
    d = tempfile.mkdtemp()
    try:
        store = TimeSeriesStore(spark, d + "/p")
        df = spark.createDataFrame(pts, "metric string, ts_ms long, value double")
        store.ingest(df, target_partitions=2)
        lo = min(p[1] for p in pts)
        hi = max(p[1] for p in pts)
        out = sorted(
            (r.metric, r.ts_ms, r.value)
            for r in store.query_range(lo, hi).collect()
        )
        assert out == sorted((m, t, float(v)) for m, t, v in pts)
        # inclusive-bound invariant: shrinking either bound by 1 drops
        # exactly the points at that bound
        inner = store.query_range(lo + 1, hi).count()
        n_at_lo = sum(1 for p in pts if p[1] == lo)
        assert inner == len(pts) - n_at_lo
    finally:
        shutil.rmtree(d)


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=20).filter(str.strip),
        min_size=2,
        max_size=6,
    )
)
@fast
def test_jaccard_pairs_bounded_and_symmetric_free(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = jaccard_pairs(docs, threshold=0.0).collect()
    for r in rows:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.id1 < r.id2  # each pair exactly once


@settings(max_examples=20, deadline=None)
@given(
    lefts=st.lists(st.integers(0, 2000), min_size=1, max_size=12, unique=True),
    rights=st.lists(st.integers(0, 2000), min_size=0, max_size=12, unique=True),
)
def test_asof_nearest_matches_bruteforce(spark, lefts, rights):
    from time_series_databse_engine_spark.operators.asof import asof_join

    left = spark.createDataFrame([("m", t) for t in lefts], "metric string, ts_ms long")
    right = spark.createDataFrame(
        [("m", t, float(t)) for t in rights], "metric string, ts_ms long, value double"
    )
    got = {
        r.ts_ms: r.ts_ms_right
        for r in asof_join(left, right, by=["metric"], direction="nearest").collect()
    }
    for t in lefts:
        if not rights:
            assert got[t] is None
            continue
        best = min(rights, key=lambda r: (abs(r - t), 0 if r <= t else 1))
        assert got[t] == best, (t, sorted(rights))


# non-dyadic floats: states never sit exactly on a 6-dp rounding midpoint,
# so chunk-and-chain op-reordering (1-ulp) can't flip the rounded digit
series_value = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
).filter(lambda v: v * 1e6 != round(v * 1e6))


@given(
    vals=st.lists(series_value, min_size=1, max_size=40),
    alpha=st.sampled_from([0.1, 0.3, 0.7]),
    chunk_ms=st.sampled_from([1_000, 3_000, 7_000]),
)
@fast
def test_ewma_chunked_equals_sequential_property(spark, vals, alpha, chunk_ms):
    """Chunk-and-chain EWMA equals the sequential fold after rounding for
    arbitrary series lengths, alphas, and chunk geometries (including
    chunks of 1 row and single-chunk series)."""
    from time_series_databse_engine_spark.operators.timeseries import ewma, ewma_chunked

    rows = [("m", i * 1_000, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    seq = ewma(df, "metric", alpha=alpha).orderBy("ts_ms").collect()
    chk = ewma_chunked(df, "metric", alpha=alpha, chunk_ms=chunk_ms).orderBy("ts_ms").collect()
    assert seq == chk


@given(
    vals=st.lists(series_value, min_size=1, max_size=25),
    step=st.sampled_from([500, 1_000, 2_500]),
)
@fast
def test_resample_expr_equals_pandas_property(spark, vals, step):
    """JVM-expression resample equals the np.interp form on arbitrary
    irregular series and grid steps (clamps, interior lerp, on-sample
    grid points)."""
    from time_series_databse_engine_spark.operators.timeseries import (
        resample_interpolate,
        resample_interpolate_expr,
    )

    # strictly increasing irregular timestamps
    rows = [("m", 137 + i * i * 100, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "metric string, ts_ms long, value double")
    a = resample_interpolate(df, "metric", step).orderBy("ts_ms").collect()
    b = resample_interpolate_expr(df, "metric", step).orderBy("ts_ms").collect()
    assert a == b


@given(
    big_keys=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=0, max_size=60),
    key_set=st.sets(st.integers(min_value=-1000, max_value=1000), max_size=20),
)
@fast
def test_bloom_semijoin_equals_semijoin_property(spark, big_keys, key_set):
    """∀ inputs (duplicates, negatives, empties): Bloom-prefiltered semi
    join ≡ plain semi join — no false negatives ever, false positives
    always scrubbed."""
    from time_series_databse_engine_spark.operators.skew import bloom_semijoin

    big = spark.createDataFrame(
        [(k, i) for i, k in enumerate(big_keys)] or [(None, None)], "k int, i int"
    ).filter("k is not null")
    keys = spark.createDataFrame([(k,) for k in key_set] or [(None,)], "k int").filter(
        "k is not null"
    )
    plain = sorted((r.k, r.i) for r in big.join(keys, "k", "left_semi").collect())
    bloom = sorted((r.k, r.i) for r in bloom_semijoin(big, keys, "k").collect())
    assert bloom == plain


@given(
    big_rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=6), st.integers(-50, 50)),
        min_size=1,
        max_size=60,
    ),
    salt=st.sampled_from([1, 2, 4, 8]),
)
@fast
def test_salted_join_equals_plain_join_property(spark, big_rows, salt):
    """∀ key distributions and salt widths: scattered join ≡ plain join
    (content-derived salts lose and duplicate nothing)."""
    from time_series_databse_engine_spark.operators.skew import salted_join

    big = spark.createDataFrame(big_rows, "k int, v int")
    small = spark.createDataFrame([(i, f"d{i}") for i in range(5)], "k int, name string")
    plain = sorted((r.k, r.v, r.name) for r in big.join(small, "k").collect())
    salted = sorted(
        (r.k, r.v, r.name) for r in salted_join(big, small, "k", salt=salt).collect()
    )
    assert salted == plain


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=2, max_size=80
    ),
    n_bins=st.sampled_from([2, 4, 10]),
)
@fast
def test_equidepth_bins_invariants_property(spark, vals, n_bins):
    """∀ value distributions: every row keeps exactly one bin in
    [1, n_bins], bins are monotone in the value, and no row is lost."""
    from time_series_databse_engine_spark.operators.sampling import equidepth_bins

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id int, x double"
    )
    out = equidepth_bins(df, "x", n_bins=n_bins).collect()
    assert len(out) == len(vals)
    assert all(1 <= r.bin <= n_bins for r in out)
    by_val = sorted(out, key=lambda r: (r.x, r.id))
    assert all(a.bin <= b.bin for a, b in zip(by_val, by_val[1:]))


# --- round-8 operators: purge invariants vs a Python reference ----------

_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)


def _py_purge(docs: list[tuple[int, str]], n: int):
    """Reference implementation of purge_dup_spans semantics."""
    toks = {i: t.split(" ") for i, t in docs}
    # window -> min doc id containing it
    owner: dict[tuple, int] = {}
    for i, ts in toks.items():
        for p in range(0, max(0, len(ts) - n + 1)):
            w = tuple(ts[p : p + n])
            owner[w] = min(owner.get(w, i), i)
    sharers: dict[tuple, set] = {}
    for i, ts in toks.items():
        for p in range(0, max(0, len(ts) - n + 1)):
            sharers.setdefault(tuple(ts[p : p + n]), set()).add(i)
    out = {}
    for i, ts in toks.items():
        covered = [False] * len(ts)
        for p in range(0, max(0, len(ts) - n + 1)):
            w = tuple(ts[p : p + n])
            if len(sharers[w]) > 1 and owner[w] != i:
                for j in range(p, p + n):
                    covered[j] = True
        kept = [t for t, c in zip(ts, covered) if not c]
        out[i] = (" ".join(kept), sum(covered), len(ts) - sum(covered))
    return out


@given(texts=st.lists(_doc, min_size=1, max_size=5))
@fast
def test_purge_dup_spans_matches_python_reference(spark, texts):
    from time_series_databse_engine_spark.operators.dedup import purge_dup_spans

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_removed, r.n_kept)
        for r in purge_dup_spans(df, n=3).collect()
    }
    assert got == _py_purge(docs, 3)


@given(
    ref_vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=20,
        max_size=60,
    ),
    cur_vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=20,
        max_size=60,
    ),
)
@fast
def test_psi_nonnegative_and_counts_conserved(spark, ref_vals, cur_vals):
    """PSI is a sum of (p−q)·ln(p/q) terms, each ≥ 0 — the monitor can
    never report negative drift; bin counts conserve both snapshots."""
    from time_series_databse_engine_spark.operators.profile import psi_drift

    ref = spark.createDataFrame([(v,) for v in ref_vals], "v double")
    cur = spark.createDataFrame([(v,) for v in cur_vals], "v double")
    rows = psi_drift(ref, cur, "v", n_bins=4).collect()
    assert rows and all(r.psi >= -1e-9 for r in rows)
    assert sum(r.ref_cnt for r in rows) == len(ref_vals)
    assert sum(r.cur_cnt for r in rows) == len(cur_vals)


@given(
    edges=st.sets(
        st.tuples(st.integers(0, 17), st.integers(0, 17)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=40,
    )
)
@fast
def test_triangle_count_matches_bruteforce_property(spark, edges):
    """Degree-ordered wedge counting == brute-force triangle enumeration
    on random graphs, node for node, including degrees and lcc."""
    from itertools import combinations

    from time_series_databse_engine_spark.operators.graph import triangle_count

    und = sorted({(min(a, b), max(a, b)) for a, b in edges})
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    truth = {
        v: sum(1 for x, y in combinations(sorted(nbrs), 2) if y in adj[x])
        for v, nbrs in adj.items()
    }
    df = spark.createDataFrame(und, "id1 int, id2 int")
    out = {r.id: r for r in triangle_count(df).collect()}
    assert set(out) == set(truth)
    for v, t in truth.items():
        assert out[v].triangles == t, (v, und)
        assert out[v].degree == len(adj[v])
        d = len(adj[v])
        want = round(2.0 * t / (d * (d - 1)), 6) if d >= 2 else 0.0
        assert out[v].lcc == want


@given(
    edges=st.sets(
        st.tuples(st.integers(0, 13), st.integers(0, 13)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=30,
    )
)
@fast
def test_adamic_adar_matches_bruteforce_property(spark, edges):
    """AA scores == brute-force over all non-edges with >=1 common
    neighbor (k large enough to keep everything)."""
    import math
    from itertools import combinations

    from time_series_databse_engine_spark.operators.graph import adamic_adar

    und = sorted({(min(a, b), max(a, b)) for a, b in edges})
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    truth = {}
    for v, w in combinations(sorted(adj), 2):
        if w in adj[v]:
            continue
        common = adj[v] & adj[w]
        if common:
            truth[(v, w)] = (
                round(sum(1.0 / math.log(len(adj[u])) for u in common), 6),
                len(common),
            )
    df = spark.createDataFrame(und, "id1 int, id2 int")
    out = {(r.v, r.w): (r.aa_score, r.common_neighbors)
           for r in adamic_adar(df, k=10_000).collect()}
    assert out == truth, und
