"""Column profiler: deterministic HLL vs exact, cross-engine replay."""

import duckdb

from time_series_databse_engine_spark.operators.profile import (
    merge_profiles,
    profile_registers,
    profile_oracle_sql,
    profile_table,
    profile_table_exact,
)


def test_profile_hll_matches_duckdb_replay_and_bounds_error(spark, sf_dir):
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = {r["column"]: r for r in profile_table(df, cols).collect()}
    exact = {r["column"]: r for r in profile_table_exact(df, cols).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_dir}/orders.parquet')"
    )
    ora = con.execute(profile_oracle_sql("orders", cols)).fetchall()
    # bit-for-bit engine/oracle agreement on the ESTIMATE
    for c, n, nulls, est, mn, mx in ora:
        r = out[c]
        assert (r.n, r.nulls, r.n_distinct_est, r.min_s, r.max_s) == (
            n, nulls, est, mn, mx
        )
    # estimate within 6% of exact; n/nulls/min/max identical to exact
    for c in cols:
        assert out[c].n == exact[c].n and out[c].nulls == exact[c].nulls
        assert (out[c].min_s, out[c].max_s) == (exact[c].min_s, exact[c].max_s)
        e = exact[c].n_distinct
        assert abs(out[c].n_distinct_est - e) <= max(0.06 * e, 1)


def test_profile_handles_nulls_and_constant_columns(spark):
    rows = [(1, None, "x"), (2, None, "x"), (3, None, "x"), (None, None, "x")]
    df = spark.createDataFrame(rows, "a int, b int, c string")
    out = {r["column"]: r for r in profile_table(df, ["a", "b", "c"]).collect()}
    assert out["b"].n == 4 and out["b"].nulls == 4 and out["b"].n_distinct_est == 0
    assert out["a"].nulls == 1 and out["a"].n_distinct_est == 3
    assert out["c"].n_distinct_est == 1 and out["c"].min_s == "x"


def test_incremental_registers_merge_to_full_profile(spark, sf_dir):
    """Registers built per disjoint increment, unioned and merged, equal
    the single-scan profile EXACTLY (HLL max-merge + count sums + bound
    min/max are all semigroups) — including a 3-way split."""
    from pyspark.sql import functions as F

    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    full = sorted(
        tuple(r) for r in profile_table(df, cols).collect()
    )
    parts = [df.filter(F.col("o_orderkey") % 3 == k) for k in range(3)]
    regs = profile_registers(parts[0], cols)
    for p in parts[1:]:
        regs = regs.unionByName(profile_registers(p, cols))
    merged = sorted(tuple(r) for r in merge_profiles(regs).collect())
    assert merged == full


def test_production_xxhash64_profiler_same_plan_sane_estimates(spark, sf_dir):
    """The xxhash64 production hash keeps exact counts identical (n,
    nulls, min/max don't touch the hash), keeps the no-Expand plan, and
    estimates distincts within standard HLL error (~1.04/sqrt(4096) ≈
    1.6%, asserted at 6%) of exact — it just can't be replayed in SQL,
    which is why the md5 twin exists for the oracle gate."""
    from time_series_databse_engine_spark.plans import simple_plan

    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    fast = {r["column"]: r for r in profile_table(df, cols, hash_fn="xxhash64").collect()}
    slow = {r["column"]: r for r in profile_table(df, cols).collect()}
    exact = {
        c: df.filter(f"{c} IS NOT NULL").select(c).distinct().count() for c in cols
    }
    for c in cols:
        assert fast[c].n == slow[c].n and fast[c].nulls == slow[c].nulls
        assert fast[c].min_s == slow[c].min_s and fast[c].max_s == slow[c].max_s
        rel = abs(fast[c].n_distinct_est - exact[c]) / max(1, exact[c])
        assert rel < 0.06, (c, fast[c].n_distinct_est, exact[c])
    assert "Expand" not in simple_plan(profile_table(df, cols, hash_fn="xxhash64"))


def test_psi_drift_identical_snapshots_zero(spark):
    """p == q in every bin -> every contribution is exactly 0."""
    from time_series_databse_engine_spark.operators.profile import psi_drift

    from pyspark.sql import functions as F

    vals = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    rows = psi_drift(vals, vals, "v", n_bins=10).collect()
    assert len(rows) == 10
    assert all(r.contrib == 0.0 for r in rows)
    assert rows[0].psi == 0.0
    assert sum(r.ref_cnt for r in rows) == 1000


def test_psi_drift_shift_alarms(spark):
    """A +100 location shift on a 0..999 uniform feature empties the
    bottom reference decile and doubles the top one -> PSI far above the
    conventional 0.25 retrain alarm; the emptied current bin stays
    finite via Laplace smoothing."""
    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.operators.profile import psi_drift

    ref = spark.range(1000).select(F.col("id").cast("double").alias("v"))
    cur = spark.range(1000).select((F.col("id") + 100).cast("double").alias("v"))
    rows = {r.bin: r for r in psi_drift(ref, cur, "v", n_bins=10).collect()}
    assert rows[1].cur_cnt == 0 and rows[1].ref_cnt == 100
    import math

    assert all(math.isfinite(r.contrib) for r in rows.values())
    assert rows[1].psi > 0.25
    # psi is the DECIMAL-exact sum of the rounded contributions
    total = round(sum(r.contrib for r in rows.values()), 6)
    assert abs(rows[1].psi - total) < 1e-9


def test_psi_incremental_matches_fused(spark):
    """Mergeable path == fused path bit-for-bit, with the current
    snapshot arriving as three arbitrary increments."""
    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.operators.profile import (
        psi_bin_counts,
        psi_bounds,
        psi_drift,
        psi_from_counts,
    )

    ref = spark.range(900).select(F.col("id").cast("double").alias("v"))
    cur = spark.range(900).select(
        "id", (F.col("id") * 1.3 + 50).alias("v")
    )
    fused = {r.bin: r for r in psi_drift(ref, cur, "v", n_bins=10).collect()}
    bounds = psi_bounds(ref, "v", n_bins=10)
    rc = psi_bin_counts(ref, "v", bounds)
    parts = [cur.where(F.col("id") % 3 == i) for i in range(3)]
    cc = parts[0].transform(lambda d: psi_bin_counts(d, "v", bounds))
    for p in parts[1:]:
        cc = cc.unionByName(psi_bin_counts(p, "v", bounds))
    inc = {r.bin: r for r in psi_from_counts(rc, cc, n_bins=10).collect()}
    assert set(fused) == set(inc)
    for b in fused:
        assert (fused[b].ref_cnt, fused[b].cur_cnt) == (inc[b].ref_cnt, inc[b].cur_cnt)
        assert fused[b].contrib == inc[b].contrib
        assert fused[b].psi == inc[b].psi


def test_psi_drift_categorical_other_fold_and_identity(spark):
    """Top-k + OTHER fold: categories outside the reference's top-k
    merge into bin 0; identical snapshots give psi exactly 0; a
    vanished category alarms."""
    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.operators.profile import (
        psi_drift_categorical,
    )

    # 4 categories: a(50) b(30) c(15) d(5); top_k=2 -> c+d fold to OTHER
    rows = (["a"] * 50 + ["b"] * 30 + ["c"] * 15 + ["d"] * 5)
    ref = spark.createDataFrame([(x,) for x in rows], "cat string")
    same = {r.category: r for r in psi_drift_categorical(ref, ref, "cat", top_k=2).collect()}
    assert set(same) == {"a", "b", "__other__"}
    assert same["__other__"].ref_cnt == 20 and same["__other__"].cur_cnt == 20
    assert all(r.contrib == 0.0 and r.psi == 0.0 for r in same.values())
    assert same["a"].bin == 1 and same["b"].bin == 2 and same["__other__"].bin == 0

    # current snapshot loses category a entirely -> large psi
    cur = spark.createDataFrame([(x,) for x in rows if x != "a"], "cat string")
    shifted = {r.category: r for r in psi_drift_categorical(ref, cur, "cat", top_k=2).collect()}
    assert shifted["a"].cur_cnt == 0
    assert shifted["a"].psi > 0.25


def test_psi_drift_constant_column_collapses_to_one_bin(spark):
    """All 9 boundaries equal the constant -> every row lands in the
    top bin (value >= every boundary), honestly uneven; identical
    snapshots still give psi 0 and full conservation."""
    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.operators.profile import psi_drift

    const = spark.range(500).select(F.lit(7.5).alias("v"))
    rows = psi_drift(const, const, "v", n_bins=10).collect()
    assert len(rows) == 1 and rows[0].bin == 10
    assert rows[0].ref_cnt == 500 and rows[0].cur_cnt == 500
    assert rows[0].psi == 0.0


def test_ks_drift_detects_shift(spark):
    """A mean shift in one key group produces D ~= shift detection with
    the classic threshold; an identical group stays under it.  Values
    verified against scipy-free closed form on a small grid."""
    from time_series_databse_engine_spark.operators.profile import ks_drift

    ref_rows = [("stable", float(v)) for v in range(100)]
    cur_rows = [("stable", float(v)) for v in range(100)]
    ref_rows += [("shifted", float(v)) for v in range(100)]
    cur_rows += [("shifted", float(v) + 50.0) for v in range(100)]
    ref = spark.createDataFrame(ref_rows, "k string, v double")
    cur = spark.createDataFrame(cur_rows, "k string, v double")
    out = {r.k: r for r in ks_drift(ref, cur, "k", "v").collect()}
    assert out["stable"].ks_stat == 0.0 and not out["stable"].drifted
    # 50-unit shift of a 100-wide uniform: D = 0.5 exactly
    assert out["shifted"].ks_stat == 0.5 and out["shifted"].drifted
    assert out["shifted"].n_ref == 100 and out["shifted"].n_cur == 100


def test_ks_drift_nulls_excluded(spark):
    from time_series_databse_engine_spark.operators.profile import ks_drift

    ref = spark.createDataFrame([("a", 1.0), ("a", None)], "k string, v double")
    cur = spark.createDataFrame([("a", 1.0), ("a", None)], "k string, v double")
    r = ks_drift(ref, cur, "k", "v").collect()[0]
    assert r.n_ref == 1 and r.n_cur == 1 and r.ks_stat == 0.0


def test_kanon_suppress_residual_invariant_total(spark):
    """Groups under k collapse into one '*' row; the grand total (rows
    and value mass) is invariant; no surviving group is smaller than k."""
    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.operators.profile import kanon_suppress

    rows = [("u1", "click", 1.0)] * 7 + [("u2", "click", 2.0)] * 2 + [
        ("u3", "buy", 3.0)
    ] * 1
    df = spark.createDataFrame(rows, "user_id string, event_type string, value double")
    out = kanon_suppress(df, ["user_id", "event_type"], k=5, agg_col="value").collect()
    by_key = {(r.user_id, r.event_type): r for r in out}
    assert ("u1", "click") in by_key and by_key[("u1", "click")].n == 7
    # u2 and u3 are suppressed into the single residual
    assert ("u2", "click") not in by_key and ("u3", "buy") not in by_key
    resid = by_key[("*", "*")]
    assert resid.n == 3 and resid.n_groups == 2 and resid.sum_value == 7.0
    assert sum(r.n for r in out) == 10
    assert all(r.n >= 5 or r.user_id == "*" for r in out)

    # no suppressed groups -> no residual row
    out2 = kanon_suppress(df.where(F.col("user_id") == "u1"),
                          ["user_id", "event_type"], k=5, agg_col="value").collect()
    assert len(out2) == 1 and out2[0].user_id == "u1"


def test_mutual_info_independent_and_functional(spark):
    """MI = 0 for independent columns (balanced product design); for a
    functional dependency Y = f(X), MI == H(Y); NMI bounds; NULLs and
    constant columns handled."""
    import math

    from time_series_databse_engine_spark.operators.profile import mutual_info

    # balanced independent design: every (x, y) cell equally likely
    rows = [(f"x{i % 4}", f"y{j % 3}") for i in range(4) for j in range(3) for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_info(df, "a", "b").collect()[0]
    assert r.n == 60 and r.n_x == 4 and r.n_y == 3
    assert r.mi == 0.0
    assert r.h_x == round(math.log(4), 6) and r.h_y == round(math.log(3), 6)
    assert r.nmi == 0.0

    # functional: y determined by x -> MI == H(Y)
    rows2 = [(f"x{i}", f"y{i % 2}") for i in range(4) for _ in range(10)]
    r2 = mutual_info(
        spark.createDataFrame(rows2, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r2.mi == r2.h_y and 0.0 < r2.nmi <= 1.0

    # constant column: zero entropy -> NULL nmi, zero mi
    rows3 = [("k", f"y{i % 3}") for i in range(9)]
    r3 = mutual_info(
        spark.createDataFrame(rows3, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r3.h_x == 0.0 and r3.mi == 0.0 and r3.nmi is None

    # NULLs excluded
    rows4 = [("x", "y")] * 5 + [(None, "y"), ("x", None)]
    r4 = mutual_info(
        spark.createDataFrame(rows4, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r4.n == 5


def test_cohen_kappa_hand_computed_and_chance_level(spark):
    from time_series_databse_engine_spark.operators.profile import cohen_kappa

    # classic 2x2: a=(y,y,y,n,n,y,n,y,y,n), b=(y,n,y,n,n,y,y,y,y,n)
    rows = list(zip("yyynnynyyn", "ynynnyyyyn"))
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    # confusion: yy=5, yn=1, ny=1, nn=3 -> po=0.8
    # pe = (6*6 + 4*4)/100 = 0.52 -> kappa = 0.28/0.48
    assert r.n == 10 and r.po == 0.8 and r.pe == 0.52
    assert abs(r.kappa - 0.28 / 0.48) < 1e-6
    assert r.n_labels_a == 2 and r.n_labels_b == 2


def test_cohen_kappa_edges(spark):
    from time_series_databse_engine_spark.operators.profile import cohen_kappa

    # perfect agreement -> kappa 1; NULLs excluded
    df = spark.createDataFrame(
        [("x", "x"), ("y", "y"), (None, "x"), ("y", None)], "a string, b string"
    )
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r.n == 2 and r.po == 1.0 and r.kappa == 1.0
    # both raters constant and identical -> pe=1 -> kappa NULL (0/0)
    df2 = spark.createDataFrame([("x", "x")] * 4, "a string, b string")
    r2 = cohen_kappa(df2, "a", "b").collect()[0]
    assert r2.pe == 1.0 and r2.kappa is None
    # disjoint label sets -> po=0, pe=0, kappa=0
    df3 = spark.createDataFrame([("x", "y"), ("x", "y")], "a string, b string")
    r3 = cohen_kappa(df3, "a", "b").collect()[0]
    assert r3.po == 0.0 and r3.pe == 0.0 and r3.kappa == 0.0


def test_expect_rules_single_scan_audit(spark):
    from time_series_databse_engine_spark.operators.profile import expect_rules

    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "F"), (3, 7.0, "X"), (4, None, "O")],
        "id long, price double, status string",
    )
    rules = [
        ("price_positive", "price > 0"),
        ("status_known", "status IN ('O', 'F')"),
        ("id_positive", "id > 0"),
    ]
    out = {r.rule: r for r in expect_rules(df, rules).collect()}
    # NULL price -> rule cannot pass -> violation
    assert out["price_positive"].violations == 2
    assert out["price_positive"].pass_rate == 0.5
    assert out["price_positive"].passed is False
    assert out["status_known"].violations == 1
    assert out["id_positive"].violations == 0 and out["id_positive"].passed is True
    assert all(r.n == 4 for r in out.values())


def test_expect_rules_empty_rules_rejected(spark):
    import pytest

    from time_series_databse_engine_spark.operators.profile import expect_rules

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        expect_rules(df, [])


def test_chi2_independence_hand_computed_2x2(spark):
    from time_series_databse_engine_spark.operators.profile import chi2_independence

    # contingency: (a,p)=10 (a,q)=20 (b,p)=30 (b,q)=40
    rows = (
        [("a", "p")] * 10 + [("a", "q")] * 20 + [("b", "p")] * 30 + [("b", "q")] * 40
    )
    df = spark.createDataFrame(rows, "x string, y string")
    r = chi2_independence(df, "x", "y", chi2_crit=3.841).collect()[0]
    n = 100
    exp = {("a", "p"): 30 * 40 / 100, ("a", "q"): 30 * 60 / 100,
           ("b", "p"): 70 * 40 / 100, ("b", "q"): 70 * 60 / 100}
    obs = {("a", "p"): 10, ("a", "q"): 20, ("b", "p"): 30, ("b", "q"): 40}
    chi2 = sum((obs[k] - e) ** 2 / e for k, e in exp.items())
    assert r.n == n and r.dof == 1
    assert abs(r.chi2 - chi2) < 1e-6
    assert abs(r.cramers_v - (chi2 / (n * 1)) ** 0.5) < 1e-6
    assert r.significant == (chi2 > 3.841)


def test_chi2_independence_independent_table_near_zero(spark):
    from time_series_databse_engine_spark.operators.profile import chi2_independence

    # perfectly proportional rows -> chi2 exactly 0
    rows = [("a", "p")] * 6 + [("a", "q")] * 12 + [("b", "p")] * 3 + [("b", "q")] * 6
    df = spark.createDataFrame(rows, "x string, y string")
    r = chi2_independence(df, "x", "y").collect()[0]
    assert abs(r.chi2) < 1e-6
    assert r.significant is None  # no critical value passed


def test_chi2_independence_degenerate_single_row(spark):
    from time_series_databse_engine_spark.operators.profile import chi2_independence

    df = spark.createDataFrame([("a", "p"), ("a", "q")], "x string, y string")
    r = chi2_independence(df, "x", "y").collect()[0]
    assert r.dof == 0 and r.cramers_v is None


def test_calibration_report_hand_computed(spark):
    from time_series_databse_engine_spark.operators.profile import calibration_report

    # bin 1 (scores .10-.15): 4 rows, 1 positive ; bin 9: s=1.0 joins top bin
    rows = [
        (0, 0.10, 0), (1, 0.12, 0), (2, 0.14, 1), (3, 0.15, 0),
        (4, 0.95, 1), (5, 1.00, 1),
    ]
    df = spark.createDataFrame(rows, "id long, s double, y int")
    out = {r.bin: r for r in calibration_report(df, "s", "y", n_bins=10).collect()}
    assert set(out) == {1, 9}
    b1 = out[1]
    assert b1.n == 4 and abs(b1.frac_pos - 0.25) < 1e-9
    ms = (0.10 + 0.12 + 0.14 + 0.15) / 4
    assert abs(b1.mean_score - ms) < 1e-6
    assert abs(b1.abs_gap - abs(ms - 0.25)) < 1e-6
    assert abs(b1.weight - 4 / 6) < 1e-6
    brier1 = ((0.10 - 0) ** 2 + (0.12 - 0) ** 2 + (0.14 - 1) ** 2 + (0.15 - 0) ** 2) / 4
    assert abs(b1.brier - brier1) < 1e-6
    b9 = out[9]
    assert b9.n == 2 and b9.frac_pos == 1.0
    # perfectly confident correct top bin: brier = avg((.95-1)^2, (1-1)^2)
    assert abs(b9.brier - (0.05 ** 2) / 2) < 1e-6


def test_calibration_report_clips_out_of_range_scores(spark):
    from time_series_databse_engine_spark.operators.profile import calibration_report

    df = spark.createDataFrame(
        [(0, -0.2, 0), (1, 1.7, 1)], "id long, s double, y int"
    )
    out = {r.bin: r for r in calibration_report(df, "s", "y").collect()}
    assert set(out) == {0, 9}
    assert out[0].mean_score == 0.0 and out[9].mean_score == 1.0


def test_benford_audit_conforming_vs_uniform(spark):
    import math

    from time_series_databse_engine_spark.operators.profile import benford_audit

    # group "b": exact Benford multiset (digit d appears round(1000*P(d)))
    # group "u": uniform digits 1..9 — MAD = (1/9)Σ|1/9 - P(d)| ≈ 0.049
    rows = []
    for d in range(1, 10):
        n_b = round(1000 * math.log10(1 + 1 / d))
        rows += [("b", float(d))] * n_b
        rows += [("u", float(d))] * 100
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in benford_audit(df, "v", "g").collect()}
    assert out["b"].conforming is True and out["b"].mad < 0.001
    assert out["u"].conforming is False and out["u"].mad > 0.04
    # hand-check the uniform MAD
    exp_mad = sum(abs(1 / 9 - math.log10(1 + 1 / d)) for d in range(1, 10)) / 9
    assert abs(out["u"].mad - exp_mad) < 1e-4


def test_benford_audit_missing_digits_charged_and_cents_digit(spark):
    from time_series_databse_engine_spark.operators.profile import benford_audit

    # only digit 9 observed; digits 1-8 still charge expected mass:
    # chi2 = n * [ (1-e9)^2/e9 + Σ_{d<9} e_d ] ; also 0.99 -> cents 99 -> digit 9
    import math

    df = spark.createDataFrame(
        [("g", 0.99)] * 50, "g string, v double"
    )
    r = benford_audit(df, "v", "g").collect()[0]
    e9 = math.log10(1 + 1 / 9)
    chi2 = 50 * ((1 - e9) ** 2 / e9 + sum(math.log10(1 + 1 / d) for d in range(1, 9)))
    assert abs(r.chi2 - chi2) < 1e-4
    assert r.conforming is False
    # non-positive and NULL-group rows excluded
    df2 = spark.createDataFrame(
        [("g", 0.0), ("g", -5.0), (None, 3.0), ("g", 3.0)], "g string, v double"
    )
    assert benford_audit(df2, "v", "g").collect()[0].n == 1
