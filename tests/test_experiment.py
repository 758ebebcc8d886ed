"""Experimentation tier: CUPED variance reduction + two-proportion z."""

import math
from datetime import datetime, timezone

from time_series_databse_engine_spark.operators.experiment import (
    ab_ztest,
    cuped_readout,
)

SPLIT_MS = int(
    datetime(2024, 1, 15, tzinfo=timezone.utc).timestamp() * 1000
)
PRE = datetime(2024, 1, 10)
POST = datetime(2024, 1, 20)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_cuped_theta_and_adjustment_hand_computed(spark):
    # per-user (x, y) in units: u0(2,10) u2(4,14) arm0 ; u1(3,12) u3(5,20) arm1
    data = {0: (2.0, 10.0), 2: (4.0, 14.0), 1: (3.0, 12.0), 3: (5.0, 20.0)}
    rows = []
    for uid, (x, y) in data.items():
        rows += [(uid, PRE, x), (uid, POST, y)]
    out = {r.arm: r for r in cuped_readout(_events(spark, rows), SPLIT_MS).collect()}

    xs = [v[0] for v in data.values()]
    ys = [v[1] for v in data.values()]
    n = len(xs)
    xbar = sum(xs) / n
    ybar = sum(ys) / n
    cov = sum((a - xbar) * (b - ybar) for a, b in zip(xs, ys)) / n
    var = sum((a - xbar) ** 2 for a in xs) / n
    theta = cov / var
    for arm in (0, 1):
        sub = [v for k, v in data.items() if k % 2 == arm]
        my = sum(v[1] for v in sub) / len(sub)
        madj = sum(v[1] - theta * (v[0] - xbar) for v in sub) / len(sub)
        assert out[arm].n == 2
        assert abs(out[arm].mean_y - my) < 1e-6
        assert abs(out[arm].mean_y_adj - madj) < 1e-6
    # y perfectly linear in x within arms? not exactly — but adjusted
    # variance must not exceed raw (CUPED never hurts, pooled theta)
    for arm in (0, 1):
        assert out[arm].var_y_adj <= out[arm].var_y + 1e-9


def test_cuped_edges(spark):
    # constant covariate -> var(x)=0 -> theta=0 -> adjusted == raw
    rows = []
    for uid, y in [(0, 10.0), (1, 14.0), (2, 20.0), (3, 8.0)]:
        rows += [(uid, PRE, 5.0), (uid, POST, y)]
    out = {r.arm: r for r in cuped_readout(_events(spark, rows), SPLIT_MS).collect()}
    for arm in (0, 1):
        assert out[arm].mean_y_adj == out[arm].mean_y
        assert out[arm].var_y_adj == out[arm].var_y
        assert out[arm].var_reduction == 0.0
    # user with no pre-period events carries x=0, still counted
    rows2 = rows + [(4, POST, 6.0)]
    out2 = {r.arm: r for r in cuped_readout(_events(spark, rows2), SPLIT_MS).collect()}
    assert out2[0].n == 3  # users 0,2,4


def test_cuped_kills_pre_period_variance(spark):
    # y = x + small arm effect: adjustment should remove nearly all
    # variance (var_reduction close to 1)
    rows = []
    for uid in range(20):
        x = float(10 + (uid * 7) % 13)
        y = x + (2.0 if uid % 2 else 0.0)
        rows += [(uid, PRE, x), (uid, POST, y)]
    out = {r.arm: r for r in cuped_readout(_events(spark, rows), SPLIT_MS).collect()}
    for arm in (0, 1):
        assert out[arm].var_reduction > 0.95


def test_ab_ztest_hand_computed(spark):
    # 4 users per arm; conversions: arm0 1/4, arm1 3/4
    rows = []
    for uid in range(8):
        arm = uid % 2
        converted = (arm == 0 and uid == 0) or (arm == 1 and uid != 7)
        rows.append((uid, POST, "purchase" if converted else "view"))
        rows.append((uid, POST, "view"))  # any-row semantics
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    r = ab_ztest(df, "event_type = 'purchase'").collect()[0]
    assert (r.n0, r.c0, r.n1, r.c1) == (4, 1, 4, 3)
    assert r.p0 == 0.25 and r.p1 == 0.75 and r.lift == 0.5
    z = 0.5 / math.sqrt(0.5 * 0.5 * (0.25 + 0.25))
    assert abs(r.z - z) < 1e-6
    assert r.significant == (abs(z) > 1.96)


def test_ab_ztest_degenerate_pooled_variance(spark):
    rows = [(uid, POST, "purchase") for uid in range(6)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    r = ab_ztest(df, "event_type = 'purchase'").collect()[0]
    assert r.p0 == 1.0 and r.p1 == 1.0
    assert r.z is None and r.significant is None


def test_srm_check_balanced_and_broken(spark):
    # perfectly balanced 2-arm split -> chi2 = 0, no SRM
    rows = [(uid, POST, 1.0) for uid in range(100) for _ in range(2)]
    df = _events(spark, rows)
    from time_series_databse_engine_spark.operators.experiment import srm_check

    r = srm_check(df).collect()[0]
    assert r.n == 100 and r.n_arms == 2 and r.chi2 == 0.0 and r.srm is False
    # drop 80% of arm 1's users -> strong SRM
    rows2 = [(uid, POST, 1.0) for uid in range(100) if uid % 2 == 0 or uid < 20]
    r2 = srm_check(_events(spark, rows2)).collect()[0]
    # n0=50, n1=10, n=60, e=30: chi2 = (400+400)/30 = 26.67
    assert r2.n == 60 and abs(r2.chi2 - 800 / 30) < 1e-6 and r2.srm is True


def test_srm_check_missing_arm_counts_against_expectation(spark):
    from time_series_databse_engine_spark.operators.experiment import srm_check

    # all entities land in arm 0 (ids all even): arm 1 has ZERO rows but
    # still contributes (0-e)^2/e -> chi2 = n
    rows = [(uid * 2, POST, 1.0) for uid in range(10)]
    r = srm_check(_events(spark, rows)).collect()[0]
    assert r.n == 10 and r.n_arms == 1
    assert abs(r.chi2 - 10.0) < 1e-6 and r.srm is True


def test_mann_whitney_hand_computed_with_ties(spark):
    from time_series_databse_engine_spark.operators.experiment import mann_whitney

    # per-user metric (cents after *100): arm0 = users 0,2,4 -> 1.00, 2.00, 2.00
    #                                     arm1 = users 1,3   -> 2.00, 3.00
    rows = [
        (0, POST, 1.0), (2, POST, 2.0), (4, POST, 2.0),
        (1, POST, 2.0), (3, POST, 3.0),
    ]
    r = mann_whitney(_events(spark, rows)).collect()[0]
    # combined sorted: 100(r1), 200,200,200 (midrank 3), 300 (r5)
    # R1 = 3 + 5 = 8 ; U1 = 8 - 2*3/2 = 5 ; mu = 3*2/2 = 3
    # ties: t=3 group -> (27-3)=24 ; sigma2 = (6/12)*((5+1) - 24/(5*4)) = 2.4
    assert r.n0 == 3 and r.n1 == 2
    assert abs(r.u1 - 5.0) < 1e-9
    assert abs(r.z - (5.0 - 3.0) / math.sqrt(2.4)) < 1e-6
    assert r.significant is False


def test_mann_whitney_all_tied_null_z(spark):
    from time_series_databse_engine_spark.operators.experiment import mann_whitney

    rows = [(u, POST, 7.0) for u in range(6)]
    r = mann_whitney(_events(spark, rows)).collect()[0]
    # one distinct value: sigma2 = 0 -> z NULL, significant NULL
    assert r.z is None and r.significant is None
    assert r.n0 == 3 and r.n1 == 3


def test_mann_whitney_matches_brute_force_ranks(spark):
    from time_series_databse_engine_spark.operators.experiment import mann_whitney

    vals = {u: float((u * 7) % 5 + (u % 3)) for u in range(20)}
    rows = [(u, POST, v) for u, v in vals.items()]
    r = mann_whitney(_events(spark, rows)).collect()[0]
    # brute-force midranks
    cents = {u: round(v * 100) for u, v in vals.items()}
    allv = sorted(cents.values())
    def midrank(c):
        lo = sum(1 for x in allv if x < c)
        t = sum(1 for x in allv if x == c)
        return lo + (t + 1) / 2.0
    r1 = sum(midrank(c) for u, c in cents.items() if u % 2 == 1)
    n1 = sum(1 for u in cents if u % 2 == 1)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    assert abs(r.u1 - u1) < 1e-9


def test_did_readout_hand_computed(spark):
    from time_series_databse_engine_spark.operators.experiment import did_readout

    # ctrl (even ids): u0 (2 -> 5), u2 (4 -> 7)   delta 3, 3
    # treat (odd ids): u1 (3 -> 10), u3 (5 -> 14) delta 7, 9
    data = {0: (2.0, 5.0), 2: (4.0, 7.0), 1: (3.0, 10.0), 3: (5.0, 14.0)}
    rows = []
    for uid, (x, y) in data.items():
        rows += [(uid, PRE, x), (uid, POST, y)]
    r = did_readout(_events(spark, rows), SPLIT_MS).collect()[0]
    assert r.n_ctrl == 2 and r.n_treat == 2
    assert abs(r.pre_ctrl - 3.0) < 1e-9 and abs(r.post_ctrl - 6.0) < 1e-9
    assert abs(r.pre_treat - 4.0) < 1e-9 and abs(r.post_treat - 12.0) < 1e-9
    # did = (12-4) - (6-3) = 5 ; var(delta ctrl)=0, var(delta treat)=1
    assert abs(r.did - 5.0) < 1e-9
    assert abs(r.se - math.sqrt(0.0 / 2 + 1.0 / 2)) < 1e-6
    assert r.significant is True


def test_did_readout_parallel_trends_zero(spark):
    from time_series_databse_engine_spark.operators.experiment import did_readout

    # both arms shift by exactly +4 -> did = 0, se = 0 -> NULL z
    rows = []
    for uid, x in [(0, 2.0), (1, 3.0), (2, 5.0), (3, 6.0)]:
        rows += [(uid, PRE, x), (uid, POST, x + 4.0)]
    r = did_readout(_events(spark, rows), SPLIT_MS).collect()[0]
    assert r.did == 0.0 and r.z is None and r.significant is None


def test_did_readout_silent_period_counts_as_zero(spark):
    from time_series_databse_engine_spark.operators.experiment import did_readout

    # u0 has no pre-period rows -> x = 0, not excluded
    rows = [(0, POST, 6.0), (1, PRE, 2.0), (1, POST, 5.0)]
    r = did_readout(_events(spark, rows), SPLIT_MS).collect()[0]
    assert r.n_ctrl == 1 and r.pre_ctrl == 0.0 and r.post_ctrl == 6.0


def test_power_mde_closed_form_and_scaling(spark):
    from time_series_databse_engine_spark.operators.experiment import power_mde

    # four users, metrics 1, 3, 5, 7 units -> mean 4, pop sigma sqrt(5)
    rows = [(u, POST, float(2 * u + 1)) for u in range(4)]
    out = {
        r.n_per_arm: r
        for r in power_mde(
            _events(spark, rows), sizes=[100, 400]
        ).collect()
    }
    sigma = math.sqrt(5.0)
    for n in (100, 400):
        want = (1.96 + 0.8416) * sigma * math.sqrt(2.0 / n)
        assert abs(out[n].mde - want) < 1e-6
        assert abs(out[n].sigma - sigma) < 1e-6
        assert abs(out[n].mde_rel - want / 4.0) < 1e-6
        assert out[n].n_pilot == 4
    # 4x the sample halves the MDE (sqrt law)
    assert abs(out[100].mde / out[400].mde - 2.0) < 1e-9


def test_power_mde_constant_metric_zero_sigma(spark):
    from time_series_databse_engine_spark.operators.experiment import power_mde

    rows = [(u, POST, 5.0) for u in range(3)]
    r = power_mde(_events(spark, rows), sizes=[1000]).collect()[0]
    assert r.sigma == 0.0 and r.mde == 0.0 and r.mde_rel == 0.0
