"""Experimentation readouts — the A/B-test tier a warehouse runs on the
same event stream the rest of the engine ingests.

All members are built on the fixed-point discipline the time-series
tier uses everywhere (exact integer micro-unit sums until closed-form
finals), so the DuckDB oracle replays every float bit-for-bit:

* :func:`cuped_readout` — CUPED variance-reduced treatment readout
  (Deng, Xu, Kohavi & Walker, WSDM 2013): regress the experiment metric
  on its own pre-period value and report per-arm means/variances of
  both the raw and the adjusted metric.  On a 100 TB event store the
  pre-period covariate routinely removes 30-60 % of metric variance —
  the difference between a two-week and a one-week experiment.
* :func:`ab_ztest` — classic two-proportion conversion z-test with the
  pooled standard error, the go/no-go number behind every conversion
  experiment.
* :func:`srm_check` — sample-ratio-mismatch guardrail (chi-square
  goodness of fit on the arm split).
* :func:`mann_whitney` — rank-sum test (Mann & Whitney 1947) for the
  revenue-shaped metrics where the t/z normal theory fails: per-entity
  spend is zero-inflated and heavy-tailed, and a single whale can move
  a mean test; the rank statistic is outlier-robust and its tie-
  corrected normal approximation is standard at experiment sizes.

Scale shape (shared): ONE data-sized exchange — the per-entity reduce
(map-side partial sums; state = n_entities rows of a few integers).
Everything after is a handful of per-arm integer sums combined in
one-row closed-form finals; the corpus is scanned once and never
sorted (mann_whitney adds a distinct-metric-value finish window, the
PSI/KS discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cuped_readout(
    df: DataFrame,
    split_ms: int,
    id_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    arm_mod: int = 2,
) -> DataFrame:
    """CUPED readout over an event stream (Deng et al. 2013 §3).

    Entities are assigned to arms deterministically (``id % arm_mod``,
    the hash-split discipline of train/val/test splits).  Per entity:
    pre-period covariate ``x`` = sum of ``value_col`` strictly before
    ``split_ms`` (epoch millis), metric ``y`` = sum at/after it, both
    in exact integer cents (value rounded to 2 dp × 100).  The pooled
    adjustment coefficient

        θ = cov(x, y) / var(x)          (over ALL entities)

    is computed from exact integer sums (n, Σx, Σy, Σx², Σxy) and the
    adjusted metric is y − θ·(x − x̄).  Returns one row per arm:

        (arm, n, mean_y, mean_y_adj, var_y, var_y_adj, var_reduction)

    in original units rounded 6 dp, where ``var_y_adj`` uses the
    closed form Var(y−θx) = Var(y) − 2θCov(x,y) + θ²Var(x) from the
    same per-arm integer sums (population variances — the readout is
    the full assigned population, not a sample).  ``var_reduction`` is
    1 − var_adj/var_y (NULL when var_y = 0); θ is 0 when var(x) = 0
    (no pre-period signal — CUPED degrades to the raw readout).
    Entities with no pre-period events carry x = 0 (the standard
    missing-covariate convention); NULL ids/timestamps are excluded.

    Scale shape: the per-entity reduce is the ONLY data-sized exchange;
    θ and the per-arm finals combine a handful of BIGINT sums cast to
    double for the closed forms — identical IEEE ops in both engines.
    """
    ms = F.unix_millis(F.col(ts_col))
    cents = F.round(F.col(value_col) * 100).cast("long")
    per = (
        df.where(F.col(id_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(F.col(id_col).alias("_id"))
        .agg(
            F.sum(F.when(ms < F.lit(int(split_ms)), cents).otherwise(F.lit(0))).alias("_x"),
            F.sum(F.when(ms >= F.lit(int(split_ms)), cents).otherwise(F.lit(0))).alias("_y"),
        )
        .select(
            (F.col("_id") % F.lit(int(arm_mod))).alias("arm"), "_x", "_y"
        )
        .localCheckpoint(eager=False)  # lineage cut; materialized in-job
    )
    # pooled θ from exact integer sums: all entities, one tiny row
    g = per.agg(
        F.count("*").alias("gn"),
        F.sum("_x").alias("gsx"),
        F.sum("_y").alias("gsy"),
        F.sum(F.col("_x") * F.col("_x")).alias("gsxx"),
        F.sum(F.col("_x") * F.col("_y")).alias("gsxy"),
    )
    # θ and the global covariate mean, double-precision closed forms
    gn = F.col("gn").cast("double")
    cov_num = F.col("gsxy").cast("double") - F.col("gsx").cast("double") * F.col("gsy").cast("double") / gn
    var_num = F.col("gsxx").cast("double") - F.col("gsx").cast("double") * F.col("gsx").cast("double") / gn
    theta = F.when(var_num > 0, cov_num / var_num).otherwise(F.lit(0.0))
    gstats = F.broadcast(
        g.select(
            theta.alias("_theta"),
            (F.col("gsx").cast("double") / gn).alias("_xbar"),
        )
    )
    arms = per.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    var_y = (F.col("syy").cast("double") - sy * sy / n) / n
    var_x = (F.col("sxx").cast("double") - sx * sx / n) / n
    cov_xy = (F.col("sxy").cast("double") - sx * sy / n) / n
    th = F.col("_theta")
    var_adj = var_y - F.lit(2.0) * th * cov_xy + th * th * var_x
    # cents² → unit²: divide by 100² ; means: cents → units
    return (
        arms.crossJoin(gstats)
        .select(
            "arm",
            "n",
            F.round(sy / n / F.lit(100.0), 6).alias("mean_y"),
            F.round(
                (sy / n - th * (sx / n - F.col("_xbar"))) / F.lit(100.0), 6
            ).alias("mean_y_adj"),
            F.round(var_y / F.lit(10000.0), 6).alias("var_y"),
            F.round(var_adj / F.lit(10000.0), 6).alias("var_y_adj"),
            F.when(
                var_y > 0, F.round(F.lit(1.0) - var_adj / var_y, 6)
            ).alias("var_reduction"),
        )
        .orderBy("arm")
    )


def ab_ztest(
    df: DataFrame,
    convert_expr: str,
    id_col: str = "user_id",
    arm_mod: int = 2,
    z_crit: float = 1.96,
) -> DataFrame:
    """Two-proportion conversion z-test with the pooled standard error —
    the go/no-go readout of a conversion experiment.

    An entity converts when ANY of its rows satisfies ``convert_expr``
    (a SQL boolean over the event columns, e.g.
    ``"event_type = 'purchase'"``).  Arms are ``id % arm_mod`` (0 =
    control, 1 = treatment; only the first two arms are tested).

        p̂   = (c0 + c1) / (n0 + n1)                  (pooled)
        z    = (p1 − p0) / sqrt(p̂(1−p̂)(1/n0 + 1/n1))

    Returns ONE row: (n0, c0, p0, n1, c1, p1, lift, z, significant) —
    proportions/lift/z rounded 6 dp, ``significant`` = |z| > z_crit,
    NULL z when the pooled variance is 0 (p̂ ∈ {0, 1} — no information).
    NULL ids are excluded.  All counts exact integers until the final
    closed form — the same two-engine determinism as
    :func:`cuped_readout`.

    Scale shape: ONE exchange — the per-entity any-conversion reduce
    (map-side partial max of a 0/1 flag); the test itself is a one-row
    combine of four integers.
    """
    conv = F.max(F.when(F.expr(convert_expr), F.lit(1)).otherwise(F.lit(0)))
    per = (
        df.where(F.col(id_col).isNotNull())
        .groupBy(F.col(id_col).alias("_id"))
        .agg(conv.alias("_c"))
        .select((F.col("_id") % F.lit(int(arm_mod))).alias("_arm"), "_c")
        .where(F.col("_arm") < 2)
    )
    agg = per.agg(
        F.sum(F.when(F.col("_arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("_arm") == 0, F.col("_c")).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("_arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("_arm") == 1, F.col("_c")).otherwise(0)).alias("c1"),
    )
    n0 = F.col("n0").cast("double")
    n1 = F.col("n1").cast("double")
    c0 = F.col("c0").cast("double")
    c1 = F.col("c1").cast("double")
    p0 = c0 / n0
    p1 = c1 / n1
    pp = (c0 + c1) / (n0 + n1)
    se2 = pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n0 + F.lit(1.0) / n1)
    z = F.when(se2 > 0, (p1 - p0) / F.sqrt(se2))
    return agg.select(
        "n0",
        "c0",
        F.round(p0, 6).alias("p0"),
        "n1",
        "c1",
        F.round(p1, 6).alias("p1"),
        F.round(p1 - p0, 6).alias("lift"),
        F.round(z, 6).alias("z"),
        F.when(z.isNotNull(), F.abs(z) > F.lit(float(z_crit))).alias("significant"),
    )


def srm_check(
    df: DataFrame,
    id_col: str = "user_id",
    arm_mod: int = 2,
    chi2_crit: float = 3.841,
) -> DataFrame:
    """Sample-ratio-mismatch guardrail (the chi-square goodness-of-fit
    check every experimentation platform runs before reading a single
    metric): with deterministic ``id % arm_mod`` assignment the arms
    must split the entity population evenly — a skewed split means the
    exposure/logging pipeline is dropping one arm's entities, and every
    downstream readout (including :func:`ab_ztest`) is invalid.

        χ² = Σ_arms (n_a − n/k)² / (n/k)     (k = arm_mod, df = k−1)

    Returns ONE row: (n, n_arms, chi2, srm) — χ² rounded 6 dp, ``srm``
    true when χ² > ``chi2_crit`` (default 3.841 = χ²₀.₀₅ at 1 df, the
    two-arm case; pass the right critical value for more arms).  NULL
    ids are excluded.  Arms with zero entities still count against the
    expected share (n_arms is DISTINCT OBSERVED arms; the χ² sum runs
    over all ``arm_mod`` expected cells).

    Scale shape: ONE exchange — the per-entity distinct reduce; the χ²
    is a k-row combine.  Exact integer counts until the final division.
    """
    per = (
        df.where(F.col(id_col).isNotNull())
        .select((F.col(id_col) % F.lit(int(arm_mod))).alias("_arm"), F.col(id_col).alias("_id"))
        .distinct()
        .groupBy("_arm")
        .agg(F.count("*").alias("_na"))
    )
    k = float(int(arm_mod))
    tot = per.agg(
        F.sum("_na").alias("n"),
        F.count("*").alias("n_arms"),
        # Σ n_a² lets χ² close over observed cells only: missing cells
        # contribute (0 − n/k)²/(n/k) = n/k each, folded in below
        F.sum(F.col("_na") * F.col("_na")).alias("_sq"),
    )
    n = F.col("n").cast("double")
    exp_ = n / F.lit(k)
    # Σ_a (n_a − e)²/e over ALL k cells = (Σn_a² − 2eΣn_a + k·e²)/e
    chi2 = (F.col("_sq").cast("double") - F.lit(2.0) * exp_ * n + F.lit(k) * exp_ * exp_) / exp_
    return tot.select(
        "n",
        "n_arms",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > F.lit(float(chi2_crit))).alias("srm"),
    )

def mann_whitney(
    df: DataFrame,
    id_col: str = "user_id",
    value_col: str = "value",
    arm_mod: int = 2,
    z_crit: float = 1.96,
) -> DataFrame:
    """Mann-Whitney U rank-sum test on the per-entity metric — the
    nonparametric companion to :func:`ab_ztest`/:func:`cuped_readout`
    for heavy-tailed metrics (per-user revenue: mostly zeros + a long
    tail) where a mean-based z/t readout is whale-dominated.

    Entities are ``id % arm_mod`` arms (only arms 0/1 tested, the
    ab_ztest convention); per-entity metric y = Σ value in exact
    integer cents.  With combined midranks (ties averaged):

        R1 = Σ ranks of arm-1 entities
        U1 = R1 − n1(n1+1)/2
        μ  = n0·n1/2
        σ² = (n0·n1/12)·((N+1) − Σ(t³−t)/(N(N−1)))   (tie-corrected)
        z  = (U1 − μ)/σ                    (no continuity correction)

    Returns ONE row: (n0, n1, u1, z, significant) — u1/z rounded 6 dp,
    NULL z when σ² = 0 (every entity tied — one distinct value).
    Everything stays exact integers until the final closed form: ranks
    are carried in HALF-units (2·midrank = 2·cum_before + t + 1 is
    always integral), so R1 and the tie term Σ(t³−t) are exact BIGINTs
    in both engines.

    Scale shape: the per-entity reduce is the one data-sized exchange;
    ranks come from the per-distinct-metric-value count table (the
    :func:`~..profile.ks_drift` discipline — integer-cent metrics keep
    the distinct-value table far below entity count; quantize first for
    genuinely continuous metrics), and the cumulative-count finish
    window runs over THAT table only.  The corpus never sorts.
    """
    from pyspark.sql import Window as W

    cents = F.round(F.col(value_col) * 100).cast("long")
    per = (
        df.where(F.col(id_col).isNotNull())
        .groupBy(F.col(id_col).alias("_id"))
        .agg(F.sum(cents).alias("_y"))
        .select((F.col("_id") % F.lit(int(arm_mod))).alias("_arm"), "_y")
        .where(F.col("_arm") < 2)
    )
    vc = per.groupBy("_y").agg(
        F.count("*").alias("_t"),
        F.sum(F.when(F.col("_arm") == 1, 1).otherwise(0)).alias("_t1"),
    )
    wb = W.orderBy("_y").rowsBetween(W.unboundedPreceding, -1)
    ranked = vc.select(
        "_t",
        "_t1",
        F.coalesce(F.sum("_t").over(wb), F.lit(0)).alias("_cb"),
    )
    agg = ranked.agg(
        F.sum("_t").alias("_n"),
        F.sum("_t1").alias("n1"),
        # Σ over arm-1 entities of 2·midrank, exact integer
        F.sum(
            F.col("_t1") * (F.lit(2) * F.col("_cb") + F.col("_t") + F.lit(1))
        ).alias("_r1x2"),
        F.sum(
            F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t")
        ).alias("_ties"),
    )
    n = F.col("_n").cast("double")
    n1 = F.col("n1").cast("double")
    n0 = n - n1
    u1 = F.col("_r1x2").cast("double") / F.lit(2.0) - n1 * (n1 + F.lit(1.0)) / F.lit(2.0)
    mu = n0 * n1 / F.lit(2.0)
    sig2 = (
        n0
        * n1
        / F.lit(12.0)
        * (
            (n + F.lit(1.0))
            - F.col("_ties").cast("double") / (n * (n - F.lit(1.0)))
        )
    )
    z = F.when(sig2 > 0, (u1 - mu) / F.sqrt(sig2))
    return agg.select(
        (F.col("_n") - F.col("n1")).alias("n0"),
        "n1",
        F.round(u1, 6).alias("u1"),
        F.round(z, 6).alias("z"),
        F.when(z.isNotNull(), F.abs(z) > F.lit(float(z_crit))).alias("significant"),
    )


def did_readout(
    df: DataFrame,
    split_ms: int,
    id_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    arm_mod: int = 2,
    z_crit: float = 1.96,
) -> DataFrame:
    """Difference-in-differences readout (Card & Krueger 1994 shape):
    the causal estimate when assignment is NOT randomized — a staged
    rollout, a geo launch, a policy change — where :func:`ab_ztest`/
    :func:`cuped_readout`'s exchangeability assumption fails but the
    parallel-trends assumption (both groups drift alike absent
    treatment) is defensible:

        DiD = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre)

    Per entity: pre/post period sums of ``value_col`` in exact integer
    cents split at ``split_ms`` (the cuped_readout covariate recipe);
    groups are ``id % arm_mod`` (0 = control, 1 = treated).  Standard
    error treats the four cell means as independent across entities
    (each entity contributes one pre and one post value, and the
    difference-of-differences variance is priced from the per-entity
    DELTA y − x, which absorbs the within-entity pre/post covariance):

        se² = s²_Δ,c/n_c + s²_Δ,t/n_t      (population variances of Δ)

    Returns ONE row: (n_ctrl, n_treat, pre_ctrl, post_ctrl, pre_treat,
    post_treat, did, se, z, significant) — means in original units,
    6 dp, NULL z when se = 0.  NULL ids/timestamps are excluded;
    entities silent in a period carry 0 for it (the standard
    balanced-panel convention for sum metrics).

    Scale shape: identical to cuped_readout — ONE per-entity exchange,
    then per-group integer sums (n, Σx, Σy, ΣΔ, ΣΔ²) combined in a
    one-row closed form; the corpus never sorts.
    """
    ms = F.unix_millis(F.col(ts_col))
    cents = F.round(F.col(value_col) * 100).cast("long")
    per = (
        df.where(F.col(id_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(F.col(id_col).alias("_id"))
        .agg(
            F.sum(
                F.when(ms < F.lit(int(split_ms)), cents).otherwise(F.lit(0))
            ).alias("_x"),
            F.sum(
                F.when(ms >= F.lit(int(split_ms)), cents).otherwise(F.lit(0))
            ).alias("_y"),
        )
        .select(
            (F.col("_id") % F.lit(int(arm_mod))).alias("_arm"), "_x", "_y"
        )
        .where(F.col("_arm") < 2)
    )
    dlt = F.col("_y") - F.col("_x")
    agg = per.groupBy("_arm").agg(
        F.count("*").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(dlt).alias("_sd"),
        F.sum(dlt * dlt).alias("_sdd"),
    )
    # pivot the two arm rows into one via conditional one-row aggregation
    row = agg.agg(
        *[
            F.max(F.when(F.col("_arm") == a, F.col(c))).alias(f"{c}{a}")
            for a in (0, 1)
            for c in ("_n", "_sx", "_sy", "_sd", "_sdd")
        ]
    )
    out_cols = []
    means = {}
    for a in (0, 1):
        n = F.col(f"_n{a}").cast("double")
        means[(a, "pre")] = F.col(f"_sx{a}").cast("double") / n / F.lit(100.0)
        means[(a, "post")] = F.col(f"_sy{a}").cast("double") / n / F.lit(100.0)
    n0 = F.col("_n0").cast("double")
    n1 = F.col("_n1").cast("double")
    # population variance of the per-entity delta, in cents²
    vd0 = (
        F.col("_sdd0").cast("double")
        - F.col("_sd0").cast("double") * F.col("_sd0").cast("double") / n0
    ) / n0
    vd1 = (
        F.col("_sdd1").cast("double")
        - F.col("_sd1").cast("double") * F.col("_sd1").cast("double") / n1
    ) / n1
    did = (
        F.col("_sd1").cast("double") / n1 - F.col("_sd0").cast("double") / n0
    ) / F.lit(100.0)
    se = F.sqrt(vd0 / n0 + vd1 / n1) / F.lit(100.0)
    z = F.when(se > 0, did / se)
    return row.select(
        F.col("_n0").alias("n_ctrl"),
        F.col("_n1").alias("n_treat"),
        F.round(means[(0, "pre")], 6).alias("pre_ctrl"),
        F.round(means[(0, "post")], 6).alias("post_ctrl"),
        F.round(means[(1, "pre")], 6).alias("pre_treat"),
        F.round(means[(1, "post")], 6).alias("post_treat"),
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(z, 6).alias("z"),
        F.when(z.isNotNull(), F.abs(z) > F.lit(float(z_crit))).alias(
            "significant"
        ),
    )


def power_mde(
    df: DataFrame,
    id_col: str = "user_id",
    value_col: str = "value",
    sizes: list[int] | None = None,
    z_alpha: float = 1.96,
    z_beta: float = 0.8416,
) -> DataFrame:
    """Minimum-detectable-effect planning table from pilot variance —
    the experiment-DESIGN member of the tier (the others read results;
    this one sizes the next test): given the per-entity metric variance
    observed in a pilot window, the two-sample MDE at per-arm size n is

        MDE(n) = (z_{α/2} + z_β) · σ̂ · sqrt(2/n)

    (two-sided α = 0.05 and power 80 % at the defaults — pass other
    z's for other levels).  Per-entity metric in exact integer cents
    (the cuped recipe); σ̂ is the population σ of the per-entity sums.
    Returns one row per requested size: (n_per_arm, n_pilot, sigma,
    mde, mde_rel) in original units, 6 dp — mde_rel = MDE/mean is the
    relative lift the test can see, NULL for a zero-mean metric.
    Default grid: 1k/5k/10k/50k/100k/500k/1M per arm.

    Scale shape: ONE per-entity exchange; σ̂ and the mean are a one-row
    closed form from BIGINT sums, and the grid is a size-literal
    broadcast cross join — |sizes| output rows total.
    """
    if sizes is None:
        sizes = [1_000, 5_000, 10_000, 50_000, 100_000, 500_000, 1_000_000]
    cents = F.round(F.col(value_col) * 100).cast("long")
    per = (
        df.where(F.col(id_col).isNotNull())
        .groupBy(F.col(id_col).alias("_id"))
        .agg(F.sum(cents).alias("_y"))
    )
    g = per.agg(
        F.count("*").alias("_n"),
        F.sum("_y").alias("_s"),
        F.sum(F.col("_y") * F.col("_y")).alias("_ss"),
    )
    n = F.col("_n").cast("double")
    s = F.col("_s").cast("double")
    var = (F.col("_ss").cast("double") - s * s / n) / n
    stats = g.select(
        F.col("_n").alias("n_pilot"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("_sigma_c"),
        (s / n).alias("_mean_c"),
    )
    spark = df.sparkSession
    grid = spark.createDataFrame([(int(x),) for x in sizes], "n_per_arm long")
    zsum = F.lit(float(z_alpha) + float(z_beta))
    mde_c = zsum * F.col("_sigma_c") * F.sqrt(F.lit(2.0) / F.col("n_per_arm").cast("double"))
    return (
        grid.crossJoin(F.broadcast(stats))
        .select(
            "n_per_arm",
            "n_pilot",
            F.round(F.col("_sigma_c") / F.lit(100.0), 6).alias("sigma"),
            F.round(mde_c / F.lit(100.0), 6).alias("mde"),
            F.when(
                F.abs(F.col("_mean_c")) > 0,
                F.round(mde_c / F.abs(F.col("_mean_c")), 6),
            ).alias("mde_rel"),
        )
        .orderBy("n_per_arm")
    )
