"""Experimentation readouts — the A/B-test tier a warehouse runs on the
same event stream the rest of the engine ingests.

Two members, both built on the fixed-point discipline the time-series
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

Scale shape (shared): ONE exchange — the per-entity reduce (map-side
partial sums; state = n_entities rows of a few integers).  Everything
after is a handful of per-arm integer sums combined in one-row
closed-form finals; the corpus is scanned once and never sorted.
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
        .localCheckpoint()
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
