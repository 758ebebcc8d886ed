"""Deterministic sampling for training-data pipelines (north-star tier;
no reference analogue — the reference has no sampling of any kind).

Both samplers key on a content hash, not ``rand()``: at 100 TB a sample
must be reproducible across retries, AQE re-plans, and incremental reruns,
and hash-gating composes with incremental ingestion (a doc's membership
never changes as the table grows).  md5 is used so the DuckDB oracle
reproduces membership exactly; swap ``xxhash64`` at scale for cheaper
hashing with the same algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

HEX = "0123456789abcdef"


def deterministic_sample(
    df: DataFrame,
    rate_16ths: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep rows whose md5(id) starts with one of the first ``rate_16ths``
    hex digits — a reproducible ``rate_16ths``/16 Bernoulli sample.

    One scan, zero shuffles; the predicate is evaluated inside codegen and
    combines with pushed column pruning (only ``id_col`` plus the projected
    columns are read).
    """
    digit = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    return df.filter(digit.isin(*HEX[:rate_16ths]))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen by md5-of-id order — deterministic and uniform within
    each stratum.

    One shuffle on the stratum key; per-stratum ordering is a window sort.
    A skewed stratum sorts more rows than it keeps — at extreme skew,
    pre-gate with :func:`deterministic_sample` at a rate that leaves
    ~10 × ``n_per_stratum`` expected survivors before ranking.
    """
    w = W.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def hash_split(
    df: DataFrame,
    val_16ths: int = 1,
    test_16ths: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment — the split step every
    training pipeline runs before packing.  The first hex digit of
    ``md5(string(id))`` partitions the id space: the first ``val_16ths``
    digits → val, the next ``test_16ths`` → test, the rest → train.

    Hash-gated like the samplers above, and for the same reasons: a
    doc's split NEVER changes as the corpus grows, across retries, or
    under AQE re-planning (``randomSplit`` guarantees none of these),
    and train/val/test are disjoint by construction because the digit
    ranges are.  Zero shuffles — one codegen'd expression per row.
    """
    if val_16ths < 0 or test_16ths < 0 or val_16ths + test_16ths > 15:
        raise ValueError(
            "val_16ths + test_16ths must be in [0, 15] so at least one "
            f"digit remains for train (got {val_16ths} + {test_16ths})"
        )
    digit = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    val_set = list(HEX[:val_16ths])
    test_set = list(HEX[val_16ths : val_16ths + test_16ths])
    split = (
        F.when(digit.isin(*val_set), F.lit("val"))
        .when(digit.isin(*test_set), F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def group_kfold(
    df: DataFrame,
    k: int = 5,
    group_col: str = "user_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Leakage-safe k-fold cross-validation assignment: every row of a
    GROUP lands in the same fold, so no fold's validation set contains
    rows whose group-mates were trained on — the group is the leakage
    unit (user for behavioral models, host for crawl corpora, dedup
    cluster id for near-duplicate text; pipe `leakage_safe_split`'s
    split_key in for the last).

        fold = int(md5(group)[:8], 16) % k

    Hash-gated like every sampler here — a group's fold NEVER changes as
    the corpus grows or under retries (sklearn's GroupKFold reassigns on
    any membership change, which silently rotates test sets between
    pipeline runs), and fold sizes concentrate near n/k by the uniformity
    of the hash.  Zero shuffles: one codegen'd expression per row.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = F.conv(
        F.substring(F.md5(F.col(group_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return df.withColumn("fold", F.pmod(h, F.lit(k)).cast("int"))


def importance_sample(
    weighted: DataFrame,
    k: int,
    weight_col: str = "importance_weight",
    id_col: str = "doc_id",
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel-top-k importance resampling — the selection step that
    completes DSIR (`text.dsir_importance_weights` produces the weights):
    drawing k items WITHOUT replacement with probability ∝
    exp(w/temperature) is exactly taking the top k of
    ``w/temperature + Gumbel noise`` (the Gumbel-max trick).

    The noise is DERANDOMIZED the same way every sampler here is: the
    uniform comes from a hash of the id — ``u = (int(md5(id)[:8]) +
    0.5) / 2^32``, ``g = −ln(−ln u)`` — so the draw is reproducible
    across retries/engines (md5-hex-to-int round-trips identically in
    Spark's ``conv`` and DuckDB's ``'0x'||…::BIGINT``) while still being
    a faithful Gumbel sample over the id population.  One k-heap
    TakeOrderedAndProject; zero shuffles beyond it.
    """
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    g = -F.log(-F.log(u))
    score = F.col(weight_col) / F.lit(temperature) + g
    return (
        weighted.withColumn("gumbel_score", F.round(score, 6))
        .orderBy(F.col("gumbel_score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def mixture_sample(
    df: DataFrame,
    target_shares: dict[str, float],
    target_total: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebalance a corpus to a target domain MIXTURE — the step between
    per-domain curation and tokenization in every LLM data pipeline
    (e.g. "20% code, 30% web, 50% books"): given per-group target shares
    and a target corpus size, keep each group's documents at rate

        keep_rate(g) = min(1, target_total * share(g) / n(g))

    so the kept corpus approaches the requested mixture (groups too
    small to fill their quota are kept whole — the standard behavior;
    upsampling-with-replacement is a separate op).  Groups absent from
    ``target_shares`` get share 0 and are dropped.

    Membership is hash-gated like every sampler here — keep iff
    ``int(md5(id)[:8]) mod 2^20 < keep_rate * 2^20`` — so a document's
    fate is reproducible across retries, engines, and corpus growth
    *within a group snapshot*, and thresholding is integer (no float
    comparison at the boundary).  Scale shape: the group-count table is
    group-cardinality-sized and broadcasts back; the corpus itself is
    filtered in place — ONE aggregate shuffle of group keys, zero
    corpus shuffles.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n_grp"))
    share = F.coalesce(
        *[
            F.when(F.col(group_col) == g, F.lit(float(s)))
            for g, s in sorted(target_shares.items())
        ],
        F.lit(0.0),
    )
    rate = F.least(F.lit(1.0), F.lit(float(target_total)) * share / F.col("_n_grp"))
    gate = F.floor(rate * F.lit(1048576.0)).cast("bigint")
    h = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % 1048576
    )
    return (
        df.join(F.broadcast(counts), group_col)
        .filter(h < gate)
        .drop("_n_grp")
    )


def upsample_with_replacement(
    df: DataFrame,
    target_shares: dict[str, float],
    target_total: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """The upsampling half of mixture construction (:func:`mixture_sample`
    only downsamples): groups whose quota EXCEEDS their size are
    replicated ``rate = target_total·share/n`` times — ⌊rate⌋ full
    copies plus one more for the hash-gated ``frac(rate)`` fraction of
    ids — the standard epoch-repeat treatment of small high-value
    domains (Wikipedia/books at 3-5 epochs while web stays at 1).

    Output carries ``copy_idx`` (0-based) so downstream shuffles don't
    collapse the replicas; (id, copy_idx) is a stable key — a doc's
    replica count is hash-derandomized (same md5 gate as every sampler
    here), reproducible across retries and engines, and monotone in
    rate.  Groups absent from ``target_shares`` keep exactly one copy
    (rate 1) — this operator never drops; compose with
    :func:`mixture_sample` to cut.

    Scale shape: group-count table broadcasts back; each row explodes
    to its own copy count via ``sequence`` — no shuffle at all, output
    volume is exactly the requested oversample.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n_grp"))
    share = F.coalesce(
        *[
            F.when(F.col(group_col) == g, F.lit(float(s)))
            for g, s in sorted(target_shares.items())
        ],
        F.lit(0.0),
    )
    rate = F.greatest(
        F.lit(1.0), F.lit(float(target_total)) * share / F.col("_n_grp")
    )
    base = F.floor(rate).cast("int")
    frac_gate = F.floor((rate - base) * F.lit(1048576.0)).cast("bigint")
    h = (
        F.conv(
            F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":up"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 1048576
    )
    n_copies = base + (h < frac_gate).cast("int")
    return (
        df.join(F.broadcast(counts), group_col)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(0), n_copies - 1)))
        .drop("_n_grp")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, P(pick) ∝ raw weight —
    Efraimidis & Spirakis 2006 (A-ES): each row draws an exponential
    race key ``-ln(u)/w`` and the k SMALLEST keys win; equivalent to
    sequential weighted draws but embarrassingly parallel (one k-heap
    TakeOrderedAndProject, zero shuffles — every executor keeps a local
    top-k heap and the driver merges #partitions×k candidates).

    Complements :func:`importance_sample`, which races Gumbel keys over
    LOG-space weights (exp(w) sampling for DSIR); here the weight column
    is a plain positive quantity (bytes, tokens, priority).  The uniform
    is hash-derandomized exactly like every sampler in this module
    (md5-of-id → u ∈ (0,1)), so the draw is retry-stable and replayable
    by the SQL oracle; rows with non-positive weight are excluded (their
    race key is undefined — matches the sequential algorithm, which can
    never pick them).
    """
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    key = -F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_key", F.round(key, 6))
        .orderBy(F.col("es_key").asc(), F.col(id_col).asc())
        .limit(k)
    )


def equidepth_bins(
    df: DataFrame,
    col: str,
    n_bins: int = 10,
    out: str = "bin",
) -> DataFrame:
    """Tag every row with its equal-POPULATION bin over ``col`` —
    the calibration-table primitive (score deciles vs realized
    outcomes; threshold picking for quality filters: "keep the top 3
    deciles" needs depth bins, not width bins — long-tailed scores
    collapse fixed-width histograms, the `value_histogram` counterpart).

    The textbook expression is ``ntile(n)`` over a GLOBAL window — a
    single-partition sort, unusable at 100 TB.  Here: ONE distributed
    exact-percentile aggregate computes the n−1 boundaries (6-dp
    rounded, so the SQL oracle's quantile_cont agrees bit-for-bit), the
    boundary array rides along as a broadcast one-row cross join, and
    bin assignment is a per-row fold — no global sort, no window, the
    corpus never shuffles.  At true 100 TB swap `percentile` for
    `approx_percentile` (same plan shape, sketch-merge agg) — boundaries
    stay a broadcast array either way.

    Rows tie-on-boundary deterministically (bin = 1 + #boundaries ≤
    value, both engines).  Bin populations are equal up to ties: heavy
    mass at one value lands in one bin, honestly uneven.
    """
    ps = [i / n_bins for i in range(1, n_bins)]
    bounds = F.broadcast(
        df.agg(
            F.transform(
                F.expr(f"percentile({col}, array({', '.join(map(str, ps))}))"),
                lambda b: F.round(b, 6),
            ).alias("_bounds")
        )
    )
    return (
        df.crossJoin(bounds)
        .withColumn(
            out,
            (
                F.lit(1)
                + F.size(F.filter("_bounds", lambda b: b <= F.col(col)))
            ),
        )
        .drop("_bounds")
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    default_budget: int = 0,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy per-source TOKEN-budget fill — the data-mixing step as LLM
    pipelines actually specify it (token quotas per source: "3B code
    tokens, 7B web"), where :func:`mixture_sample` keeps document-COUNT
    shares.  Docs are taken in the deterministic ``md5(id)`` order
    (growth/retry-invariant like every sampler here) and a doc is kept
    iff its source's CUMULATIVE whitespace-token count, itself
    included, still fits the budget — the greedy prefix rule: exact,
    integer, engine-replayable (no float rates, no boundary ties).
    Sources absent from ``budgets`` get ``default_budget``.  Returns
    ``(id, group, n_tokens, cum_tokens)`` for kept docs.

    Scale shape: token counting is a codegen'd per-row expression; the
    running sum is ONE source-keyed exchange.  A giant source does NOT
    make the window a straggler at 100 TB: cap useful work first with a
    cheap pre-filter (``deterministic_sample`` at a rate that
    over-covers the budget, or a bucket-count gate), then run the exact
    prefix window on the survivors — the budget bounds how many rows
    can ever be kept, so the pre-filter loses nothing.
    """
    # NULL text must contribute NULL (ignored by the window sum), not
    # legacy sizeOfNull's -1 — a -1 summed into the cumulative budget
    # diverges from the SQL oracle's NULL-skipping SUM on any corpus
    # with null documents
    n_tok = F.when(
        F.col(text_col).isNotNull(),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[^\\s]+"), 0)),
    ).cast("long")
    w = (
        W.partitionBy(group_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    if budgets:
        budget = F.coalesce(
            *[
                F.when(F.col(group_col) == g, F.lit(int(b)))
                for g, b in sorted(budgets.items())
            ],
            F.lit(int(default_budget)),
        ).cast("long")
    else:
        budget = F.lit(int(default_budget)).cast("long")
    out = df.select(F.col(id_col), F.col(group_col), n_tok.alias("n_tokens"))
    out = out.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return out.filter(F.col("cum_tokens") <= budget)


def epoch_shuffle(
    df: DataFrame,
    n_shards: int = 8,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic seeded GLOBAL shuffle for training export — the last
    step before a corpus becomes epoch files: every training run wants the
    docs in a uniformly random order that is (a) different per epoch/seed
    and (b) exactly reproducible across retries and engines (a re-run of a
    crashed export job must produce byte-identical shards).

    The textbook ``ORDER BY rand()`` is both non-reproducible and a single
    global sort.  Here the order key is ``md5(seed || '-' || id)`` — a
    seeded hash, so each seed induces an independent uniform permutation —
    and the global sort is decomposed the way a 100 TB export actually
    runs: ``shard = int(hash[:8]) % n_shards`` (ONE hash-partitioned
    exchange), then an in-shard sort (each shard is written in order by
    its own task; no global merge ever happens because shard boundaries
    are part of the order).  Returns ``(id, shard, pos)`` — ``pos`` is the
    doc's 1-based position within its shard, the global order being
    (shard, pos).

    Scale shape: one exchange on a uniform hash key (no skew possible —
    the key is a hash), one in-partition sort per shard; the corpus rows
    carry only ``id`` + 32 hash chars through the exchange.  md5 keeps the
    DuckDB oracle bit-exact; swap ``xxhash64`` at scale, same algebra.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1 (got {n_shards})")
    h = F.md5(
        F.concat_ws("-", F.lit(int(seed)).cast("string"), F.col(id_col).cast("string"))
    )
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards).cast("int")
    out = df.select(F.col(id_col), shard.alias("shard"), h.alias("_h"))
    w = W.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return (
        out.withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_h")
    )


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Corpus snapshot diff — ``(id, status)`` with status in
    ``added | removed | changed`` (+ ``unchanged`` when asked): the
    change-detection step that decides what an incremental pipeline run
    must reprocess (re-embed, re-dedup, re-pack) after a crawl refresh,
    and the audit artifact for "what moved between snapshot A and B".

    Rows are matched on ``id``; content equality is md5 over the
    ``content_cols`` (default: every non-id column common to both sides,
    in sorted name order) — so only ``(id, 32-char digest)`` ever crosses
    the wire, never document payloads.  The diff itself is ONE full outer
    join on the id key: both sides hash-partition on ``id``, Catalyst
    prunes every column but the id and digest at the scan.  Default output
    drops ``unchanged`` rows (the overwhelming majority between adjacent
    snapshots) so the result is the delta, sized O(changes).
    """
    if content_cols is None:
        shared = set(old.columns) & set(new.columns) - {id_col}
        content_cols = sorted(shared)
    if not content_cols:
        raise ValueError("snapshot_delta needs at least one content column")

    def digest(df: DataFrame) -> F.Column:
        return F.md5(
            F.concat_ws(
                "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in content_cols]
            )
        )

    o = old.select(F.col(id_col).alias("_oid"), digest(old).alias("_oh"))
    n = new.select(F.col(id_col).alias("_nid"), digest(new).alias("_nh"))
    j = o.join(n, o["_oid"] == n["_nid"], "full_outer")
    status = (
        F.when(F.col("_oid").isNull(), F.lit("added"))
        .when(F.col("_nid").isNull(), F.lit("removed"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        F.coalesce(F.col("_nid"), F.col("_oid")).alias(id_col),
        status.alias("status"),
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def quantile_normalize(
    df: DataFrame,
    key: str,
    value: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-key empirical-CDF normalization: each row's value becomes its
    percent-rank WITHIN its key group — the cross-source score
    calibration step of a curation pipeline (a quality score of 12 means
    nothing across sources; "85th percentile of its own source" does).
    Ties share the rank of their first member, exactly SQL
    percent_rank; single-row groups get 0.0.  Rows whose ``value`` is
    NULL are excluded up front — a NULL score has no rank, and leaving
    them in would silently vanish at the equi-join back anyway
    (null != null in Spark joins; ADVICE r10).

    Scale shape: percent_rank is computed on the (key, value)
    DISTINCT-VALUE table, not the row table — count per (key, value),
    one key-partitioned running sum over distinct values, rank joined
    back on the (key, value) equi-key.  A source with 10^10 rows but
    10^5 distinct scores sorts 10^5 rows in its window partition, and
    the row table itself never sorts.  Exact integer arithmetic until
    the one final division (rounded 6 dp).
    """
    df = df.where(F.col(value).isNotNull())
    vc = df.groupBy(key, value).agg(F.count("*").alias("_c"))
    w = (
        W.partitionBy(key)
        .orderBy(value)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wk = W.partitionBy(key)
    ranked = vc.select(
        key,
        value,
        (F.sum("_c").over(w) - F.col("_c") + 1).alias("_rank"),
        F.sum("_c").over(wk).alias("_n"),
    ).select(
        key,
        value,
        F.when(F.col("_n") > 1,
               F.round((F.col("_rank") - 1) / (F.col("_n") - 1), 6))
        .otherwise(F.lit(0.0))
        .alias("q"),
    )
    return df.select(id_col, key, value).join(ranked, [key, value])


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.3,
    target_total: int = 100_000,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """α-temperature source re-balancing — the multilingual-pretraining
    mixture rule (XLM-R, Conneau et al. 2020 §3.1; mBERT's exponential
    smoothing): sampling share q_g ∝ p_g^α where p_g is the group's
    corpus mass.  α=1 keeps natural proportions, α→0 approaches uniform
    across groups — the standard dial for keeping low-resource sources
    from drowning under web-scale majorities.  Unlike
    :func:`mixture_sample` (user-specified shares) the target mixture
    here is DERIVED from the corpus itself, so the same call re-balances
    any corpus without per-source configuration.

    keep_rate(g) = min(1, target_total · q_g / n_g), rounded 9 dp before
    the integer gate (absorbing pow() last-ulp noise, the kmeans oracle
    discipline); membership is the shared hash gate
    ``int(md5(id)[:8]) mod 2^20 < floor(rate · 2^20)`` — reproducible
    across retries, engines, and AQE re-planning.

    Scale shape: the group-count table (group-cardinality-sized) makes
    two tiny broadcast passes (mass total, q normalizer) and broadcasts
    back onto the corpus; the corpus itself is filtered in place — ONE
    aggregate shuffle of group keys, zero corpus shuffles.

    Rows with a NULL ``group_col`` are excluded up front and documented
    here as such: a NULL source has no mixture share, and leaving them
    in would distort the mass total / q normalizer while the equi-join
    back silently dropped them anyway (null != null in Spark joins —
    the quantile_normalize ADVICE-r10 trap, closed r12 for this op).
    """
    df = df.where(F.col(group_col).isNotNull())
    # group-cardinality-sized; materialized once so its three consumers
    # (the mass total, the q normalizer, the rate table) never replay
    # the corpus-sized groupBy — one corpus exchange total
    counts = (
        df.groupBy(group_col).agg(F.count("*").alias("_n_grp")).localCheckpoint(eager=False)
    )
    n_tot = F.broadcast(counts.agg(F.sum("_n_grp").alias("_n_tot")))
    qraw = counts.crossJoin(n_tot).withColumn(
        "_q_raw", F.pow(F.col("_n_grp") / F.col("_n_tot"), F.lit(float(alpha)))
    )
    z = F.broadcast(qraw.agg(F.sum("_q_raw").alias("_z")))
    rates = qraw.crossJoin(z).select(
        group_col,
        F.floor(
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(target_total))
                    * (F.col("_q_raw") / F.col("_z"))
                    / F.col("_n_grp"),
                ),
                9,
            )
            * F.lit(1048576.0)
        )
        .cast("bigint")
        .alias("_gate"),
    )
    h = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % 1048576
    )
    return df.join(F.broadcast(rates), group_col).filter(h < F.col("_gate")).drop("_gate")


def winsorize(
    df: DataFrame,
    key: str,
    value: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    id_col: str = "doc_id",
    approx: bool = False,
) -> DataFrame:
    """Per-key winsorization: clip ``value`` to its key-group
    [``p_lo``, ``p_hi``] exact percentiles — the outlier-robust
    preparation step for any metric that feeds a mean (a single bot
    session or OCR blow-up drags an average; winsorized means don't).
    Clipping (replace with the boundary) rather than trimming (drop)
    keeps row counts — downstream joins stay total.

    Exact ``percentile`` (Spark) ↔ ``quantile_cont`` (DuckDB), the
    value_percentiles pairing; bounds and the clipped value rounded
    6 dp.  NULL values pass through unclipped (no rank to clip to);
    rows with a NULL ``key`` are excluded up front (they have no group
    to clip within, and the equi-join back would silently drop them
    anyway — null != null in Spark joins), so the "keeps row counts"
    guarantee is per NON-NULL key group.

    ``approx=True`` swaps the exact ``percentile`` for
    ``percentile_approx`` (the mergeable GK sketch) with the same 6-dp
    rounding — the 100 TB form SCALE.md prescribes: exact percentile
    keeps per-key distinct-value-sized aggregate state, which for a
    continuous double column is unbounded; the sketch is
    accuracy-bounded constant state per key.  The exact path stays the
    default because it is the oracle-matching (quantile_cont) choice at
    benched scales.

    Scale shape: ONE key-grouped percentile aggregate (map-side partial
    sketch, key-cardinality-sized result) broadcast back onto the
    corpus; the row table never sorts or shuffles.
    """
    df = df.where(F.col(key).isNotNull())
    pct = "percentile_approx" if approx else "percentile"
    bounds = df.groupBy(key).agg(
        F.round(F.expr(f"{pct}({value}, {p_lo!r})"), 6).alias("_lo"),
        F.round(F.expr(f"{pct}({value}, {p_hi!r})"), 6).alias("_hi"),
    )
    clipped = (
        F.when(F.col(value) < F.col("_lo"), F.col("_lo"))
        .when(F.col(value) > F.col("_hi"), F.col("_hi"))
        .otherwise(F.col(value))
    )
    return (
        df.select(id_col, key, value)
        .join(F.broadcast(bounds), key)
        .select(
            id_col,
            key,
            value,
            F.round(clipped, 6).alias("value_winsorized"),
            "_lo",
            "_hi",
        )
        .withColumnsRenamed({"_lo": "p_lo_bound", "_hi": "p_hi_bound"})
    )


def pareto_front(
    df: DataFrame,
    max_col: str,
    min_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """2-D skyline (Börzsönyi 2001): the rows NOT dominated under
    "maximize ``max_col``, minimize ``min_col``" — the multi-objective
    data-selection frontier (e.g. quality vs token cost: a doc is off
    the frontier iff some other doc is at least as good on both axes
    and strictly better on one).  Returns the non-dominated rows as
    (id, max_col, min_col), id ascending for determinism; duplicate
    frontier points (equal on both axes) are all kept — neither
    dominates the other.

    Scale shape — the naive plan (global sort + running min) funnels
    the corpus through ONE partition, so instead:

    1. per-(distinct ``max_col`` value) min of ``min_col`` — a
       distinct-value-sized count-table reduce (the ks_drift
       discipline; 6-dp-quantized scores keep it bounded);
    2. the strictly-descending prefix min over that table (the only
       window — distinct-value-sized, never corpus-sized);
    3. broadcast-join the (value → group-min, strict-higher-prefix-min)
       table back and filter: a row survives iff its ``min_col`` equals
       its value-group's min AND beats every strictly-higher value's
       min.  The corpus is scanned once and never sorted or shuffled
       (``n_buckets`` reserved for a quantile-bucketed step-1 when
       ``max_col`` is continuous and unquantized).

    Equivalence to pairwise dominance: a dominator with the SAME
    ``max_col`` exists iff min_col > group-min; one with strictly
    higher ``max_col`` exists iff min_col ≥ some higher group's min,
    i.e. ≥ the strict prefix min — together exactly NOT EXISTS
    (q' ≥ q ∧ t' ≤ t ∧ (q' > q ∨ t' < t)).
    """
    q = F.col(max_col)
    t = F.col(min_col)
    base = df.where(q.isNotNull() & t.isNotNull())
    gm = base.groupBy(q.alias("_q")).agg(F.min(t).alias("_gmin"))
    wb = W.orderBy(F.col("_q").desc()).rowsBetween(W.unboundedPreceding, -1)
    marks = gm.select(
        "_q",
        "_gmin",
        F.min("_gmin").over(wb).alias("_pmin"),
    )
    return (
        base.join(F.broadcast(marks), q == F.col("_q"))
        .where(
            (t == F.col("_gmin"))
            & (F.col("_pmin").isNull() | (t < F.col("_pmin")))
        )
        .select(id_col, max_col, min_col)
        .orderBy(id_col)
    )


def conformal_threshold(
    df: DataFrame,
    score_col: str,
    group_col: str | None = None,
    alpha: float = 0.1,
) -> DataFrame:
    """Split-conformal calibration threshold (Vovk 2005; Angelopoulos &
    Bates 2021 §2): given held-out nonconformity scores, the cutoff

        q̂ = the ⌈(n+1)(1−α)⌉-th smallest score

    guarantees P(new score ≤ q̂) ≥ 1 − α for an exchangeable draw —
    the distribution-free prediction-set radius, and for a data
    pipeline the principled "auto-threshold": flag any incoming row
    whose outlier/novelty score exceeds q̂ and at most α of clean
    traffic alarms.  Per group (or one global row when ``group_col``
    is None): (group?, n, k, threshold) with threshold rounded 6 dp and
    NULL when k > n (n < ⌈1/α⌉ − 1 scores can't certify the level —
    the standard finite-sample failure, surfaced instead of clamped).
    NULL scores are excluded; the (n+1) in the rank is what
    distinguishes the conformal quantile from a naive empirical one.

    Scale shape: scores reduce map-side to the per-(group, distinct
    value) count table (the ks_drift discipline), the cumulative rank
    runs group-partitioned over THAT table, and the threshold pick is
    one filter + min per group.  Exact integer ranks — no interpolating
    percentile; the k-th order statistic is what the guarantee is
    proved for.
    """
    g = F.col(group_col) if group_col else F.lit(0)
    vc = (
        df.where(F.col(score_col).isNotNull())
        .groupBy(g.alias("_g"), F.col(score_col).alias("_v"))
        .agg(F.count("*").alias("_c"))
    )
    out = conformal_from_counts(
        vc.select(F.col("_g").alias("g"), F.col("_v").alias("v"), F.col("_c").alias("cnt")),
        alpha=alpha,
        group_out_col=group_col if group_col else "group",
    )
    return out.orderBy(out.columns[0]) if group_col else out.drop("group")


def conformal_from_counts(
    vc: DataFrame,
    alpha: float = 0.1,
    group_out_col: str = "group",
) -> DataFrame:
    """Counts-based core of :func:`conformal_threshold`, shared with the
    streaming leg (``streaming.ingest.stream_conformal``) so both price
    the IDENTICAL pick (the ``ks_from_counts`` factoring).  Input is a
    per-(group, distinct value) count table ``(g, v, cnt)``; NULL
    scores must already be excluded.  Count tables from separate
    increments UNION + re-reduce before calling — every component is a
    semigroup, so the threshold over any epoch window never touches
    raw rows."""
    wcum = (
        W.partitionBy("g").orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = vc.select(
        "g",
        "v",
        F.sum("cnt").over(wcum).alias("_cum"),
        F.sum("cnt").over(W.partitionBy("g")).alias("_n"),
    )
    a = float(alpha)
    k = F.ceil((F.col("_n") + 1) * F.lit(1.0 - a)).cast("long")
    picked = (
        ranked.withColumn("_k", k)
        .groupBy("g", "_n", "_k")
        .agg(
            F.min(F.when(F.col("_cum") >= F.col("_k"), F.col("v"))).alias("_thr")
        )
    )
    return picked.select(
        F.col("g").alias(group_out_col),
        F.col("_n").alias("n"),
        F.col("_k").alias("k"),
        F.when(F.col("_k") <= F.col("_n"), F.round(F.col("_thr"), 6)).alias(
            "threshold"
        ),
    )
