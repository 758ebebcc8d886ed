"""Skew-handling join utilities.

AQE's skew-join splitting handles most skew at runtime; explicit salting is
the deterministic fallback when one join key dominates (the classic 100 TB
failure: one hot user/metric key pins a single task).  `salted_join`
replicates the small side ``salt`` times and scatters the big side's hot
rows across salt buckets, turning one oversized partition into ``salt``
even ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with ``salt``-way key scattering.

    big gets a content-derived salt in [0, salt); small is exploded to all
    salts — small side grows ×salt (must stay broadcast-size × salt), big
    side's shuffle keys become (key, salt) so a hot key spreads over
    ``salt`` reducers.  Result equals the unsalted join.

    The salt is ``pmod(xxhash64(key, row-content), salt)``, not ``rand()``:
    deterministic under AQE re-planning and task retries (a retried task
    re-derives identical salts, so no row is double-counted or lost), while
    still scattering a hot key because the hash mixes the non-key columns.
    """
    if how not in ("inner", "left", "left_outer"):
        # right/full/semi/anti would surface the exploded small side's
        # unmatched ×salt replicas (or dedup semantics) — result would NOT
        # equal the unsalted join
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    mix = [F.col(c) for c in big.columns]
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(*mix), F.lit(salt)).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")


def bloom_bitmap(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 16, num_hashes: int = 3
) -> DataFrame:
    """ONE-row DataFrame holding a Bloom filter of ``keys[key_col]`` as a
    dense ``array<long>`` of ``m_bits/64`` words (8 KiB at the default
    2^16 bits — broadcast-trivial).

    Built fully distributed: each key sets ``num_hashes`` bit positions
    (position_i = 16-bit slice i of md5(key) — md5 so a SQL engine can
    reproduce it; swap xxhash64 when cross-engine replay is not needed),
    a groupBy-word ``bit_or`` merges them (idempotent, so duplicate keys
    need no pre-distinct), and one map-backed ``transform`` densifies the
    ≤1024 words.  Nothing ever touches the driver.
    """
    if m_bits & (m_bits - 1) or not 64 <= m_bits <= 1 << 16:
        raise ValueError("m_bits must be a power of two in [64, 65536]")
    if not 1 <= num_hashes <= 8:
        raise ValueError("num_hashes must be in [1, 8] (md5 yields 8 16-bit slices)")
    n_words = m_bits // 64
    h = F.md5(F.col(key_col).cast("string"))
    pos = [
        F.pmod(F.conv(F.substring(h, 4 * i + 1, 4), 16, 10).cast("int"), F.lit(m_bits))
        for i in range(num_hashes)
    ]
    hits = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (p / 64).cast("int").alias("_w"),
                        F.pmod(p, F.lit(64)).alias("_b"),
                    )
                    for p in pos
                ]
            )
        ).alias("pb")
    ).select("pb._w", F.expr("shiftleft(1L, pb._b)").alias("_m"))
    words = hits.groupBy("_w").agg(F.expr("bit_or(_m)").alias("_mask"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("_w", "_mask"))).alias("_bm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda w: F.coalesce(F.element_at(F.col("_bm"), w), F.lit(0).cast("long")),
        ).alias("_bloom")
    )


def bloom_semijoin(
    big: DataFrame,
    keys: DataFrame,
    on: str,
    m_bits: int = 1 << 16,
    num_hashes: int = 3,
) -> DataFrame:
    """EXACT left-semi join ``big ⋉ keys`` on ``on`` with a Bloom-filter
    pre-filter — the explicit form of a runtime filter (what
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects when its
    heuristics fire, here guaranteed and engine-portable).

    Why it matters at 100 TB: a plain semi join shuffles the ENTIRE big
    side on the join key before any row can be rejected.  The bitmap is
    a one-row broadcast evaluated map-side as a pure row expression, so
    non-matching rows (typically the vast majority for a selective key
    set) die before the exchange; only Bloom survivors — true matches
    plus an ~(1−e^{−kn/m})^k false-positive sliver — pay shuffle I/O.
    The trailing exact semi join scrubs the false positives, so the
    result equals the plain semi join row-for-row (Bloom filters have no
    false negatives), and the oracle is plain ANSI ``IN``/``EXISTS``.

    Sizing: 2^16 bits / 3 hashes holds ~5k keys at ≲1% FP; the 16-bit
    position cap exists so md5 slices stay SQL-replayable — a production
    variant uses xxhash64 positions and grows m with |keys| (a 100M-key
    filter is ~120 MB, still an ordinary broadcast).
    """
    bm = bloom_bitmap(keys.select(on), on, m_bits, num_hashes)
    h = F.md5(F.col(on).cast("string"))
    probe = big.crossJoin(F.broadcast(bm))
    cond = F.lit(True)
    for i in range(num_hashes):
        p = F.pmod(F.conv(F.substring(h, 4 * i + 1, 4), 16, 10).cast("int"), F.lit(m_bits))
        probe = probe.withColumn(f"_p{i}", p)
        cond = cond & F.expr(
            f"(element_at(_bloom, cast(_p{i} / 64 as int) + 1)"
            f" & shiftleft(1L, _p{i} % 64)) != 0"
        )
    pre = probe.filter(cond).drop("_bloom", *[f"_p{i}" for i in range(num_hashes)])
    return pre.join(keys.select(on).distinct(), on, "left_semi")


def skew_profile(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Key-distribution diagnostics — the table you read BEFORE paying
    for a shuffle on ``key_col``: the top-``k`` keys with their share of
    all rows, plus the distinct-key count and the Herfindahl
    concentration index (HHI = Σ share²; 1/n_keys for uniform keys, →1
    as one key dominates).  A share ≳ 1/parallelism means that key pins
    a task: reach for :func:`salted_join` / AQE skew splitting.

    Shapes: one count aggregate (map-side combined), a k-heap for the
    top keys, and scalar aggregates that ride along as a broadcast
    one-row cross join.  HHI is computed as Σcnt²/total² with the
    sum-of-squares in EXACT integer arithmetic — a float Σshare² is
    summation-order dependent (cross-engine ulp drift), and per-key
    counts are longs anyway.  Overflow note: Σcnt² needs
    Σcnt² < 2^63 — safe while the hottest key holds < ~3e9 rows;
    beyond that, pre-scale counts (the diagnostic needs 6 digits, not
    exactness).
    """
    counts = df.groupBy(F.col(key_col)).agg(F.count("*").alias("cnt"))
    tot = F.broadcast(
        counts.agg(
            F.sum("cnt").alias("_total"),
            F.count("*").alias("n_keys"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("_sumsq"),
        )
    )
    return (
        counts.orderBy(F.col("cnt").desc(), F.col(key_col).asc())
        .limit(k)
        .crossJoin(tot)
        .select(
            key_col,
            "cnt",
            F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
            "n_keys",
            F.round(F.col("_sumsq") / F.col("_total") / F.col("_total"), 6).alias(
                "hhi"
            ),
        )
    )
