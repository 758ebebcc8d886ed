"""Market-basket affinity mining over (basket, item) pair lists.

Association rules (Agrawal & Srikant 1994, the pairwise tier) answer the
curation question the co-occurrence counts alone do not: which item's
presence PREDICTS another's, normalized for both items' base rates
(lift), not just raw co-frequency.  The same shape mines tag/topic
affinity in a document corpus or co-fired-rule affinity in a quality
pipeline.

Scale shape: the classic apriori prune is load-bearing — items below
min-support are dropped BEFORE pair generation (a broadcast semi-join),
so a basket of size b contributes C(b',2) pairs only over its b'
frequent items, and the pair space is bounded by the frequent-item
vocabulary squared, not the raw item vocabulary.  Pair generation is a
basket-keyed self equi-join (shuffle key = basket id, never a cross
product); the per-item count tables that price confidence/lift ride
along as broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def assoc_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
    k: int = 100,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Top-``k`` pairwise association rules by lift.

    ``support(a,b)`` = |baskets containing both| / |baskets|;
    ``confidence(a->b)`` = support(a,b) / support(a);
    ``lift`` = support(a,b) / (support(a) * support(b)).
    Every qualifying unordered pair emits BOTH rule directions (same
    support/lift, different confidence).  Rules are rounded 6 dp and
    ordered (lift desc, antecedent, consequent) with a deterministic
    limit — the tiebreak makes the top-k reproducible across shuffle
    orders.

    ``max_basket_size`` (VERDICT r10 #4, the ``adamic_adar``
    ``max_center_degree`` discipline): the apriori prune bounds the
    VOCABULARY, but one pathological mega-basket — a bot session
    touching every frequent item — still fans out C(|basket ∩
    frequent|, 2) pairs, quadratic in ITS size.  When set, baskets with
    more than ``max_basket_size`` frequent items are dropped from pair
    EVIDENCE before the self-join (they still count in the basket
    universe and the item base rates — dropping a bot basket removes
    its co-occurrence votes, not the denominator).  The dropped-basket
    count is surfaced as a Python warning.
    """
    import warnings
    # Materialized once: its four consumers (the basket total, the item
    # counts, and both sides of the pair self-join) are separate jobs —
    # without the cut each replays the corpus-sized distinct.  This IS
    # the operator's working set (the dedup'd basket-item list).
    items = (
        baskets.select(
            F.col(basket_col).alias("b"), F.col(item_col).alias("i")
        )
        .where(F.col(item_col).isNotNull())
        .distinct()
        .localCheckpoint(eager=False)  # lineage cut; materialized in-job
    )
    n_b = F.broadcast(items.agg(F.countDistinct("b").alias("n_baskets")))

    counts = items.groupBy("i").agg(F.count("*").alias("n_i"))
    # Vocab-sized; materialized once so its three consumers (the prune
    # semi-join and both pricing joins) never replay the corpus count,
    # and n_baskets rides along instead of re-deriving via a second
    # corpus pass.  With a mega-basket cap the big.count() below is an
    # early blocking action that materializes this cut (and ``items``)
    # before any broadcast build; WITHOUT the cap there is no such
    # anchor, and AQE's concurrently-materialized broadcast futures
    # (kept's semi-join plus ca/cb) would each find a lazy cut empty and
    # replay the corpus-sized distinct — the cms_topk race — so that
    # path checkpoints eagerly.
    frequent = F.broadcast(
        counts.crossJoin(n_b)
        .where(F.col("n_i") >= F.col("n_baskets") * F.lit(min_support))
        .localCheckpoint(eager=max_basket_size is None)
    )
    kept = items.join(frequent.select("i"), "i")
    if max_basket_size is not None:
        # the oversized set is (near-)empty in healthy data, so it
        # broadcasts; the cap lands BEFORE the pair self-join by
        # construction, bounding every basket's fan-out at C(cap, 2)
        big = (
            kept.groupBy("b")
            .agg(F.count("*").alias("_bs"))
            .where(F.col("_bs") > F.lit(max_basket_size))
            .select("b")
            .localCheckpoint(eager=False)  # n_big.count() materializes it
        )
        n_big = big.count()
        if n_big:
            warnings.warn(
                f"assoc_rules: dropped {n_big} basket(s) with more than "
                f"{max_basket_size} frequent items from pair evidence "
                "(mega-basket cap)",
                stacklevel=2,
            )
        kept = kept.join(F.broadcast(big), "b", "left_anti")

    left = kept.select("b", F.col("i").alias("ia"))
    right = kept.select("b", F.col("i").alias("ib"))
    pair_n = (
        left.join(right, "b")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("n_ab"))
    )

    ca = frequent.select(
        F.col("i").alias("ia"), F.col("n_i").alias("n_a"), "n_baskets"
    )
    cb = frequent.select(F.col("i").alias("ib"), F.col("n_i").alias("n_b2"))
    # Materialize the priced pair table before emitting both rule
    # directions: it is frequent-vocab²-bounded (tiny), and without the
    # cut the union's two branches would each replay the corpus-sized
    # basket self-join — the static plan showed 46 shuffles vs 7 here.
    # n_baskets rides in via ca, so no second corpus pass for the total.
    priced = (
        pair_n.join(ca, "ia")
        .join(cb, "ib")
        .where(F.col("n_ab") >= F.col("n_baskets") * F.lit(min_support))
        .localCheckpoint(eager=False)
    )

    def _rule(ant, cons, n_ant):
        return priced.select(
            F.col(ant).alias("antecedent"),
            F.col(cons).alias("consequent"),
            F.col("n_ab").alias("pair_n"),
            F.round(F.col("n_ab") / F.col("n_baskets"), 6).alias("support"),
            F.round(F.col("n_ab") / F.col(n_ant), 6).alias("confidence"),
            F.round(
                F.col("n_ab") * F.col("n_baskets") / (F.col("n_a") * F.col("n_b2")),
                6,
            ).alias("lift"),
        )

    rules = _rule("ia", "ib", "n_a").union(_rule("ib", "ia", "n_b2"))
    return rules.orderBy(
        F.col("lift").desc(), "antecedent", "consequent"
    ).limit(k)
