"""Deterministic and stratified sampling properties."""

from pyspark.sql import functions as F

from time_series_databse_engine_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
)
from time_series_databse_engine_spark.sources import load_table


def test_deterministic_sample_reproducible_and_near_rate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    s1 = {r.doc_id for r in deterministic_sample(docs, 2).select("doc_id").collect()}
    s2 = {r.doc_id for r in deterministic_sample(docs, 2).select("doc_id").collect()}
    assert s1 == s2
    # 2/16 expected rate, loose binomial bound
    assert 0.05 < len(s1) / n < 0.22
    # membership is stable under subsetting (incremental-rerun property)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    s_half = {r.doc_id for r in deterministic_sample(half, 2).select("doc_id").collect()}
    assert s_half == {d for d in s1 if d % 2 == 0}


def test_stratified_sample_exact_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, "lang", n_per_stratum=7)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, sz in sizes.items():
        assert counts[lang] == min(7, sz)


def test_hash_split_disjoint_stable_and_growth_invariant(spark):
    """Splits partition the corpus disjointly, assignment is identical on
    re-evaluation, and adding rows never reassigns existing ids."""
    from time_series_databse_engine_spark.operators.sampling import hash_split

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in hash_split(df).collect()}
    b = {r.doc_id: r.split for r in hash_split(df).collect()}
    assert a == b
    assert set(a.values()) == {"train", "val", "test"}
    grown = spark.range(400).withColumnRenamed("id", "doc_id")
    g = {r.doc_id: r.split for r in hash_split(grown).collect()}
    assert all(g[i] == a[i] for i in a)  # growth never reassigns
    # ~1/16 val, ~1/16 test (loose bounds at n=400)
    from collections import Counter

    c = Counter(g.values())
    assert 5 <= c["val"] <= 60 and 5 <= c["test"] <= 60


def test_hash_split_rejects_overallocated_ranges(spark):
    import pytest

    from time_series_databse_engine_spark.operators.sampling import hash_split

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="at least one"):
        hash_split(df, val_16ths=10, test_16ths=6)


def test_importance_sample_deterministic_and_weight_sensitive(spark):
    """The Gumbel draw is reproducible across calls; an overwhelming
    weight is always selected; low temperature sharpens toward the
    top weights."""
    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.operators.sampling import importance_sample

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 7, 100.0).otherwise(F.col("id") % 5 * 0.1).alias(
            "importance_weight"
        ),
    )
    a = sorted(r.doc_id for r in importance_sample(df, k=20).collect())
    b = sorted(r.doc_id for r in importance_sample(df, k=20).collect())
    assert a == b and len(a) == 20
    assert 7 in a                       # overwhelming weight always survives
    sharp = {r.doc_id for r in importance_sample(df, k=20, temperature=0.01).collect()}
    # at near-zero temperature the draw degenerates to top-k by weight:
    # weights 0.4 (id%5==4) dominate — count how many selected ids have max weight
    frac_top = sum(1 for i in sharp if i == 7 or i % 5 == 4) / 20
    assert frac_top >= 0.9


def test_mixture_sample_hits_target_mixture_and_caps_small_groups(spark):
    """A 3-group corpus rebalanced to 50/25/25 of a 200-doc target: big
    groups land within hash noise of their quota, a group smaller than
    its quota is kept whole, an unlisted group is dropped, and the gate
    is reproducible."""
    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.operators.sampling import mixture_sample

    df = spark.range(1100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, "web")
        .when(F.col("id") < 1000, "code")
        .when(F.col("id") < 1030, "books")
        .otherwise("junk")
        .alias("source"),
    )
    kept = mixture_sample(
        df, {"web": 0.5, "code": 0.25, "books": 0.25}, target_total=200
    )
    counts = {r["source"]: r["n"] for r in kept.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    assert "junk" not in counts
    assert counts["books"] == 30                      # quota 50 > group size: keep all
    assert abs(counts["web"] - 100) <= 25             # rate 0.2 of 500, hash noise
    assert abs(counts["code"] - 50) <= 20             # rate 0.1 of 500
    again = {r["source"]: r["n"] for r in mixture_sample(
        df, {"web": 0.5, "code": 0.25, "books": 0.25}, target_total=200
    ).groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == again


def test_upsample_with_replacement_rates_and_stable_keys(spark):
    """A small group with quota 6x its size gets ~6 copies per doc, an
    unlisted group keeps exactly one copy, (id, copy_idx) is unique, and
    the draw is reproducible."""
    from pyspark.sql import functions as F

    from time_series_databse_engine_spark.operators.sampling import (
        upsample_with_replacement,
    )

    df = spark.range(550).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 50, "books").otherwise("web").alias("source"),
    )
    up = upsample_with_replacement(df, {"books": 1.0}, target_total=280)
    counts = {r["source"]: r["n"] for r in up.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    assert counts["web"] == 500                       # rate 1: untouched
    # books rate = 280/50 = 5.6 -> between 5 and 6 copies each, ~280 total
    assert 250 <= counts["books"] <= 300
    per_doc = up.filter("source = 'books'").groupBy("doc_id").count().collect()
    assert all(r["count"] in (5, 6) for r in per_doc)
    assert up.select("doc_id", "copy_idx").distinct().count() == up.count()
    assert up.count() == upsample_with_replacement(
        df, {"books": 1.0}, target_total=280).count()


def test_weighted_sample_favors_heavy_rows_and_is_stable(spark):
    """ES race: heavy rows win far more often than light ones; the draw is
    identical across reruns; non-positive weights never selected."""
    from time_series_databse_engine_spark.operators.sampling import weighted_sample

    rows = [(i, 1000.0 if i < 20 else 1.0) for i in range(500)]
    rows.append((999, -5.0))
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, k=30, weight_col="w", id_col="doc_id")
    ids = [r["doc_id"] for r in got.collect()]
    assert 999 not in ids
    heavy = sum(1 for i in ids if i < 20)
    assert heavy >= 15  # 20 heavy rows carry ~80% of total weight
    again = [r["doc_id"] for r in weighted_sample(df, 30, "w", "doc_id").collect()]
    assert ids == again


def test_equidepth_bins_balanced_and_tie_stable(spark):
    from time_series_databse_engine_spark.operators.sampling import equidepth_bins

    # 1000 distinct values -> deciles of exactly 100 (up to boundary ties)
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "id int, score double"
    )
    out = equidepth_bins(df, "score", n_bins=10)
    sizes = {r.bin: r.n for r in out.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == set(range(1, 11))
    assert all(80 <= n <= 120 for n in sizes.values())
    # bins are monotone in score
    rows = out.orderBy("score").collect()
    assert all(a.bin <= b.bin for a, b in zip(rows, rows[1:]))
    # heavy mass at one value lands in ONE bin (honestly uneven)
    heavy = spark.createDataFrame(
        [(i, 5.0 if i < 900 else float(i)) for i in range(1000)], "id int, score double"
    )
    hout = equidepth_bins(heavy, "score", n_bins=10)
    one = hout.filter(F.col("score") == 5.0).select("bin").distinct().collect()
    assert len(one) == 1


def test_token_budget_sample_greedy_prefix_semantics(spark):
    """Budgets fill greedily in md5(id) order: the doc that would cross
    its source's budget is excluded (cumulative-<= rule), oversized
    budgets keep the whole source, absent sources get the default, and
    the selection is rerun-stable."""
    from time_series_databse_engine_spark.operators.sampling import (
        token_budget_sample,
    )

    rows = [
        (i, "a", "tok " * 10) for i in range(10)         # 10 docs x 10 tokens
    ] + [
        (100 + i, "b", "x y z") for i in range(3)         # 3 docs x 3 tokens
    ] + [
        (200 + i, "c", "one two") for i in range(4)       # default-budget source
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    out = token_budget_sample(df, {"a": 35, "b": 1000}, default_budget=2)
    got = {r.source: sorted((x.doc_id, x.cum_tokens) for x in rs)
           for r, rs in [(r, [x for x in out.collect() if x.source == r.source])
                         for r in out.select("source").distinct().collect()]}
    # source a: 10-token docs -> exactly 3 fit in 35 (cum 10,20,30; 40 > 35);
    # which three doc_ids is md5-order-dependent, the cum set is not
    a = got["a"]
    assert len(a) == 3 and sorted(c for _, c in a) == [10, 20, 30]
    # source b: budget exceeds total -> all kept
    assert len(got["b"]) == 3
    # source c: default budget 2 < every doc's 2-token... 2 <= 2 -> first doc kept
    assert len(got["c"]) == 1 and got["c"][0][1] == 2
    # rerun-stable: same rows both times
    again = token_budget_sample(df, {"a": 35, "b": 1000}, default_budget=2)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_token_budget_sample_null_text_matches_sql_semantics(spark):
    """A NULL text contributes NULL tokens (skipped by the window sum),
    never legacy sizeOfNull's -1 — checked by running the oracle-shaped
    SQL in DuckDB on the same rows and comparing kept sets exactly
    (ADVICE r6: -1 summed into the budget diverged from the oracle on
    any corpus containing null documents)."""
    import duckdb
    import pandas as pd

    from time_series_databse_engine_spark.operators.sampling import (
        token_budget_sample,
    )

    rows = [(1, "a", None), (2, "a", "t1 t2 t3"), (3, "a", "u1 u2"),
            (4, "a", None), (5, "a", "v1 v2 v3 v4"), (6, "b", None)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = token_budget_sample(df, {"a": 5, "b": 5}).select(
        "doc_id", "source", "n_tokens", "cum_tokens"
    )
    got = sorted(map(tuple, out.collect()))

    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(
        map(
            tuple,
            con.execute(
                r"""
        WITH t AS (SELECT doc_id, source,
                          CAST(len(regexp_extract_all(text, '[^\s]+'))
                               AS BIGINT) AS n_tokens
                   FROM documents),
        c AS (SELECT doc_id, source, n_tokens,
                     CAST(sum(n_tokens) OVER (
                         PARTITION BY source
                         ORDER BY md5(doc_id::VARCHAR), doc_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
              FROM t)
        SELECT doc_id, source, n_tokens, cum_tokens FROM c
        WHERE cum_tokens <= 5"""
            ).fetchall(),
        )
    )
    assert got == want
    # and a null-text doc never burns budget: all three non-null 'a'
    # docs (3+2+4 = 9 > 5 -> greedy prefix in md5 order) are judged on
    # real tokens only
    a_kept = [r for r in got if r[1] == "a" and r[2] is not None]
    assert sum(r[2] for r in a_kept) <= 5


def test_epoch_shuffle_is_a_permutation_seeded_and_uniform(spark):
    """(shard, pos) is a bijection over the input ids, different seeds give
    different orders, the same seed is bit-stable across re-evaluation,
    and shard sizes are near-uniform (the key is a hash)."""
    from time_series_databse_engine_spark.operators.sampling import epoch_shuffle

    df = spark.range(400).withColumnRenamed("id", "doc_id")
    a = epoch_shuffle(df, n_shards=8, seed=1).collect()
    assert len(a) == 400 and len({r.doc_id for r in a}) == 400
    # (shard, pos) positions are dense 1..|shard| per shard => global order
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # near-uniform shard sizes (400/8 = 50 expected; loose bound)
    assert all(25 <= len(p) <= 75 for p in by_shard.values())
    # reproducible; seed-sensitive
    b = epoch_shuffle(df, n_shards=8, seed=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = {(r.doc_id): (r.shard, r.pos) for r in epoch_shuffle(df, n_shards=8, seed=2).collect()}
    moved = sum(1 for r in a if c[r.doc_id] != (r.shard, r.pos))
    assert moved > 300  # a different seed reorders nearly everything
    import pytest

    with pytest.raises(ValueError):
        epoch_shuffle(df, n_shards=0)


def test_epoch_shuffle_single_exchange(spark):
    """The export plan is ONE hash exchange (the shard key) — no global
    sort, no second shuffle."""
    from time_series_databse_engine_spark.operators.sampling import epoch_shuffle
    from time_series_databse_engine_spark.plans import num_shuffle_exchanges

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    assert num_shuffle_exchanges(epoch_shuffle(df, n_shards=8, seed=3)) == 1


def test_snapshot_delta_classes_and_null_content(spark):
    """added/removed/changed are each detected; unchanged rows are dropped
    by default and kept on request; a null->value content transition is a
    change (the coalesce sentinel), not a silent match."""
    from time_series_databse_engine_spark.operators.sampling import snapshot_delta

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "now-set"), (5, "e")], "doc_id long, text string"
    )
    got = {r.doc_id: r.status for r in snapshot_delta(old, new).collect()}
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}
    full = {
        r.doc_id: r.status
        for r in snapshot_delta(old, new, include_unchanged=True).collect()
    }
    assert full[1] == "unchanged" and len(full) == 5
    import pytest

    with pytest.raises(ValueError):
        snapshot_delta(old.select("doc_id"), new.select("doc_id"))


def test_snapshot_delta_multi_column_digest_order_is_name_sorted(spark):
    """Default content_cols = sorted shared non-id columns: a change in
    ANY shared column flags the row, and column discovery ignores columns
    present on only one side."""
    from time_series_databse_engine_spark.operators.sampling import snapshot_delta

    old = spark.createDataFrame(
        [(1, "a", "x", 7)], "doc_id long, text string, lang string, extra_old int"
    )
    new = spark.createDataFrame(
        [(1, "a", "y", 1.5)], "doc_id long, text string, lang string, extra_new double"
    )
    got = {r.doc_id: r.status for r in snapshot_delta(old, new).collect()}
    assert got == {1: "changed"}  # lang x->y flags; extra_* ignored
    same = spark.createDataFrame(
        [(1, "a", "x", 1.5)], "doc_id long, text string, lang string, extra_new double"
    )
    assert snapshot_delta(old, same).count() == 0


def test_group_kfold_one_fold_per_group_and_growth_invariant(spark):
    """Every group maps to exactly one fold; a group's fold is unchanged
    by corpus growth (the sklearn-GroupKFold failure mode); folds cover
    the range and are roughly balanced; k < 2 raises."""
    import pytest

    from time_series_databse_engine_spark.operators.sampling import group_kfold

    rows = [(i, i % 40) for i in range(400)]  # 40 groups x 10 rows
    df = spark.createDataFrame(rows, "doc_id long, grp long")
    out = group_kfold(df, k=5, group_col="grp").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], set()).add(r["fold"])
    assert all(len(s) == 1 for s in by_grp.values())
    assert all(0 <= next(iter(s)) < 5 for s in by_grp.values())
    folds = {next(iter(s)) for s in by_grp.values()}
    assert len(folds) >= 4  # 40 hashed groups cover ~all 5 folds

    # growth invariance: half the corpus assigns identical folds
    half = group_kfold(df.filter("doc_id < 200"), k=5, group_col="grp").collect()
    for r in half:
        assert next(iter(by_grp[r["grp"]])) == r["fold"]

    with pytest.raises(ValueError):
        group_kfold(df, k=1, group_col="grp")


def test_assoc_rules_planted_affinity(spark):
    """x and y co-occur always (lift > 1), z is independent filler, and a
    below-min-support item never reaches pair generation."""
    from time_series_databse_engine_spark.operators.baskets import assoc_rules

    rows = []
    for b in range(10):
        rows += [(b, "x"), (b, "y")]          # perfect pair
        if b % 2 == 0:
            rows.append((b, "z"))             # half the baskets
    rows.append((0, "rare"))                  # 1/10 < min_support=0.2
    df = spark.createDataFrame(rows, "b int, i string")
    out = assoc_rules(df, "b", "i", min_support=0.2, k=10).collect()
    rules = {(r.antecedent, r.consequent): r for r in out}
    assert not any("rare" in k for r in rules for k in r)
    xy = rules[("x", "y")]
    assert xy.support == 1.0 and xy.confidence == 1.0 and xy.lift == 1.0
    xz = rules[("x", "z")]
    # z in 5 of 10 baskets, always with x: conf(x->z)=0.5, lift=1.0
    assert xz.support == 0.5 and xz.confidence == 0.5 and xz.lift == 1.0
    zx = rules[("z", "x")]
    assert zx.confidence == 1.0 and zx.pair_n == 5
    # both directions of every pair emitted
    assert set(rules) == {("x", "y"), ("y", "x"), ("x", "z"), ("z", "x"),
                          ("y", "z"), ("z", "y")}


def test_assoc_rules_mega_basket_cap(spark):
    """VERDICT r10 #4: a basket exceeding max_basket_size frequent items
    is dropped from pair EVIDENCE before the self-join (warning raised),
    while the basket universe and item base rates keep counting it."""
    import warnings

    from time_series_databse_engine_spark.operators.baskets import assoc_rules

    rows = []
    for b in range(10):
        rows += [(b, "x"), (b, "y")]
    # basket 99: a bot touching x, y AND five otherwise-absent items —
    # with the cap at 3 its evidence must vanish entirely
    rows += [(99, i) for i in ("x", "y", "p", "q", "r", "s", "t")]
    df = spark.createDataFrame(rows, "b int, i string")

    uncapped = {(r.antecedent, r.consequent)
                for r in assoc_rules(df, "b", "i", min_support=0.0, k=1000).collect()}
    assert ("p", "q") in uncapped  # the bot's pairs exist uncapped

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        capped = {(r.antecedent, r.consequent): r
                  for r in assoc_rules(df, "b", "i", min_support=0.0,
                                       k=1000, max_basket_size=3).collect()}
    assert any("mega-basket cap" in str(x.message) for x in w)
    # bot-only pairs gone; (x, y) survives from the 10 honest baskets
    assert not any(a in "pqrst" or c in "pqrst" for a, c in capped)
    xy = capped[("x", "y")]
    # denominators unchanged: 11 baskets, x in 11 of them — the bot
    # basket still counts in support/confidence denominators
    assert xy.pair_n == 10
    assert xy.support == round(10 / 11, 6)
    assert xy.confidence == round(10 / 11, 6)

    # a cap no basket exceeds is a no-op (entry/oracle parity shape)
    loose = {(r.antecedent, r.consequent): (r.pair_n, r.support)
             for r in assoc_rules(df, "b", "i", min_support=0.0,
                                  k=1000, max_basket_size=100).collect()}
    base = {(r.antecedent, r.consequent): (r.pair_n, r.support)
            for r in assoc_rules(df, "b", "i", min_support=0.0, k=1000).collect()}
    assert loose == base


def test_quantile_normalize_percent_rank_semantics(spark):
    from time_series_databse_engine_spark.operators.sampling import quantile_normalize

    rows = [
        # source a: values 10, 20, 20, 40 -> ranks 1, 2, 2, 4 of n=4
        (1, "a", 10), (2, "a", 20), (3, "a", 20), (4, "a", 40),
        # source b: single row -> q = 0
        (5, "b", 99),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r.doc_id: r.q for r in quantile_normalize(df, "source", "n_chars").collect()}
    assert out[1] == 0.0
    assert out[2] == out[3] == round(1 / 3, 6)  # ties share first rank
    assert out[4] == 1.0
    assert out[5] == 0.0


def test_quantile_normalize_null_values_excluded(spark):
    """ADVICE r10: NULL values are excluded explicitly (documented), not
    silently lost at the join back — and they don't perturb the ranks of
    the non-NULL rows."""
    from time_series_databse_engine_spark.operators.sampling import quantile_normalize

    rows = [(1, "a", 10), (2, "a", None), (3, "a", 40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r.doc_id: r.q for r in quantile_normalize(df, "source", "n_chars").collect()}
    assert out == {1: 0.0, 3: 1.0}


def test_temperature_mix_lifts_minority(spark):
    """α<1 lifts the minority source's keep share above its natural
    proportion; α=1 reproduces natural proportions (rates equal across
    groups when budget scales); membership is deterministic."""
    from time_series_databse_engine_spark.operators.sampling import temperature_mix

    rows = [(i, "big") for i in range(900)] + [(900 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    out = temperature_mix(df, alpha=0.3, target_total=200, id_col="doc_id")
    kept = {r[0]: r[1] for r in out.groupBy("source").count().collect()}
    # natural shares are 0.9/0.1; alpha=0.3 shares are ~0.66/0.34 — the
    # small source must keep a far larger fraction of its docs
    assert kept["small"] / 100 > kept["big"] / 900
    # expected kept ~ 200*0.34 = 68 of 100 for small; tolerate hash noise
    assert 45 <= kept["small"] <= 90

    # determinism: same call, same membership
    a = sorted(r.doc_id for r in temperature_mix(df, 0.3, 200).collect())
    b = sorted(r.doc_id for r in temperature_mix(df, 0.3, 200).collect())
    assert a == b

    # alpha=1: rates proportional to n/N -> equal keep RATE across groups
    out1 = temperature_mix(df, alpha=1.0, target_total=500, id_col="doc_id")
    k1 = {r[0]: r[1] for r in out1.groupBy("source").count().collect()}
    assert abs(k1["big"] / 900 - k1["small"] / 100) < 0.15


def test_winsorize_clips_to_group_bounds(spark):
    from time_series_databse_engine_spark.operators.sampling import winsorize

    rows = [(i, "a", float(i)) for i in range(101)]  # 0..100
    rows.append((999, "a", 10_000.0))  # the blow-up
    df = spark.createDataFrame(rows, "doc_id long, k string, v double")
    out = {r.doc_id: r for r in winsorize(df, "k", "v", 0.01, 0.99).collect()}
    # the outlier is clipped to the group's p99, interior values pass
    assert out[999].value_winsorized == out[999].p_hi_bound < 10_000.0
    assert out[50].value_winsorized == 50.0
    # row count preserved (clip, not trim)
    assert len(out) == 102


def test_winsorize_approx_matches_exact_within_sketch_tolerance(spark):
    """approx=True (percentile_approx, the mergeable-sketch 100 TB form
    SCALE.md:1438 prescribes) produces clip boundaries within sketch
    tolerance of the exact path on the same data, and clips the same
    blow-up row.  percentile_approx returns an ACTUAL data value (no
    interpolation), so the bound must land on one of the group's values
    near the exact quantile — we allow one rank of slack per side."""
    from time_series_databse_engine_spark.operators.sampling import winsorize

    rows = [(i, "a", float(i)) for i in range(101)]  # 0..100
    rows.append((999, "a", 10_000.0))
    df = spark.createDataFrame(rows, "doc_id long, k string, v double")
    exact = {r.doc_id: r for r in winsorize(df, "k", "v", 0.01, 0.99).collect()}
    appr = {r.doc_id: r for r in
            winsorize(df, "k", "v", 0.01, 0.99, approx=True).collect()}
    assert len(appr) == len(exact) == 102
    # boundaries agree within 2.0 (≈ two ranks of this integer grid —
    # generous vs the default-accuracy sketch's guarantee)
    assert abs(appr[50].p_lo_bound - exact[50].p_lo_bound) <= 2.0
    assert abs(appr[50].p_hi_bound - exact[50].p_hi_bound) <= 2.0
    # the blow-up row is clipped to the (approx) hi bound either way
    assert appr[999].value_winsorized == appr[999].p_hi_bound < 10_000.0
    assert appr[50].value_winsorized == 50.0


def test_temperature_mix_and_winsorize_exclude_null_keys(spark):
    """ADVICE r11 (medium): NULL group rows used to distort
    temperature_mix's mass total / q normalizer and then vanish at the
    equi-join back (null != null).  Both ops now exclude NULL-key rows
    up front — the non-NULL groups' rates must be IDENTICAL to running
    on a corpus that never had the NULL rows."""
    from time_series_databse_engine_spark.operators.sampling import (
        temperature_mix,
        winsorize,
    )

    clean = [(i, "big") for i in range(900)] + [(900 + i, "small") for i in range(100)]
    noisy = clean + [(2000 + i, None) for i in range(400)]
    df_c = spark.createDataFrame(clean, "doc_id long, source string")
    df_n = spark.createDataFrame(noisy, "doc_id long, source string")
    a = sorted(r.doc_id for r in temperature_mix(df_c, 0.3, 200).collect())
    b = sorted(r.doc_id for r in temperature_mix(df_n, 0.3, 200).collect())
    assert a == b  # NULL mass no longer under-scales non-NULL keep rates

    rows = [(i, "a", float(i)) for i in range(101)] + [(500, None, 1e9)]
    dfw = spark.createDataFrame(rows, "doc_id long, k string, v double")
    out = winsorize(dfw, "k", "v", 0.01, 0.99)
    got = {r.doc_id: r for r in out.collect()}
    assert 500 not in got and len(got) == 101  # excluded, not silently joined away
    assert got[99].value_winsorized == got[99].p_hi_bound  # bounds from non-NULL only


def test_pareto_front_matches_brute_force(spark):
    from time_series_databse_engine_spark.operators.sampling import pareto_front

    # (id, q, t): mixed frontier with q-ties and an exact duplicate point
    pts = [
        (0, 0.9, 100), (1, 0.9, 80), (2, 0.8, 80), (3, 0.8, 50),
        (4, 0.7, 50), (5, 0.7, 40), (6, 0.5, 200), (7, 0.5, 40),
        (8, 0.7, 40),  # duplicate of id 5 on both axes -> both kept
    ]
    df = spark.createDataFrame(pts, "doc_id long, q double, t long")
    got = sorted(r.doc_id for r in pareto_front(df, "q", "t").collect())

    def dominated(d):
        return any(
            e[1] >= d[1] and e[2] <= d[2] and (e[1] > d[1] or e[2] < d[2])
            for e in pts if e[0] != d[0]
        )

    want = sorted(p[0] for p in pts if not dominated(p))
    assert got == want
    # sanity on the fixture: q-tie loser (0), strict losers (2,4,6) are out
    assert 0 not in got and 6 not in got and 5 in got and 8 in got


def test_pareto_front_single_point_and_nulls(spark):
    from time_series_databse_engine_spark.operators.sampling import pareto_front

    df = spark.createDataFrame(
        [(0, 0.5, 10), (1, None, 5), (2, 0.4, None)],
        "doc_id long, q double, t long",
    )
    got = [r.doc_id for r in pareto_front(df, "q", "t").collect()]
    assert got == [0]  # NULL on either axis is excluded, not dominant


def test_conformal_threshold_exact_order_statistic(spark):
    from time_series_databse_engine_spark.operators.sampling import (
        conformal_threshold,
    )

    # group A: scores 1..9 ; n=9, alpha=0.1 -> k = ceil(10*0.9) = 9 -> 9th
    # smallest = 9.0 ; group B: n=3 -> k = ceil(4*0.9) = 4 > 3 -> NULL
    rows = [("A", float(i)) for i in range(1, 10)] + [
        ("B", 1.0), ("B", 2.0), ("B", 3.0)
    ]
    df = spark.createDataFrame(rows, "g string, s double")
    out = {r.g: r for r in conformal_threshold(df, "s", group_col="g", alpha=0.1).collect()}
    assert out["A"].k == 9 and out["A"].threshold == 9.0
    assert out["B"].k == 4 and out["B"].threshold is None


def test_conformal_threshold_ties_and_global(spark):
    from time_series_databse_engine_spark.operators.sampling import (
        conformal_threshold,
    )

    # global (no group): 10 scores, four tied at 5.0 ; alpha=0.5 ->
    # k = ceil(11*0.5) = 6 -> 6th smallest; sorted: 1,2,5,5,5,5,7,8,9,10
    rows = [(v,) for v in [1.0, 2.0, 5.0, 5.0, 5.0, 5.0, 7.0, 8.0, 9.0, 10.0]]
    df = spark.createDataFrame(rows, "s double")
    r = conformal_threshold(df, "s", alpha=0.5).collect()[0]
    assert r.n == 10 and r.k == 6 and r.threshold == 5.0
