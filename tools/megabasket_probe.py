"""Planted mega-basket wall-clock proof for assoc_rules' cap
(VERDICT r10 #4).

The apriori prune bounds the pair space by the FREQUENT VOCABULARY, but
a single pathological basket — a bot session touching every frequent
item — still fans out C(|basket ∩ frequent|, 2) pairs on its own,
quadratic in its size and all sharing one basket key in the self-join.
``max_basket_size`` drops such baskets from pair evidence BEFORE the
join (the ``adamic_adar`` ``max_center_degree`` discipline).

This probe measures three corpora of identical honest content:

  - uniform:          N baskets of 8 items drawn round-robin from a
                      2 000-item frequent vocabulary — no cap needed.
  - planted+cap:      uniform plus ``n_bots`` bot baskets containing the
                      ENTIRE vocabulary, run with max_basket_size=64.
                      Should cost ~1x uniform: the cap removes the bots
                      before pair generation.
  - planted uncapped: the same corpus with no cap — the hazard baseline
                      (each bot alone contributes C(2000,2) ≈ 2M pairs,
                      vs ~28 per honest basket).

    python tools/megabasket_probe.py [n_baskets] [n_bots] [reps]

Prints one JSON line with best-of-N wall seconds per condition and the
capped/uncapped ratios vs uniform; the capped ratio ≈ 1x is the claim
committed under PROBES/.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_databse_engine_spark import get_spark
from time_series_databse_engine_spark.operators.baskets import assoc_rules

VOCAB = 2_000
BASKET = 8


def corpus(spark, n: int, n_bots: int):
    honest = spark.range(n).select(
        F.col("id").alias("b"),
        F.explode(
            F.array(*[
                ((F.col("id") * BASKET + j) % VOCAB).cast("string")
                for j in range(BASKET)
            ])
        ).alias("i"),
    )
    if not n_bots:
        return honest
    bots = (
        spark.range(n_bots)
        .select(
            (F.col("id") + n).alias("b"),
            F.explode(F.sequence(F.lit(0), F.lit(VOCAB - 1))).alias("_i"),
        )
        .select("b", F.col("_i").cast("string").alias("i"))
    )
    return honest.unionByName(bots)


def best_of(fn, reps: int) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().collect()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 3)


def main() -> None:
    import warnings

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_bots = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="megabasket-probe")
    ms = 20 / n  # every honest item lands in ~n*8/2000 = n/250 baskets

    uni = best_of(lambda: assoc_rules(corpus(spark, n, 0), "b", "i",
                                      min_support=ms, k=100), reps)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        capped = best_of(
            lambda: assoc_rules(corpus(spark, n, n_bots), "b", "i",
                                min_support=ms, k=100,
                                max_basket_size=64), reps)
    warned = sum("mega-basket cap" in str(x.message) for x in w)
    uncapped = best_of(
        lambda: assoc_rules(corpus(spark, n, n_bots), "b", "i",
                            min_support=ms, k=100), reps)

    print(json.dumps({
        "n_baskets": n, "basket_size": BASKET, "vocab": VOCAB,
        "n_bots": n_bots, "min_support": ms, "reps": reps,
        "uniform_sec": uni,
        "planted_capped_sec": capped,
        "planted_uncapped_sec": uncapped,
        "capped_ratio_vs_uniform": round(capped / uni, 3),
        "uncapped_ratio_vs_uniform": round(uncapped / uni, 3),
        "cap_warnings_fired": warned,
        "ctx_loadavg_1m": round(os.getloadavg()[0], 2),
        "ctx_cpus": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
