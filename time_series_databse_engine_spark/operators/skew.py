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
    mix = [F.col(c) for c in big.columns]
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(*mix), F.lit(salt)).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")
