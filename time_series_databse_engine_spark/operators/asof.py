"""As-of join — the canonical time-series join the reference lacks
(SURVEY.md §2.2 "Joins").

Two implementations:

* :func:`asof_join` — the scalable path: union both sides, one window pass
  per key carrying the most recent right-side row forward
  (``last(..., ignorenulls=True)``).  Exactly one shuffle on the key, no
  join explosion, no per-group memory requirement → survives 100 TB where
  a per-key ``merge_asof`` would need each group in one pandas frame.
* :func:`asof_join_pandas` — ``applyInPandas`` + ``pandas.merge_asof``
  per key; kept as a cross-check and for small keyed data.

Semantics: for each left row, attach the right row with the greatest
``right.ts <= left.ts`` (inclusive, like the reference's range predicate
engine/insight.cpp:42) within the same ``by`` key, optionally bounded by
``tolerance_ms``.  Left rows with no match keep NULLs (left outer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts_ms",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Union + window implementation.  ``on`` must be a long (ms) column
    present in both; ``right_cols`` are the right columns to carry."""
    by = by or []
    right_cols = right_cols or [c for c in right.columns if c != on and c not in by]

    carried = [f"{c}{suffix}" for c in right_cols]
    r = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumn(f"{on}{suffix}", F.col(on))
    l = left.select(
        "*",
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(r.schema[c].dataType).alias(c) for c in carried],
        F.lit(None).cast("long").alias(f"{on}{suffix}"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    # right rows sort before left rows at the same ts → inclusive "<="
    w = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    for c in [*carried, f"{on}{suffix}"]:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = unioned.filter(F.col("_side") == 1).drop("_side")
    if tolerance_ms is not None:
        # void the match when it is older than the tolerance
        stale = F.col(on) - F.col(f"{on}{suffix}") > F.lit(tolerance_ms)
        for c in [*carried, f"{on}{suffix}"]:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts_ms",
    by: str = "metric",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """``applyInPandas`` + ``pandas.merge_asof`` cross-check implementation.

    Cogroups both sides by key; each group must fit in one worker's memory —
    fine for bounded per-key cardinality, not the default at scale.
    """
    import pandas as pd

    from pyspark.sql import types as T

    right_cols = right_cols or [c for c in right.columns if c != on and c != by]
    out_fields = list(left.schema.fields) + [
        T.StructField(f"{c}{suffix}", right.schema[c].dataType) for c in right_cols
    ]
    out_schema = T.StructType(out_fields)

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_pdf = l_pdf.sort_values(on)
        r_pdf = r_pdf[[on, *right_cols]].sort_values(on)
        r_pdf = r_pdf.rename(columns={c: f"{c}{suffix}" for c in right_cols})
        if r_pdf.empty:
            for c in right_cols:
                l_pdf[f"{c}{suffix}"] = None
            return l_pdf
        return pd.merge_asof(l_pdf, r_pdf, on=on, direction="backward")

    return left.groupBy(by).cogroup(right.groupBy(by)).applyInPandas(
        lambda l, r: merge(l, r), schema=out_schema
    )
