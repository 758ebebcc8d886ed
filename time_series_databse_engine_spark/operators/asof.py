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
    direction: str = "backward",
) -> DataFrame:
    """Union + window implementation.  ``on`` must be a long (ms) column
    present in both; ``right_cols`` are the right columns to carry.

    ``direction``: ``backward`` (greatest right.ts <= left.ts, the default),
    ``forward`` (smallest right.ts >= left.ts), or ``nearest`` (closer of
    the two; exact-distance ties prefer backward).  All three are the same
    one-shuffle plan — nearest evaluates two window frames over one
    partitioning (one exchange, two in-partition sorts).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    by = by or []
    right_cols = right_cols or [c for c in right.columns if c != on and c not in by]

    carried = [f"{c}{suffix}" for c in right_cols] + [f"{on}{suffix}"]
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
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    # backward: right rows sort before left at the same ts → inclusive "<=",
    # carry the last non-null backward.  forward: left rows sort first at
    # the same ts → inclusive ">=", take the first non-null forward.
    w_back = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").desc())
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )

    def staleness(match_ts):
        if direction == "backward":
            return F.col(on) - match_ts
        if direction == "forward":
            return match_ts - F.col(on)
        return F.abs(match_ts - F.col(on))

    if direction in ("backward", "forward"):
        pick = (
            (lambda c: F.last(c, ignorenulls=True).over(w_back))
            if direction == "backward"
            else (lambda c: F.first(c, ignorenulls=True).over(w_fwd))
        )
        for c in carried:
            unioned = unioned.withColumn(c, pick(c))
        out = unioned.filter(F.col("_side") == 1).drop("_side")
        if tolerance_ms is not None:
            stale = staleness(F.col(f"{on}{suffix}")) > F.lit(tolerance_ms)
            for c in carried:
                out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
        return out

    # nearest: both carries, then choose per row by |Δts| (ties → backward)
    for c in carried:
        unioned = unioned.withColumn(f"{c}__b", F.last(c, ignorenulls=True).over(w_back))
        unioned = unioned.withColumn(f"{c}__f", F.first(c, ignorenulls=True).over(w_fwd))
    out = unioned.filter(F.col("_side") == 1).drop("_side")
    ts_b, ts_f = F.col(f"{on}{suffix}__b"), F.col(f"{on}{suffix}__f")
    d_b, d_f = F.col(on) - ts_b, ts_f - F.col(on)
    if tolerance_ms is not None:
        d_b = F.when(d_b <= tolerance_ms, d_b)  # else NULL → side disqualified
        d_f = F.when(d_f <= tolerance_ms, d_f)
    use_fwd = d_b.isNull() & d_f.isNotNull() | d_b.isNotNull() & d_f.isNotNull() & (d_f < d_b)
    use_back = d_b.isNotNull() & ~F.coalesce(use_fwd, F.lit(False))
    for c in carried:
        out = out.withColumn(
            c,
            F.when(use_fwd, F.col(f"{c}__f")).when(use_back, F.col(f"{c}__b")),
        ).drop(f"{c}__b", f"{c}__f")
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts_ms",
    by: str = "metric",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
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
        return pd.merge_asof(l_pdf, r_pdf, on=on, direction=direction)

    return left.groupBy(by).cogroup(right.groupBy(by)).applyInPandas(
        lambda l, r: merge(l, r), schema=out_schema
    )


def interval_bucket_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts_ms",
    start_col: str = "start_ms",
    end_col: str = "end_ms",
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Interval join WITHOUT a shared equi key, made shuffle-friendly:
    explode each interval into its covering time buckets, equi-join points
    on the bucket, then apply the BETWEEN residual.  Without this, Spark's
    only plan for ``ts BETWEEN start AND end`` is a broadcast-nested-loop
    (or cartesian) — |points|·|intervals| comparisons; here candidate
    volume is only the points inside buckets an interval overlaps, and
    the join is a plain hash/sort-merge exchange on the bucket key.

    A point lives in exactly ONE bucket, so each qualifying
    (point, interval) pair is produced exactly once — no dedup pass.
    Pick ``bucket_ms`` near the typical interval length: longer intervals
    explode into more buckets (rows ∝ length/bucket_ms); buckets much
    longer than intervals admit more false candidates for the residual to
    drop.  Skew-note: a bucket covered by many intervals and many points
    is an ordinary hot key — AQE skew-join splits it like any other.
    """
    b_pts = points.withColumn("_b", F.floor(F.col(ts_col) / F.lit(bucket_ms)))
    b_iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_ms)),
                F.floor(F.col(end_col) / F.lit(bucket_ms)),
            )
        ),
    )
    return (
        b_pts.join(b_iv, "_b")
        .filter(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
        .drop("_b")
    )
