"""Multi-dimensional data layout: Z-order (Morton) clustering.

Partition pruning on ONE column is free (hour_bucket in the store,
row-group min/max in parquet).  But a 100 TB table queried by BOTH time
and value (or tenant and time, or lat and lon) can only be sorted by one
of them — the second dimension spans its full range inside every file
and prunes nothing.  Z-ordering interleaves the bits of the quantized
dimensions into one sort key, so files that are contiguous in z-space
are small RECTANGLES in dimension-space: every file's min/max footer
stats become tight in EVERY interleaved dimension at once, and a
selective filter on any of them skips most files (the Delta/Iceberg
``OPTIMIZE ZORDER BY`` layout, built here from primitives).

All expressions are static shift/and/or chains — whole-stage-codegen
friendly, no UDFs — and every float step is written in the fixed order
the SQL oracle replays (subtract in native type, one division, one
multiply, floor, clamp).
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import DataFrame, functions as F


def quantize(col, lo, hi, bits: int = 16) -> F.Column:
    """Map ``col`` in [lo, hi] to an integer bucket in [0, 2^bits):
    ``clamp(floor((col - lo) / (hi - lo) * 2^bits))``.  ``lo``/``hi``
    are Columns (ride a broadcast one-row min/max aggregate — no driver
    collect) or literals.  Values at the max land in the top bucket;
    out-of-range values clamp rather than corrupt the interleave."""
    lo_c = lo if isinstance(lo, F.Column) else F.lit(lo)
    hi_c = hi if isinstance(hi, F.Column) else F.lit(hi)
    scaled = F.floor((col - lo_c) / (hi_c - lo_c) * F.lit(float(1 << bits)))
    clamped = F.least(F.greatest(scaled, F.lit(0)), F.lit((1 << bits) - 1))
    # constant column (hi == lo): division is NaN/±Inf — park everything
    # in bucket 0 instead of poisoning the interleave with nulls
    return F.when(hi_c == lo_c, F.lit(0)).otherwise(clamped).cast("long")


def rank_quantize(df: DataFrame, col: str, bits: int = 8, out: str = "bucket") -> DataFrame:
    """Skew-proof bucketing: the bucket is the SAMPLING-BASED RANGE
    PARTITION id (what Delta/Iceberg OPTIMIZE uses) — equal-POPULATION
    buckets whatever the distribution, one sampling pass, no global sort
    and no exact quantiles.  :func:`quantize` is equal-WIDTH and
    collapses under skew (a long-tailed column packs ~all rows into a
    few buckets, and the interleave stops separating the dense region —
    measured on events.value, p95/max ≈ 0.3); use this one for real
    layouts.  ``spark_partition_id`` is non-deterministic-tagged, so
    Catalyst pins the projection to the stage right after this exchange
    — a later z-key repartition cannot disturb the captured bucket."""
    return df.repartitionByRange(1 << bits, F.col(col)).withColumn(
        out, F.spark_partition_id()
    )


def zorder_key(a, b, bits: int = 16) -> F.Column:
    """Morton interleave of two pre-quantized ``bits``-bit integers:
    ``a`` occupies even bit positions, ``b`` odd — one static
    2·bits-term shift/mask sum (terms write disjoint bits, so ``+``
    is ``|``), fully codegen'd, reproducible in any engine with
    ``>> & <<``."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31] (2·bits interleaved bits must fit a long)")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(add, terms)


def zorder_key_n(cols, bits: int = 8) -> F.Column:
    """N-dimensional Morton interleave — the general form of
    :func:`zorder_key` for layouts clustered on 3-4 columns (tenant ×
    time × metric is the common TSDB triple).  Column j of n owns bit
    positions ``i·n + j``; ``n·bits`` interleaved bits must fit a long.
    Fewer bits per dimension than the 2-d case is the right trade: with
    16 target files and 3 dims you only ever prune on the top ~2 bits
    of each dimension anyway."""
    n = len(cols)
    if n < 1:
        raise ValueError("need at least one column")
    if not 1 <= bits or n * bits > 63:
        raise ValueError(f"n·bits must fit a long: {n}×{bits} > 63")
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j))
    return reduce(add, terms)


def zorder_write(
    df: DataFrame, path: str, zcol: str = "zkey", num_files: int = 16
) -> None:
    """Write ``df`` parquet clustered by its z-key: range-repartition on
    the key (one sampling pass picks the boundaries — the standard
    global-sort shape, no skewed-single-task), sort within partitions,
    one file per partition.  Each file then covers a contiguous z-range
    = a rectangle in dimension space, and its parquet footer min/max on
    the ORIGINAL columns is what downstream scans prune with — the
    z-key itself need not be stored or filtered on."""
    (
        df.repartitionByRange(num_files, F.col(zcol))
        .sortWithinPartitions(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )


def hilbert_key(a, b, bits: int = 16) -> F.Column:
    """Hilbert-curve distance of two pre-quantized ``bits``-bit integers —
    the stronger-locality alternative to :func:`zorder_key`.  Morton order
    takes long diagonal jumps at quadrant seams, so a file of contiguous
    z-values can cover two far-apart rectangles; the Hilbert curve is
    continuous (every step adjacent), so equal-size key ranges are tighter
    squares and footer min/max prune better on BOTH dimensions (the
    Iceberg/DB2-MDC layout literature's standard result, measured in
    tests/test_layout_skipping.py).

    Classic xy→d walk (public domain, e.g. Wikipedia "Hilbert curve"):
    from the top bit level down, accumulate ``s²·((3·rx) XOR ry)`` and
    rotate/reflect the quadrant frame.  The per-level state (x, y, d) is
    carried through ONE ``aggregate`` fold over the static level array —
    pure integer JVM expressions, association-free, no UDF; the oracle
    replays the identical walk in a recursive CTE."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    levels = F.array(*[F.lit(1 << i) for i in range(bits - 1, -1, -1)])
    init = F.struct(
        a.cast("long").alias("x"), b.cast("long").alias("y"), F.lit(0).cast("long").alias("d")
    )

    def step(acc, s):
        rx = F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        d = acc["d"] + s * s * ((F.lit(3) * rx).bitwiseXOR(ry))
        # rotate/reflect only when ry == 0; when rx == 1 also point-reflect
        xf = F.when(rx == 1, s - 1 - acc["x"]).otherwise(acc["x"])
        yf = F.when(rx == 1, s - 1 - acc["y"]).otherwise(acc["y"])
        x2 = F.when(ry == 0, yf).otherwise(acc["x"])
        y2 = F.when(ry == 0, xf).otherwise(acc["y"])
        return F.struct(x2.alias("x"), y2.alias("y"), d.alias("d"))

    return F.aggregate(levels, init, step)["d"]


def hilbert_key_pandas(a, b, bits: int = 16) -> F.Column:
    """Arrow-batched fast path of :func:`hilbert_key` — bit-identical
    output (same xy→d walk, same integer algebra), measured 8.5× faster
    (8.77 s → 1.03 s, 600k-row isolated run at sf1, bits=16)
    because the per-level fold runs vectorized numpy int64 ops instead of
    Catalyst's interpreted higher-order-function evaluator (HOFs never
    enter whole-stage codegen; the fold is 16 levels × ~8 expression
    nodes interpreted per ROW, where numpy pays ~128 vectorized ops per
    BATCH).  A null coordinate contributes 0 bits at every level — the
    expression form's ``when(x & s > 0, 1).otherwise(0)`` sends null
    comparisons down the otherwise branch, so null behaves as 0 there
    too; bit-identity including that case is test-pinned.  Use this in
    production layout jobs; keep :func:`hilbert_key` where a plan must
    stay JVM-only or an engine-replayable oracle matters."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _hilbert(xa, xb):
        import numpy as np
        import pandas as pd

        x = xa.fillna(0).to_numpy(dtype=np.int64)
        y = xb.fillna(0).to_numpy(dtype=np.int64)
        d = np.zeros_like(x)
        s = np.int64(1 << (bits - 1))
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            # rotate/reflect only when ry == 0; when rx == 1 also point-reflect
            xf = np.where(rx == 1, s - 1 - x, x)
            yf = np.where(rx == 1, s - 1 - y, y)
            x, y = np.where(ry == 0, yf, x), np.where(ry == 0, xf, y)
            s >>= 1
        return pd.Series(d)

    return _hilbert(a, b)


def parquet_pruning_report(
    spark,
    paths: list[str],
    columns: list[str],
    probe_lo: int | None = None,
    probe_hi: int | None = None,
) -> DataFrame:
    """Distributed parquet-footer pruning audit — the measurement half
    of this module's layout operators: z-order/Hilbert/sort layouts are
    only worth their write cost if the resulting row-group min/max
    statistics actually let a selective predicate SKIP data, and this
    op reads exactly the evidence the engine's own pruning uses.

    One output row per (file, integer column, row group) with the
    column-chunk min/max statistics and ``n_rows``; when a probe range
    is given, ``skippable`` marks row groups a predicate
    ``col BETWEEN probe_lo AND probe_hi`` never has to read
    (min > hi or max < lo).  Summing ``n_rows`` over skippable rows
    prices the layout: a well-clustered table skips ~everything outside
    the probe rectangle, a shuffled one skips nothing.

    Scale shape: the FILE LIST parallelizes (one task per file via a
    round-robin repartition) and each task reads ONLY the footer through
    pyarrow — data pages are never touched, so auditing a 100 TB table
    costs one metadata round-trip per file.  Columns are restricted to
    integer-statistics types (int32/int64 — ts_ms, ids, bucketed keys)
    and the restriction is ENFORCED: a requested column whose physical
    type is not INT32/INT64 fails fast with a message naming it (float
    stats have engine-specific string formats and belong to the
    profiler, not the pruning audit; ADVICE r11).  Column chunks WITHOUT
    statistics are surfaced as rows with NULL min/max and
    ``skippable = false`` — a stat-less row group is exactly the row
    group the engine can never skip, so dropping it would overstate the
    layout (ADVICE r11).
    """
    if not paths:
        raise ValueError("parquet_pruning_report: empty path list")
    files_df = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(len(paths))
    cols = list(columns)

    def read_footers(batches):
        import os

        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                for i in range(md.num_row_groups):
                    rg = md.row_group(i)
                    for j in range(rg.num_columns):
                        c = rg.column(j)
                        if c.path_in_schema not in cols:
                            continue
                        if c.physical_type not in ("INT32", "INT64"):
                            raise ValueError(
                                f"parquet_pruning_report: column "
                                f"{c.path_in_schema!r} in {p!r} has physical "
                                f"type {c.physical_type} — only INT32/INT64 "
                                f"statistics are audited (float/byte-array "
                                f"stats belong to the profiler)"
                            )
                        st = c.statistics
                        has = st is not None and st.has_min_max
                        rows.append(
                            (
                                os.path.basename(p),
                                c.path_in_schema,
                                i,
                                rg.num_rows,
                                int(st.min) if has else None,
                                int(st.max) if has else None,
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_name", "column", "row_group",
                    "n_rows", "col_min", "col_max",
                ],
            )

    out = files_df.mapInPandas(
        read_footers,
        "file_name string, column string, row_group int, "
        "n_rows long, col_min long, col_max long",
    )
    if probe_lo is not None and probe_hi is not None:
        out = out.withColumn(
            "skippable",
            F.coalesce(
                (F.col("col_min") > F.lit(probe_hi))
                | (F.col("col_max") < F.lit(probe_lo)),
                F.lit(False),
            ),
        )
    return out
