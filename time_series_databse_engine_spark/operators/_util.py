"""Cross-family operator infrastructure (advisor r12: ``_parallelize``
grew out of the dedup domain and is imported by similarity/text/profile/
pipeline — a neutral home avoids any future dedup→text import cycle).
"""

from __future__ import annotations

import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession


def _shuffle_width(spark: SparkSession) -> int:
    """The session's shuffle width as an int, falling back to
    ``defaultParallelism`` when the conf value is non-numeric (vendor
    values like ``"auto"``) — the one place the explicit-width pins and
    salted joins read their fan-out target from (advisor r12)."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def _estimated_scan_splits(spark: SparkSession, files: list[str]) -> int:
    """Lower bound on the scan task count Spark will create for these
    files: parquet files are SPLIT by ``spark.sql.files.maxPartitionBytes``
    (never merged below one task per split), so a few huge files still
    scan wide.  Counting bare files under-estimates that and made the
    `_parallelize` guard misfire on the few-huge-files layout (VERDICT
    r12 #7: a 16 × 10 GB table on a 64-core cluster would have paid a
    full-data round-robin shuffle it does not need).  Local (``file:``)
    paths are stat'd; any unstat-able path contributes one split — the
    conservative fallback equals the old file-count behaviour."""
    try:
        max_split = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    except (TypeError, ValueError):
        max_split = 128 * 1024 * 1024
    max_split = max(max_split, 1)
    splits = 0
    for uri in files:
        parsed = urlparse(uri)
        path = unquote(parsed.path) if parsed.scheme in ("file", "") else None
        size = None
        if path:
            try:
                size = os.path.getsize(path)
            except OSError:
                size = None
        splits += max(1, math.ceil(size / max_split)) if size else 1
    return splits


def _parallelize(df: DataFrame) -> DataFrame:
    """Ensure the doc table has ≥ default parallelism before CPU-heavy
    shingling/hashing.  A small local parquet file arrives as one partition
    and would serialize the whole pipeline on one core; at scale the input
    already scans wider than the core count and this is a no-op.

    Width probe order matters: ``inputFiles()`` is a pure file-listing
    (the production path), so file scans never touch ``.rdd``; only
    non-file sources (in-memory test frames) fall back to
    ``rdd.getNumPartitions()``, which forces logical→RDD plan conversion
    on every operator build — no job, but measurable on wide pipelines
    (the round-3 advisor nit).  The guard compares the ESTIMATED scan
    split count (file sizes / maxPartitionBytes), not the bare file
    count, so a table stored as a few huge splittable files is left
    alone (VERDICT r12 #7)."""
    if df.isStreaming:  # micro-batch width is the source's concern
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        if len(files) >= target:
            return df
        return (
            df
            if _estimated_scan_splits(spark, list(files)) >= target
            else df.repartition(target)
        )
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# Index-sidecar plan memo (r13, VERDICT #8).  A persisted index's sidecars
# (IVF cells/codebook, MaxSim params) are written ONCE at build time and
# pinned for the index's lifetime — yet every probe/append re-ran
# ``spark.read.parquet`` on them (~80 ms each: footer read + relation
# resolution), pure re-setup on the serving path.  The memo holds the
# UNMATERIALIZED DataFrame (a lazy plan; every action still reads the
# files), keyed by (applicationId, path) so a fresh session never sees a
# stale plan.  The ONLY writers (ivf_index_write / maxsim_index_write)
# call ``invalidate_sidecars`` for their path, so a rebuilt index gets a
# fresh plan.
# ---------------------------------------------------------------------------
_SIDECAR_MEMO: dict[tuple[str, str], object] = {}


def _sidecar_table(spark: SparkSession, path: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, path)
    df = _SIDECAR_MEMO.get(key)
    if df is None:
        df = spark.read.parquet(path)
        _SIDECAR_MEMO[key] = df
    return df


def invalidate_sidecars(path_prefix: str) -> None:
    """Drop memoized sidecar plans under ``path_prefix`` (called by the
    index writers before/after a rebuild)."""
    for key in [k for k in _SIDECAR_MEMO if k[1].startswith(path_prefix)]:
        del _SIDECAR_MEMO[key]
