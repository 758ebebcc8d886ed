"""Multimodal column plumbing (north-star op, BASELINE.json).

Images/audio/video are opaque ``binary`` columns + typed metadata structs.
The Spark-side shape is real and tested — schema, partition-friendly batch
iteration via ``mapInPandas`` (Arrow batches, never per-row Python), stable
output schemas.  The actual codec work is stubbed: the container has no
image/audio libraries, so ``decode_image`` either raises
``NotImplementedError`` (real mode) or produces a deterministic fake
feature vector derived from the bytes (test mode).  Swapping in PIL/ffmpeg
later changes only the inner function, not the Spark plan.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),       # image | audio | video
        T.StructField("payload", T.BinaryType(), True),      # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: bytes → FEATURE_DIM floats."""
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def extract_features(df: DataFrame, fake: bool = False, batch_hint: int | None = None) -> DataFrame:
    """media table → (media_id, kind, features array<double>).

    ``mapInPandas``: Arrow-batched, per-partition iterator — the decode cost
    parallelizes with the scan and never collects to the driver.  At 100 TB
    the binary payloads dominate scan bytes; project only (media_id, kind,
    payload) into the UDF and repartition upstream by size if payloads skew.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding needs PIL/ffmpeg — not in this container; "
                    "pass fake=True for the deterministic test decoder"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": pdf["payload"].map(_fake_features),
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame offset,
    derived from metadata only (sequence over duration) — the decode of each
    frame is the stubbed step.  Shows the explode-then-decode shape that
    keeps frame extraction parallel."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )
