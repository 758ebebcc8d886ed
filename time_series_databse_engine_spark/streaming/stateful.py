"""Custom stateful streaming operator: per-series exponential moving
average via ``applyInPandasWithState`` — the shape to use when built-in
windowed aggregates can't express the semantics (SURVEY.md §2.2 'UDF/UDAF
surface' + streaming stateful ops).

State per series is O(1) (the last EMA + last ts), so state size is bounded
by series cardinality regardless of throughput — the property that matters
at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("ema", T.DoubleType(), False),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("ema", T.DoubleType(), True),
        T.StructField("last_ts_ms", T.LongType(), True),
    ]
)


def ema_stream(stream: DataFrame, alpha: float = 0.2) -> DataFrame:
    """stream must have (metric, ts_ms, value).  Emits one row per input
    point with the running EMA carried across micro-batches in group state."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (metric,) = key
        ema, last_ts = state.get if state.exists else (None, None)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_ms")
            for ts_ms, value in zip(pdf["ts_ms"], pdf["value"]):
                ema = value if ema is None else alpha * value + (1 - alpha) * ema
                last_ts = int(ts_ms)
                out.append((metric, last_ts, float(value), float(ema)))
        state.update((ema, last_ts))
        yield pd.DataFrame(out, columns=["metric", "ts_ms", "value", "ema"])

    return stream.groupBy("metric").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_OUT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("cusum_pos", T.DoubleType(), False),
        T.StructField("cusum_neg", T.DoubleType(), False),
        T.StructField("alarm", T.BooleanType(), False),
    ]
)
CUSUM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("sp", T.DoubleType(), True),
        T.StructField("sn", T.DoubleType(), True),
    ]
)


def cusum_stream(
    stream: DataFrame, mu0: float, k: float = 0.5, h: float = 5.0
) -> DataFrame:
    """Online two-sided CUSUM against a KNOWN reference level ``mu0`` —
    Page's original sequential monitoring form (the batch
    ``cusum_changepoints`` anchors at the realized series mean instead,
    which only exists in retrospect).  State per series is two doubles
    carried across micro-batches, the same O(series) bound as
    :func:`ema_stream`; the recursion is the identical
    ``max(0, ·)`` pair, so batch and stream agree given the same μ.

    stream must have (metric, ts_ms, value); emits one row per input
    point with the running statistics and the alarm flag.
    """

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (metric,) = key
        sp, sn = state.get if state.exists else (0.0, 0.0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_ms")
            for ts_ms, value in zip(pdf["ts_ms"], pdf["value"]):
                x = float(value)
                sp = max(0.0, sp + (x - mu0 - k))
                sn = max(0.0, sn - (x - mu0) - k)
                out.append(
                    (metric, int(ts_ms), x, sp, sn, bool(sp > h or sn > h))
                )
        state.update((sp, sn))
        yield pd.DataFrame(
            out,
            columns=["metric", "ts_ms", "value", "cusum_pos", "cusum_neg", "alarm"],
        )

    return stream.groupBy("metric").applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HH_OUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("item", T.StringType(), False),
        T.StructField("est_count", T.LongType(), False),
        T.StructField("max_err", T.LongType(), False),
    ]
)
HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType()), True),
        T.StructField("counts", T.ArrayType(T.LongType()), True),
        T.StructField("decremented", T.LongType(), True),
    ]
)


def heavy_hitters_stream(
    stream: DataFrame, item_col: str = "item", k: int = 8, n_buckets: int = 4
) -> DataFrame:
    """Streaming heavy hitters: Misra–Gries summaries carried across
    micro-batches — the trending-tokens/domains monitor a training-data
    intake pipeline runs on its firehose (exact streaming counts need
    unbounded state; this needs ``k`` counters per bucket, forever).

    Items are hash-PARTITIONED over ``n_buckets`` state groups, so each
    group's summary is an independent exact Misra–Gries over ITS item
    subset: no cross-bucket merge error, and the global top-k is a
    k·n_buckets-row union.  Guarantee per emitted row (Misra–Gries):
    ``true_count - max_err <= est_count <= true_count``, with ``max_err``
    (the bucket's cumulative decrement) <= bucket_arrivals/(k+1).

    Scale shape: state is O(k · n_buckets) doubles/strings total —
    independent of stream length; ``n_buckets`` sets the stateful
    shuffle's parallelism (raise it to spread load; hot single items
    are AT one bucket by construction, which is what the per-bucket
    summary wants).  Arrival rows are pre-reduced to per-batch
    (item, count) pairs inside the Arrow batch before touching the
    dict, so per-row Python work is one pandas value_counts.
    """

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (bucket,) = key
        if state.exists:
            items, counts, dec = state.get
            counters = dict(zip(items, counts))
            dec = int(dec)
        else:
            counters, dec = {}, 0
        for pdf in pdfs:
            for item, c in pdf[item_col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                # batch Misra–Gries step: subtract the (k+1)-th largest
                # count from everything, drop the non-positive
                kth = sorted(counters.values(), reverse=True)[k]
                dec += kth
                counters = {i: c - kth for i, c in counters.items() if c > kth}
        state.update((list(counters.keys()), [int(c) for c in counters.values()], dec))
        rows = sorted(counters.items(), key=lambda t: (-t[1], t[0]))
        yield pd.DataFrame(
            [(bucket, i, int(c), dec) for i, c in rows],
            columns=["bucket", "item", "est_count", "max_err"],
        )

    keyed = stream.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(item_col)), F.lit(n_buckets)).cast("int")
    )
    return keyed.groupBy("_bucket").applyInPandasWithState(
        update,
        outputStructType=HH_OUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start_ms", T.LongType(), False),
        T.StructField("session_end_ms", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)
SESS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType(), True),
        T.StructField("last_ms", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def sessionize_stream(stream: DataFrame, gap_ms: int = 1_800_000) -> DataFrame:
    """Stateful streaming sessionization WITH STATE EVICTION — the
    GroupStateTimeout surface the other stateful ops here don't need
    (EMA/CUSUM state is O(series) forever; per-USER session state would
    grow unboundedly without expiry).  A session closes when the event-
    time watermark passes ``last_event + gap``: the state times out, the
    completed session row is emitted, and the key's state is REMOVED —
    state size is O(active sessions), not O(users ever seen).

    Built-in ``session_window`` covers the aggregation shape
    (streaming/ingest.sessionized_counts); this operator exists for the
    cases needing custom per-session state machines (ordered event
    lists, funnels-within-session) — swap the payload, keep the
    timeout skeleton.  stream must have (user_id, ts_ms) and a
    watermark on an event-time column derived from ts_ms.
    """

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, int(start), int(last), int(n))],
                columns=["user_id", "session_start_ms", "session_end_ms", "n_events"],
            )
            return
        start, last, n = state.get if state.exists else (None, None, 0)
        for pdf in pdfs:
            for ts in pdf["ts_ms"]:
                ts = int(ts)
                start = ts if start is None else min(start, ts)
                last = ts if last is None else max(last, ts)
                n += 1
        state.update((start, last, n))
        # evict once the watermark passes the session gap
        state.setTimeoutTimestamp(last + gap_ms)
        yield pd.DataFrame(
            [], columns=["user_id", "session_start_ms", "session_end_ms", "n_events"]
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESS_OUT_SCHEMA,
        stateStructType=SESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


NEARDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType(), False),
        T.StructField("band_hash", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("first_seen_id", T.LongType(), False),
        T.StructField("is_first", T.BooleanType(), False),
    ]
)
NEARDUP_STATE_SCHEMA = T.StructType(
    [T.StructField("first_id", T.LongType(), True)]
)


def _claim_bucket(first_id, doc_ids):
    """Assign a band bucket's claimant for one micro-batch.  Drains EVERY
    Arrow chunk's doc_ids before assigning, so "ties claim by min doc_id"
    holds batch-wide — a bucket whose rows span multiple chunks must not
    let the first chunk's min claim it.  Returns (first_id, [(doc_id,
    first_seen_id, is_first), ...])."""
    out = []
    for doc_id in sorted(doc_ids):
        if first_id is None:
            first_id = doc_id
            out.append((doc_id, doc_id, True))
        else:
            out.append((doc_id, first_id, doc_id == first_id))
    return first_id, out


def neardup_stream(banded: DataFrame) -> DataFrame:
    """Streaming near-duplicate suppression: a persistent LSH band index
    carried in group state across micro-batches.  Input is a stream of
    (doc_id, band, band_hash) rows (``dedup.banded_keys`` over minhash
    signatures, computed per micro-batch); grouping key = the band bucket;
    state = the id of the bucket's first claimant, O(1) per bucket.

    A doc is a near-dup candidate when ANY of its band rows comes back
    ``is_first = false`` — the streaming twin of
    ``dedup.neardup_incremental``, with state playing the corpus band
    table.  State grows with DISTINCT buckets — that is the index itself,
    the same asymptotics as the batch corpus table (O(bands) short strings
    per unique doc), not a leak; shard it by adding a key prefix if one
    store's footprint matters.  Within a batch ties claim deterministically
    by min doc_id.
    """

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        band, band_hash = key
        (first_id,) = state.get if state.exists else (None,)
        first_id, claims = _claim_bucket(
            first_id, (int(d) for pdf in pdfs for d in pdf["doc_id"])
        )
        out = [
            (band, band_hash, doc_id, seen, is_first)
            for doc_id, seen, is_first in claims
        ]
        state.update((first_id,))
        yield pd.DataFrame(
            out, columns=["band", "band_hash", "doc_id", "first_seen_id", "is_first"]
        )

    return banded.groupBy("band", "band_hash").applyInPandasWithState(
        update,
        outputStructType=NEARDUP_OUT_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
