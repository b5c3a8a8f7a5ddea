"""Custom stateful streaming operators via ``applyInPandasWithState``.

The generalization of the reference's consumer-driven stateful loop
(reference: src/polars_fastx/fastx_parsers.py:107-127 keeps running
``n_rows`` state across batches): arbitrary per-key state carried
across micro-batches by Spark's state store, with optional TTL-based
eviction so state stays bounded on unbounded input.

Example operator: **running per-user totals** — emits, per micro-batch
and user, the cumulative event count/value-sum since the user was first
seen. The same shape covers sessionization with custom logic, online
aggregates, and feature backfills that windowed aggs can't express.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTALS_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("events_total", LongType(), True),
        StructField("value_total", DoubleType(), True),
        StructField("batch_events", LongType(), True),
    ]
)

_STATE = StructType(
    [
        StructField("events_total", LongType(), True),
        StructField("value_total", DoubleType(), True),
    ]
)


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user cumulative totals, one output row per (user, micro-batch).

    Append-mode stateful map (each emitted row is final for its batch):
    state is (events_total, value_total) per user.

    ``idle_timeout_ms``: evict a user's state after this much idle
    processing time — the knob that bounds state size on unbounded key
    spaces. Use it on continuous (processing-time) triggers only: a
    processing-time timeout keeps the query alive waiting for clocks to
    advance, so ``trigger(availableNow=True)`` runs would never
    terminate. Default (None) = keep state forever (NoTimeout).
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        events_n, value = state.get if state.exists else (0, 0.0)
        batch_events = 0
        for pdf in pdfs:
            batch_events += len(pdf)
            events_n += len(pdf)
            value += float(pdf["value"].fillna(0.0).sum())
        state.update((events_n, value))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "events_total": [events_n],
                "value_total": [value],
                "batch_events": [batch_events],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )


EWMA_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("event_id", LongType(), True),
        StructField("ewma", DoubleType(), True),
    ]
)

_EWMA_STATE = StructType(
    [
        StructField("acc", DoubleType(), True),
        StructField("gap", LongType(), True),
    ]
)


def streaming_ewma(events: DataFrame, alpha: float = 0.1) -> DataFrame:
    """Streaming twin of ``operators.timeseries.ewma``: the per-user
    recursion y_t = (1-α)·y_{t-1} + α·x_t carried across micro-batches
    in the state store (one (double, long) pair per user). Within a
    batch rows fold in (ts, event_id) order; across batches the
    accumulator resumes where the last batch ended — so for in-order
    delivery the emitted series is IDENTICAL to the batch operator's
    (pinned in tests). Out-of-order rows fold in arrival order (state
    can't rewind); put a watermarked sort upstream if the source can
    reorder.

    Null values replay pandas ``adjust=False, ignore_na=False``
    semantics exactly (the batch twin's engine): a null row re-emits
    the current accumulator unchanged (null before any observation),
    and the next real observation after g skipped rows folds in with a
    decayed old-weight (1-α)^(g+1) instead of poisoning the state with
    NaN — the ``gap`` half of the state carries g across batches.
    """

    def update(key, pdfs, state: GroupState):
        # acc = current mean (None before first obs); gap = rows since
        # the last non-null observation (pandas' `deltas - 1`)
        acc, gap = state.get if state.exists else (None, 0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            for eid, x in zip(pdf["event_id"], pdf["value"]):
                if pd.isna(x):
                    gap += 1
                    out.append((int(eid), acc))
                    continue
                x = float(x)
                if acc is None:
                    acc = x
                else:
                    old_wt = (1.0 - alpha) ** (gap + 1)
                    acc = (old_wt * acc + alpha * x) / (old_wt + alpha)
                gap = 0
                out.append((int(eid), acc))
        state.update((acc, gap))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out),
                "event_id": [e for e, _ in out],
                # explicit dtype: an all-None batch must stay float64,
                # not object, for the Arrow conversion
                "ewma": pd.Series([v for _, v in out], dtype="float64"),
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EWMA_OUTPUT,
        stateStructType=_EWMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KMV_OUTPUT = StructType(
    [
        StructField("key", StringType(), True),
        StructField("n_seen", LongType(), True),
        StructField("n_retained", LongType(), True),
        StructField("ndv_est", LongType(), True),
    ]
)

_KMV_STATE = StructType(
    [
        StructField("hashes", ArrayType(LongType()), True),
        StructField("n_seen", LongType(), True),
    ]
)


def streaming_kmv(
    stream: DataFrame, key_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Live per-key distinct-count estimates with O(k) state — the
    streaming twin of the batch KMV sketch family
    (``functions.sketches.kmv_*``).

    Exact streaming count-distinct needs state proportional to the
    distinct values seen (cf. ``stream_dedup``); the KMV bottom-k is
    closed under incremental insertion, so the state store holds at
    most ``k`` hashes per key FOREVER, and the running sketch after
    any prefix of micro-batches equals the batch sketch over the same
    rows hash-for-hash — so estimates match the batch
    ``kmv_estimate`` exactly (pinned in tests), and persisted state
    can be unioned with batch sketches via ``kmv_union``.

    The md5 value-hash is computed JVM-side BEFORE the stateful
    operator (one vectorized expression); the Python update only
    merges small sorted int lists. Emits one
    (key, n_seen, n_retained, ndv_est) row per key per micro-batch —
    ``n_seen`` is monotone, so "latest row per key" is a max, not a
    timestamp race.
    """
    from pyspark.sql import functions as F

    from polars_fastx_spark.functions.sketches import kmv_hash

    hashed = stream.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("key"),
        kmv_hash(F.col(value_col)).alias("h"),
    )

    def update(key, pdfs, state: GroupState):
        hashes, n_seen = state.get if state.exists else ([], 0)
        retained = set(int(x) for x in hashes)
        for pdf in pdfs:
            n_seen += len(pdf)
            retained.update(int(x) for x in pdf["h"])
        merged = sorted(retained)[:k]
        state.update((merged, n_seen))
        n = len(merged)
        if n == k:
            theta = (merged[-1] + 1) / 4294967296.0
            # half-up to mirror the batch estimator's F.round
            est = int(math.floor((k - 1) / theta + 0.5))
        else:
            est = n
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_seen": [n_seen],
                "n_retained": [n],
                "ndv_est": [est],
            }
        )

    return hashed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=KMV_OUTPUT,
        stateStructType=_KMV_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
