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

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
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
