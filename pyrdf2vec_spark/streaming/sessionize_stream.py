"""Stateful streaming sessionization via ``applyInPandasWithState``.

The batch engine sessionizes events with a lag-over-window pass
(`events_sessionize` in __spark_entry__.py: gap > ``gap`` seconds at
microsecond precision opens a new session). This is the streaming
equivalent: per-user GroupState carries the OPEN session across
micro-batches, closed sessions are emitted as soon as a within-batch
gap closes them, and the state timeout (event-time, driven by the
watermark) flushes a session once the stream's watermark passes its
last event + gap — the standard Structured-Streaming custom-stateful-
operator shape (applyInPandasWithState + GroupStateTimeout).

State per user is O(1) (three scalars), so the state store stays
bounded by |active users|, not |events| — the property that matters at
10^12 events. Differential contract (tested): on a finite stream
replayed through micro-batches, emitted sessions ≡ the batch
sessionizer's sessions on the same input.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

# state: (session_start_us, session_end_us, n_events)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterable[pd.DataFrame]:
    user_id = key[0]
    closed: list[tuple[str, int, int, int]] = []

    if state.hasTimedOut:
        # watermark passed last event + gap: flush the open session
        if state.exists:
            start, end, n = state.get
            closed.append((user_id, start, end, n))
            state.remove()
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_us", "session_end_us", "n_events"],
        )
        return

    # current open session (if any) from previous batches
    if state.exists:
        cur_start, cur_end, cur_n = state.get
    else:
        cur_start = cur_end = cur_n = None

    ts = (
        pd.concat(list(pdfs), ignore_index=True)["ts_us"]
        .sort_values(kind="mergesort")
        .to_numpy()
    )
    for t in ts:
        t = int(t)
        if cur_start is None:
            cur_start, cur_end, cur_n = t, t, 1
        elif t - cur_end > gap_us:
            closed.append((user_id, cur_start, cur_end, cur_n))
            cur_start, cur_end, cur_n = t, t, 1
        else:
            cur_end, cur_n = t, cur_n + 1

    state.update((cur_start, cur_end, cur_n))
    # flush when the event-time watermark passes the session's gap horizon
    state.setTimeoutTimestamp(cur_end // 1000 + (gap_us // 1000))
    yield pd.DataFrame(
        closed,
        columns=["user_id", "session_start_us", "session_end_us", "n_events"],
    )


def stream_sessionize(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user session windows over a stream of (user_id, ts, ...).

    Emits one row per CLOSED session (user_id, session_start_us,
    session_end_us, n_events); a session closes when a later event of
    the same user arrives past the gap, or when the watermark passes
    its last event + gap (event-time state timeout).

    Timestamps ride as microseconds (``unix_micros``) — the same
    precision contract as the batch sessionizer (second-truncation
    flips sessions whose gap falls within 1s of the boundary).
    """
    from pyspark.sql import functions as F

    gap_us = gap_seconds * 1_000_000
    prepared = (
        events_stream.withWatermark("ts", watermark)
        .select(
            "user_id",
            "ts",
            F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC")).alias(
                "ts_us"
            ),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        lambda key, pdfs, state: _sessionize_group(key, pdfs, state, gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
