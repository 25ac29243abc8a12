"""Custom stateful streaming operator: gap-based sessionization.

This is the operator class Spark's built-in streaming aggregations
cannot express (per-key inactivity-gap session windows with arbitrary
per-session aggregates, emitted exactly when a session closes), so it
drops to ``applyInPandasWithState`` — the Arrow-batched stateful API:
state lives in Spark's checkpointed state store keyed by user, batches
arrive as pandas frames, and emission happens on session close.

Semantics mirror the batch `sessionization` catalog query
(plans/core_queries.py): a new session starts when the gap since the
key's previous event exceeds ``gap_us`` (exact integer microsecond
math, engine-portable). A session is EMITTED once a later event proves
it closed; the trailing open session per key stays in state across
micro-batches (and across restarts via the checkpoint) until either a
future event closes it or — with ``timeout=True`` — the event-time
watermark passes ``last_event + gap``, which flushes the session and
CLEARS its state. Without the timeout, state is monotonically growing
in the number of ever-seen keys; with it, state is bounded by the keys
active inside one gap window — the difference between a state store
that fits forever and one that OOMs after enough distinct users.

Scale notes: state is one fixed-width row per ACTIVE key (4 longs +
1 double), the minimum possible; the shuffle is the groupBy(user) the
stateful operator requires anyway; per-batch work is a vectorized
pandas pass over each key's new events.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

GAP_US_DEFAULT = 1_800_000_000  # 30 min, matching the batch twin

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# (session_start_us, last_event_us, n_events, total_value)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _session_fn(gap_us: int, timeout: bool):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us = last_us = None
            n, total = 0, 0.0

        if timeout and state.hasTimedOut:
            # Watermark passed last_us + gap with no new event: the open
            # session is provably closed. Emit it and drop the state row.
            state.remove()
            yield pd.DataFrame(
                [(user_id, start_us, last_us, n, total)],
                columns=[
                    "user_id",
                    "session_start_us",
                    "session_end_us",
                    "n_events",
                    "total_value",
                ],
            )
            return

        closed: list[tuple] = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        # event-time order within the batch; ts arrives as pandas
        # datetime64[ns] (or [us]) — .view/astype to integer micros
        batch = batch.sort_values(["us", "event_id"])
        for us, value in zip(batch["us"], batch["value"]):
            us = int(us)
            if last_us is not None and us - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n, total))
                start_us, n, total = us, 0, 0.0
            if start_us is None:
                start_us = us
            last_us = us
            n += 1
            total += float(value) if value is not None and value == value else 0.0

        state.update((start_us, last_us, n, total))
        if timeout:
            # GroupState timestamps are milliseconds; round UP so the
            # timeout can never fire a hair before the gap truly elapsed.
            state.setTimeoutTimestamp(-(-(last_us + gap_us) // 1000))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start_us",
                    "session_end_us",
                    "n_events",
                    "total_value",
                ],
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_us: int = GAP_US_DEFAULT,
    *,
    timeout: bool = False,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """events (user_id, event_id, ts, value) → closed-session rows.

    Works on a streaming OR batch DataFrame (applyInPandasWithState is
    streaming-only; for batch input Spark runs it as a single batch
    with empty initial state — handy for tests and backfills).

    ``timeout=True`` (streaming only) additionally flushes idle
    sessions once the event-time watermark — driven by ``ts`` minus
    ``watermark_delay`` of allowed lateness — passes the session's
    ``last_event + gap``, and evicts their state. An event later than
    ``watermark_delay`` can reopen an already-flushed session as a
    duplicate (standard watermark contract); size the delay to the
    source's real lateness.
    """
    prepared = events.selectExpr(
        "user_id", "event_id", "ts", "unix_micros(ts) AS us", "value"
    )
    if timeout:
        # the watermark column must survive into the stateful operator's
        # input for EventTimeTimeout to bind; the pandas fn ignores it
        prepared = prepared.withWatermark("ts", watermark_delay)
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_us, timeout),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout if timeout else GroupStateTimeout.NoTimeout
        ),
    )
