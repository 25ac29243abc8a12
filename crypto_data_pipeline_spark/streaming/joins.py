"""Stream-stream interval join: purchases enriched with the same
user's clicks in a bounded preceding window, both sides unbounded
streams.

The reference pipeline is batch-only (its joins are the equi/self
joins of sql/analysis_queries.sql:23-89); this is the streaming twin
of ``operators/asof.py:range_join_agg`` — the operator an always-on
deployment of the same pipeline needs.

Spark-first design, sized for an unbounded 100 TB/day stream:
  * both sides carry an event-time WATERMARK and the join condition
    carries an explicit time bound, so the state store provably evicts
    click state older than (watermark - lookback) and purchase state
    older than the watermark — state is O(lookback window), not O(stream);
  * the join is a plain equi join on user_id with the interval as a
    residual predicate, so it shuffles both streams once on the key —
    the same plan shape as the batch banding trick, maintained
    incrementally;
  * append output mode: each matched pair emits exactly once, when
    both sides have arrived.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def click_purchase_pairs(
    events: DataFrame,
    lookback: str = "1 hour",
    watermark_delay: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """(purchase, click) pairs where the click landed within
    ``lookback`` before the purchase, for the same user.

    ``events`` may be a streaming OR batch frame with the events-table
    schema — the plan is identical (the batch twin is how the streaming
    result is differentially tested), only the physical execution
    differs (micro-batch symmetric hash join vs one-shot join).

    Returns (event_id, user_id, purchase_us, click_us, click_value):
    epoch-microsecond longs rather than timestamps so the output is
    bit-stable across engines and sinks.

    ``how="left_outer"`` additionally emits click-less purchases with
    null click columns. In streaming, an outer row is held until the
    watermark proves no matching click can still arrive (purchase_ts +
    lookback + watermark_delay), then emitted exactly once — the state
    store's eviction doubles as the "no match exists" proof.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark_delay)
        purchases = purchases.withWatermark("purchase_ts", watermark_delay)
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")),
        how,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("purchase_ts").alias("purchase_us"),
        F.unix_micros("click_ts").alias("click_us"),
        "click_value",
    )
