"""As-of (nearest-event) and bounded range joins over event time.

The reference has no temporal-join operator (its only joins are the
equi/self joins of sql/analysis_queries.sql:23-89), but any pipeline
that enriches a fact stream with the latest state of another stream
needs one, so the engine ships both classic temporal joins:

``asof_join``
    For every left row, the single most recent right row (same key,
    right_ts <= left_ts).  Implemented with the union + window trick:
    tag both sides, union them, and take ``last(payload, ignorenulls)``
    over a window partitioned by key and ordered by (ts, side).  Cost
    model: ONE shuffle of |L|+|R| rows on the join key, a sort within
    each partition, zero row amplification — unlike an inequality join,
    which Spark plans as BroadcastNestedLoop (quadratic).  At 100 TB
    this is the only formulation that survives: it is exactly a
    sort-merge join's shuffle with no probe-side explosion.

``range_join_agg``
    Aggregate right rows falling in a bounded time interval around each
    left row.  A naive ``l.ts BETWEEN r.ts + lo AND r.ts + hi`` join is
    a nested-loop plan; instead both sides are mapped onto fixed-width
    time buckets (width = hi - lo, so every left interval overlaps at
    most two buckets) and joined on (key, bucket) — an equi hash join —
    then the exact range predicate filters the at-most-2x candidates.
    This is the standard "banding" trick for interval joins and keeps
    the plan shuffle-hash/sort-merge at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

_PAYLOAD = "__asof_payload"
_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    *,
    allow_exact: bool = True,
) -> DataFrame:
    """Left as-of join: attach the latest right row at-or-before each
    left row's timestamp (strictly-before when ``allow_exact=False``).

    Returns every left column plus ``right_cols`` and ``right_ts``
    (null when no prior right row exists).  Right rows that share a
    (key, right_ts) must be pre-deduplicated by the caller if the
    tiebreak matters; this operator keeps whichever sorts last.
    """
    on = list(on)
    # Right side carries its columns inside one non-null struct so that
    # last(ignorenulls) never skips a legitimately-null right value.
    right_payload = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0 if allow_exact else 1).alias(_SIDE),
        F.struct(F.col(right_ts).alias(right_ts), *[F.col(c) for c in right_cols]).alias(_PAYLOAD),
    )
    left_cols = left.columns
    left_tagged = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1 if allow_exact else 0).alias(_SIDE),
        F.lit(None).cast(right_payload.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    # Align schemas for unionByName: right side lacks the left columns.
    unioned = left_tagged.unionByName(right_payload, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    is_left = F.col(_SIDE) == (1 if allow_exact else 0)
    return matched.filter(is_left).select(
        *left_cols,
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in [right_ts, *right_cols]],
    )


def range_join_agg(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    aggs: Sequence,
) -> DataFrame:
    """For each left row, aggregate right rows with
    ``right_ts`` in ``[left_ts + lower_s, left_ts + upper_s]`` seconds.

    ``aggs`` are aggregate Columns over the right side's non-key
    columns, which are exposed with an ``_r`` suffix (``value`` →
    ``value_r``) to avoid colliding with left columns.  Use them
    null-aware: unmatched left rows contribute one all-null right row,
    so ``count(value_r)`` is 0 and sums are null → coalesce.

    Each left ROW aggregates independently (a unique per-row id is
    attached before the join), so two fully-identical left rows produce
    two output rows rather than collapsing with merged counts.
    """
    on = list(on)
    clash = [c for c in left.columns if c.startswith("__r") or c.endswith("_r")]
    if clash:
        raise ValueError(
            f"left columns {clash} collide with the '_r'-suffixed right-side "
            "namespace; rename them before calling range_join_agg"
        )
    width_us = max(1, int(round((upper_s - lower_s) * 1_000_000)))
    lo_us = int(round(lower_s * 1_000_000))
    hi_us = int(round(upper_s * 1_000_000))

    def _floordiv(col, w):
        # Exact floor division in long arithmetic (pmod is always >= 0),
        # immune to the double-rounding edge cases of floor(col / w).
        return ((col - F.pmod(col, F.lit(w))) / w).cast("long")

    r = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in on],
        F.unix_micros(F.col(right_ts)).alias("__r_us"),
        *[F.col(c).alias(f"__rv_{c}") for c in right.columns if c not in on],
    ).withColumn("__bucket", _floordiv(F.col("__r_us"), width_us))

    l_us = F.unix_micros(F.col(left_ts))
    # A [ts+lo, ts+hi] interval of width == bucket width overlaps at
    # most two buckets; explode the left row to exactly those probes so
    # the join stays an equi join on (key, bucket).  __rid keeps
    # duplicate left rows distinct through the final regroup.
    lt = left.withColumn("__rid", F.monotonically_increasing_id()).withColumn(
        "__l_us", l_us
    ).withColumn(
        "__bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    _floordiv(F.col("__l_us") + F.lit(lo_us), width_us),
                    _floordiv(F.col("__l_us") + F.lit(hi_us), width_us),
                )
            )
        ),
    )

    join_cond = [lt[c] == r[f"__r_{c}"] for c in on] + [lt["__bucket"] == r["__bucket"]]
    in_range = F.col("__r_us").between(F.col("__l_us") + lo_us, F.col("__l_us") + hi_us)
    joined = lt.join(r, join_cond, "left").withColumn(
        "__hit", F.when(in_range, F.lit(1))
    )
    # Null out right values of out-of-range candidates instead of
    # filtering them, so left rows with zero matches survive (their
    # probe rows all aggregate to null).
    rv_cols = [c for c in joined.columns if c.startswith("__rv_") or c == "__r_us"]
    for c in rv_cols:
        joined = joined.withColumn(c, F.when(F.col("__hit") == 1, F.col(c)))
    renamed = joined.select(
        F.col("__rid"),
        *[F.col(c) for c in left.columns],
        *[F.col(c).alias(c.removeprefix("__rv_") + "_r") for c in rv_cols if c != "__r_us"],
    )
    return renamed.groupBy("__rid", *left.columns).agg(*aggs).drop("__rid")
