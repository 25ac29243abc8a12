"""Gaps-and-islands "recovery after ≥N consecutive down days" pipeline.

Spark-first translation of the reference's flagship Query 2
(sql/analysis_queries.sql:23-89), a 5-CTE PostgreSQL pipeline:

  daily_changes     — LAG + is_drop_day flag            (W1, W2)
  drop_sequences    — running SUM of non-drop days → island id (W3)
  consecutive_drops — per-island COUNT/MIN/MAX, HAVING >= 3   (A2)
  price_increases   — range join back to history + group MIN  (J1, A3)
  latest_market_cap — DISTINCT ON latest row + JSON extract   (A8, F3)
  final             — join + AVG pct gain + T/B formatting    (J2, A4, F5)

Each CTE is a named, individually-testable DataFrame stage.

Semantics replicated VERBATIM, including the reference's quirk of
grouping price_increases by ``h.price_usd`` (sql/analysis_queries.sql:69)
— so ALL recovery rows enter the final average, not just the first
(SURVEY §7 risk 3). Do not "fix".

Scale notes:
  * The window stages all partition by entity → one Exchange reused.
  * The recovery join is equi on entity with two range residuals;
    the strategy is left to AQE, which measures the drops side at
    runtime: small (the sf fixtures — islands with >= 3 drops are
    rare relative to history) → broadcast-hash with the history side
    unshuffled; entity-proportional at 100M entities → sort-merge
    instead of a forced-broadcast driver OOM. No hint: "drops is
    smaller than history" does not bound it below the broadcast
    threshold, and hints override thresholds unconditionally.
  * Same reasoning for the final market-cap join: caps has one row
    per entity, so it too is measured, not hinted. (Genuinely fixed-
    size dimension tables keep their hints in sources/tables.py:
    BROADCAST_DIMS.)
  * The residual range predicates evaluate inside codegen either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from crypto_data_pipeline_spark.operators.timeseries import DATE, ENTITY, PRICE, latest_per_entity


def daily_changes(history: DataFrame) -> DataFrame:
    """W1/W2 (sql/analysis_queries.sql:26-35): previous price + drop flag."""
    w = Window.partitionBy(ENTITY).orderBy(DATE)
    prev = F.lag(PRICE, 1).over(w)
    return (
        history.where(F.col(PRICE).isNotNull())
        .select(
            ENTITY,
            DATE,
            PRICE,
            prev.alias("prev_price"),
            F.when(F.col(PRICE) < prev, 1).otherwise(0).alias("is_drop_day"),
        )
    )


def drop_sequences(changes: DataFrame) -> DataFrame:
    """W3 (sql/analysis_queries.sql:38-44): running count of NON-drop
    days = island id shared by each maximal run of consecutive drops."""
    w = (
        Window.partitionBy(ENTITY)
        .orderBy(DATE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    island = F.sum(F.when(F.col("is_drop_day") == 0, 1).otherwise(0)).over(w)
    return changes.withColumn("drop_group", island)


def consecutive_drops(seqs: DataFrame, min_days: int = 3) -> DataFrame:
    """A2 (sql/analysis_queries.sql:46-56): per-island aggregate with
    HAVING count >= min_days; only drop rows belong to the island."""
    return (
        seqs.where(F.col("is_drop_day") == 1)
        .groupBy(ENTITY, "drop_group")
        .agg(
            F.count(F.lit(1)).alias("consecutive_days"),
            F.min(PRICE).alias("lowest_price"),
            F.max(DATE).alias("end_date"),
        )
        .where(F.col("consecutive_days") >= min_days)
    )


def price_increases(drops: DataFrame, history: DataFrame) -> DataFrame:
    """J1 + A3 (sql/analysis_queries.sql:58-69): for each qualifying
    drop island, find history rows after end_date with price above the
    island minimum; group-min of date — grouped ALSO by the recovery
    price, reproducing the reference's all-recovery-rows semantics."""
    h = history.where(F.col(PRICE).isNotNull()).select(
        F.col(ENTITY).alias("h_entity"),
        F.col(DATE).alias("h_date"),
        F.col(PRICE).alias("h_price"),
    )
    joined = h.join(
        drops,
        (F.col("h_entity") == F.col(ENTITY))
        & (F.col("h_date") > F.col("end_date"))
        & (F.col("h_price") > F.col("lowest_price")),
        "inner",
    )
    return joined.groupBy(
        ENTITY, "lowest_price", "end_date", F.col("h_price").alias("recovery_price")
    ).agg(F.min("h_date").alias("recovery_date"))


def format_market_cap(cap) -> Column:
    """F5 (sql/analysis_queries.sql:74-78): human-format a market cap —
    ``round(x/1e12,2)||'T'`` at or above a trillion, else ``...||'B'``,
    NULL passthrough."""
    cap = F.col(cap) if isinstance(cap, str) else cap
    return (
        F.when(cap >= 1e12, F.concat(F.round(cap / 1e12, 2).cast("string"), F.lit("T")))
        .when(cap.isNotNull(), F.concat(F.round(cap / 1e9, 2).cast("string"), F.lit("B")))
    )


def latest_market_cap(
    raw: DataFrame,
    entity_col: str = ENTITY,
    date_col: str = DATE,
    json_col: str = "props",
    json_path: str = "$.market_data.market_cap.usd",
    scale: float = 1.0,
) -> DataFrame:
    """A8 + F3 + F5 (sql/analysis_queries.sql:71-80): latest row per
    entity, JSONB-path market cap extract, human T/B formatting."""
    latest = latest_per_entity(raw, entity_col, date_col)
    cap = F.get_json_object(F.col(json_col), json_path).cast("double") * F.lit(scale)
    return latest.select(
        F.col(entity_col),
        cap.alias("market_cap"),
        format_market_cap(cap).alias("market_cap_formatted"),
    )


def recovery_report(history: DataFrame, caps: DataFrame) -> DataFrame:
    """J2 + A4 (sql/analysis_queries.sql:82-89): final per-entity average
    recovery gain, left-joined with the formatted latest market cap,
    sorted by gain descending."""
    drops = consecutive_drops(drop_sequences(daily_changes(history)))
    incr = price_increases(drops, history)
    gain = (F.col("recovery_price") - F.col("lowest_price")) / F.col("lowest_price") * 100
    report = (
        incr.groupBy(ENTITY)
        .agg(F.round(F.avg(gain) + F.lit(1e-9), 2).alias("avg_price_increase_pct"))
        .join(caps, ENTITY, "left")
        .orderBy(F.col("avg_price_increase_pct").desc())
    )
    return report
