"""Per-entity time-series operators (SURVEY.md §2.4/§2.5).

The reference computes these with per-coin pandas loops
(notebooks/EDA.ipynb:813-828, notebooks/transform_data.ipynb cell 6);
here every operator is a window expression over
``Window.partitionBy(entity).orderBy(date)`` so *all* entities compute
in one distributed pass.

Scale note: every function in this module uses the same window
partitioning, so a chain of them compiles to ONE shuffle (a single
Exchange hashpartitioning(entity)) followed by a single sort — Catalyst
reuses the child distribution across Window operators with identical
specs. That property is the whole design: at 100 TB the shuffle is the
cost, and we pay it once.

Statistical parity traps handled here (SURVEY.md §7 risk register):
  * pandas ``pct_change`` → (x/lag(x) - 1), null first row per entity.
  * ``np.var(..)`` is population variance (ddof=0) → ``var_pop``.
  * ``scipy.stats.zscore`` is population std → ``stddev_pop``.
  * pandas ``rolling(7).skew()`` is *bias-corrected* (Fisher-Pearson
    G1); Spark's ``skewness`` is population g1 — we derive
    G1 = g1 * sqrt(n(n-1))/(n-2) from raw windowed moments.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

ENTITY = "entity_id"
DATE = "fetch_date"
PRICE = "price"


def entity_window(entity: str = ENTITY, date: str = DATE) -> Window:
    return Window.partitionBy(entity).orderBy(date)


def daily_price_series(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """events → unique (entity, day) price series.

    Stand-in for the reference's coin_history silver table
    (sql/create_tables.sql:4-12): one price per (coin_id, fetch_date).
    ``max`` (not ``avg``) keeps the reduction exact/order-independent —
    bit-identical whatever the partitioning, which matters for the
    comparison-driven gaps-and-islands logic downstream.
    """
    return (
        events.where(F.col(value_col).isNotNull())  # P2: IS NOT NULL guard
        .groupBy(
            F.col(entity_col).alias(ENTITY),
            F.to_date(F.col(ts_col)).alias(DATE),
        )
        .agg(F.max(value_col).alias(PRICE))
    )


def with_pct_change(df: DataFrame, entity: str = ENTITY, date: str = DATE, price: str = PRICE) -> DataFrame:
    """W4: pandas ``groupby(coin).price.pct_change()*100`` (EDA.ipynb:816)."""
    w = entity_window(entity, date)
    prev = F.lag(price, 1).over(w)
    return df.withColumn("pct_change", (F.col(price) / prev - 1) * 100)


def with_lag_features(
    df: DataFrame, n: int = 7, entity: str = ENTITY, date: str = DATE, price: str = PRICE
) -> DataFrame:
    """W6: price_lag_1..n (transform_data.ipynb:517-518)."""
    w = entity_window(entity, date)
    for i in range(1, n + 1):
        df = df.withColumn(f"price_lag_{i}", F.lag(price, i).over(w))
    return df


def with_lead_target(df: DataFrame, entity: str = ENTITY, date: str = DATE, price: str = PRICE) -> DataFrame:
    """W5: next_day_price = shift(-1) (transform_data.ipynb:521)."""
    return df.withColumn("next_day_price", F.lead(price, 1).over(entity_window(entity, date)))


def with_rolling_trend(df: DataFrame, entity: str = ENTITY, date: str = DATE, price: str = PRICE) -> DataFrame:
    """W7: 8-row trend ((p_t/p_{t-7})-1)*100, null until 8 rows
    (EDA.ipynb:1600-1619)."""
    w = entity_window(entity, date)
    p7 = F.lag(price, 7).over(w)
    return df.withColumn("rolling_7d_trend", (F.col(price) / p7 - 1) * 100)


def with_rolling_variance(df: DataFrame, entity: str = ENTITY, date: str = DATE, price: str = PRICE) -> DataFrame:
    """W8: np.var over trailing 8 rows — POPULATION variance, ddof=0
    (EDA.ipynb:1615); null until the window holds 8 rows."""
    w = entity_window(entity, date).rowsBetween(-7, 0)
    n = F.count(price).over(w)
    return df.withColumn(
        "rolling_7d_variance",
        F.when(n == 8, F.var_pop(price).over(w)),
    )


def with_rolling_skew(df: DataFrame, entity: str = ENTITY, date: str = DATE, price: str = PRICE) -> DataFrame:
    """W9: pandas rolling(7).skew() — bias-corrected Fisher-Pearson G1
    (transform_data.ipynb:524). Derived from raw moments so it stays a
    pure JVM window expression (no Python UDF in the hot path):
        g1 = m3 / m2^1.5        (population skew)
        G1 = g1 * sqrt(n(n-1)) / (n-2)
    """
    w = entity_window(entity, date).rowsBetween(-6, 0)
    n = F.count(price).over(w)
    x = F.col(price)
    m1 = F.avg(x).over(w)
    m2 = F.avg(x * x).over(w) - m1 * m1
    m3 = F.avg(x * x * x).over(w) - 3 * m1 * F.avg(x * x).over(w) + 2 * m1 * m1 * m1
    g1 = m3 / F.pow(m2, 1.5)
    corr = F.sqrt((n * (n - 1)).cast("double")) / (n - 2)
    return df.withColumn("price_skew_7d", F.when(n == 7, g1 * corr))


def with_return_features(df: DataFrame, entity: str = ENTITY, date: str = DATE) -> DataFrame:
    """W10: return_abs = abs(pct_change); 7-row rolling mean of it
    (transform_data.ipynb:551-552). Requires ``pct_change`` present."""
    w = entity_window(entity, date).rowsBetween(-6, 0)
    ret = F.abs(F.col("pct_change"))
    n = F.count(ret).over(w)
    return df.withColumn("return_abs", ret).withColumn(
        "return_rolling_mean_7d", F.when(n == 7, F.avg(ret).over(w))
    )


def with_minmax_norm(df: DataFrame, entity: str = ENTITY, price: str = PRICE) -> DataFrame:
    """A11: per-entity MinMaxScaler over the FULL column
    (transform_data.ipynb:569-570) — fit before any dropna, replicating
    the reference's leakage faithfully (SURVEY §7 risk 4)."""
    w = Window.partitionBy(entity)
    lo, hi = F.min(price).over(w), F.max(price).over(w)
    return df.withColumn("price_normalized", (F.col(price) - lo) / (hi - lo))


def with_zscore(df: DataFrame, entity: str = ENTITY, price: str = PRICE) -> DataFrame:
    """A12: scipy.stats.zscore, ddof=0 → stddev_POP
    (transform_data.ipynb:573)."""
    w = Window.partitionBy(entity)
    mu, sd = F.avg(price).over(w), F.stddev_pop(price).over(w)
    return df.withColumn("price_standardized", (F.col(price) - mu) / sd)


def monthly_min_max(df: DataFrame, entity: str = ENTITY, date: str = DATE, price: str = PRICE) -> DataFrame:
    """A5/S8: the maintained gold aggregate (crypto_app/db.py:150-197).

    The reference incrementally upserts per touched (coin, month) on
    every insert; Spark-idiomatically this is an idempotent full
    recompute — a single partial-aggregated (map-side combined) shuffle.
    """
    return df.groupBy(
        F.col(entity),
        F.year(date).cast("int").alias("year"),
        F.month(date).cast("int").alias("month"),
    ).agg(
        F.min(price).alias("min_price"),
        F.max(price).alias("max_price"),
    )


def monthly_avg(df: DataFrame, entity: str = ENTITY, date: str = DATE, price: str = PRICE) -> DataFrame:
    """A1 — Query 1, monthly average price
    (sql/analysis_queries.sql:4-12): group by entity + EXTRACT(year/
    month), ROUND(AVG(price),2), ordered.

    The +1e-9 nudge (mirrored in the oracle SQL) keeps rounding
    deterministic: 2-decimal inputs make averages land exactly on
    .xx5, where float-sum order and round-half conventions differ
    across engines; the nudge resolves every such tie upward, matching
    PostgreSQL NUMERIC half-away-from-zero on positive prices."""
    return (
        df.where(F.col(price).isNotNull())
        .groupBy(
            F.col(entity),
            F.year(date).cast("int").alias("year"),
            F.month(date).cast("int").alias("month"),
        )
        .agg(F.round(F.avg(price) + F.lit(1e-9), 2).alias("avg_price"))
        .orderBy(entity, "year", "month")
    )


def latest_per_entity(df: DataFrame, entity: str = ENTITY, date: str = DATE) -> DataFrame:
    """A8: PostgreSQL ``DISTINCT ON (coin) ... ORDER BY date DESC``
    (sql/analysis_queries.sql:72-80) → row_number over a descending
    window, keep rn=1."""
    w = Window.partitionBy(entity).orderBy(F.col(date).desc())
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def resample_daily_locf(
    df: DataFrame, entity: str = ENTITY, date: str = DATE, price: str = PRICE
) -> DataFrame:
    """Densify each entity's series to a full daily calendar between
    its own min/max dates and carry the last observation forward —
    pandas ``asfreq('D').ffill()`` (the reference's implied
    fixed-frequency convention: EDA.ipynb treats fetch days as a daily
    grid). ``is_gap`` marks the synthesized rows. Filled values are
    exact copies of observed ones, never interpolations.

    Scale: the calendar explodes from the per-entity bounds aggregate
    (2 dates per entity), the left join and the LOCF window cluster on
    the entity key, and output growth is bounded by each entity's span
    in days."""
    bounds = df.groupBy(entity).agg(F.min(date).alias("d0"), F.max(date).alias("d1"))
    cal = bounds.select(entity, F.explode(F.sequence("d0", "d1")).alias(date))
    joined = cal.join(df.select(entity, date, price), [entity, date], "left")
    w = (
        Window.partitionBy(entity)
        .orderBy(date)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        entity,
        date,
        F.last(price, ignorenulls=True).over(w).alias(price),
        F.col(price).isNull().cast("int").alias("is_gap"),
    )


def with_ewma(
    df: DataFrame,
    value: str = PRICE,
    alpha: float = 0.3,
    window: int = 10,
    entity: str = ENTITY,
    date: str = DATE,
    out: str = "ewma_price",
) -> DataFrame:
    """Exponentially weighted moving average over the trailing
    ``window`` rows (pandas ``ewm(alpha, adjust=True)`` semantics,
    truncated to the bounded frame): newest observation weighted 1,
    each step older multiplied by (1-alpha); value = weighted sum /
    weight sum. The finance-native smoother the reference's rolling
    means approximate.

    Exact-order evaluation: the frame's values are collected as
    (date, value) structs and sort_array'd — NOT raw collect_list
    order, which Spark does not contractually guarantee — so the fold
    order is deterministic and the DuckDB twin (frame-ordered window
    list) reproduces it. All math is higher-order array expressions in
    the JVM; one Exchange on the entity key shared with every other
    window in the chain. Rounded 6 dp (engine-portable)."""
    w = (
        Window.partitionBy(entity)
        .orderBy(date)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    staged = df.withColumn(
        "_ew_vals",
        F.transform(
            F.sort_array(F.collect_list(F.struct(date, value)).over(w)),
            lambda s: s[value],
        ),
    )
    vals = F.col("_ew_vals")
    n = F.size(vals)
    decay = F.lit(1.0 - alpha)
    powers = F.transform(
        F.sequence(n - 1, F.lit(0), F.lit(-1)),
        lambda p: F.pow(decay, p.cast("double")),
    )
    # NULL observations drop from BOTH sums (a bare `a + x` fold would
    # null-poison the whole window once one value is null); the weight
    # of a null slot leaves the denominator too, so remaining values
    # renormalize — matching the DuckDB twin's null-skipping list_sum
    # over identically-nulled products/weights.
    num = F.aggregate(
        F.zip_with(vals, powers, lambda v, g: F.when(v.isNotNull(), v * g).otherwise(0.0)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    den = F.aggregate(
        F.zip_with(vals, powers, lambda v, g: F.when(v.isNotNull(), g).otherwise(0.0)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return staged.withColumn(
        out, F.round(F.when(den > 0, num / den), 6)
    ).drop("_ew_vals")
