"""Core query catalog: SURVEY.md §2 operators mapped onto the driver's
synthetic tables (TESTDATA.md / FIXTURES.md §5 mapping):

  * coin_id / fetch_date / price_usd time series → ``events``
    (user_id = entity, CAST(ts AS DATE) = day, max(value) = price —
    max, not avg, so the daily reduction is exact/order-independent
    and comparison-driven logic downstream is engine-portable).
  * response_data JSONB → ``events.props`` JSON (key ``k``), scaled
    ×5e10 so the market-cap T/B formatter hits both branches.
  * monthly aggregates / scans / joins → ``orders``/``lineitem`` star.

Every oracle string is DuckDB SQL with the SAME expression structure as
the Spark plan (same operation order → IEEE-identical results for pure
arithmetic; aggregation-order-dependent outputs are rounded on BOTH
sides).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from crypto_data_pipeline_spark.operators import calendar as cal
from crypto_data_pipeline_spark.operators import islands, risk, stats, timeseries as ts
from crypto_data_pipeline_spark.operators.timeseries import DATE, ENTITY, PRICE
from crypto_data_pipeline_spark.plans.registry import register
from crypto_data_pipeline_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# shared fragments

HISTORY_CTE = """history AS (
  SELECT user_id AS entity_id, CAST(ts AS DATE) AS fetch_date, max(value) AS price
  FROM events
  WHERE value IS NOT NULL
  GROUP BY 1, 2
)"""

W_ENTITY = "(PARTITION BY entity_id ORDER BY fetch_date)"


_SILVER_CACHE: dict[tuple[str, str], DataFrame] = {}


def _history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared silver daily-price table, materialized ONCE per
    (session, sf_dir) as a parquet table bucketed AND sorted by the
    entity key, then served from the bucketed scan.

    Every coin-series query downstream windows or aggregates on
    entity_id, so without this each of ~20 queries re-pays the full
    events scan plus the events→daily groupBy Exchange. The bucketed
    layout (sources/bucketed.py) means the scan itself satisfies the
    windows' required distribution — no Exchange below the window —
    and the in-bucket sort (one file per bucket via the pre-write
    repartition) satisfies their sort order too. This is the classic
    bronze→silver layering a 100 TB deployment would run: pay the
    events shuffle once at ingest, amortize it over every query.

    Falls back to the inline daily aggregation when the session cannot
    write a catalog table (read-only warehouse); results are identical
    either way (the daily reduction is exact max, and doubles
    round-trip parquet bit-for-bit).
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    out = _SILVER_CACHE.get(key)
    if out is None:
        daily = ts.daily_price_series(load_table(spark, sf_dir, "events"))
        try:
            import hashlib
            import tempfile

            from crypto_data_pipeline_spark.sources.bucketed import write_bucketed

            # Table name AND location are session-unique: a name keyed
            # only on sf_dir collides with a previous session's leftover
            # warehouse directory (saveAsTable refuses the existing
            # path), which silently downgraded every later session to
            # the unbucketed fallback. The external tempdir path keeps
            # the default warehouse clean and collision-free.
            sid = hashlib.md5(f"{key[0]}:{sf_dir}".encode()).hexdigest()[:10]
            tbl = f"silver_history_{sid}"
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            # the tempdir must outlive the session (the table reads from
            # it) but not the process — without the atexit hook each
            # (session, sf_dir) leaks a full silver copy in /tmp
            import atexit
            import shutil

            silver_dir = tempfile.mkdtemp(prefix=f"silver_{sid}_")
            atexit.register(shutil.rmtree, silver_dir, ignore_errors=True)
            write_bucketed(
                daily.repartition(32, ENTITY),
                tbl,
                [ENTITY],
                32,
                sort_cols=[ENTITY, DATE],
                path=silver_dir,
            )
            out = spark.table(tbl)
        except Exception as exc:
            # Loud downgrade: the zero-Exchange bucketed path silently
            # dying already bit us once (round-3 name collision, commit
            # 82e295f). Results stay correct either way, but a prod
            # misconfig would re-pay an Exchange per query — so name the
            # cause in the log and hard-fail when the caller demands the
            # bucketed layout (bench.py sets SPARK_GRAFT_REQUIRE_SILVER).
            import logging

            logging.getLogger(__name__).warning(
                "silver history downgrade: bucketed materialization "
                "failed (%s: %s); falling back to the inline daily "
                "aggregation — every downstream query re-pays the "
                "events->daily Exchange",
                type(exc).__name__,
                exc,
            )
            if os.environ.get("SPARK_GRAFT_REQUIRE_SILVER"):
                raise
            out = daily
        _SILVER_CACHE[key] = out
    return out


def history_is_bucketed(spark: SparkSession, sf_dir: str) -> bool:
    """True when `_history` serves the bucketed silver table AND a
    window-over-entity consumer plans with zero shuffle Exchanges (the
    fast path every coin-series query rides). Probing a windowed query
    rather than the bare scan matters: Spark disables bucketed reading
    when a plan doesn't need the distribution, so the scan line alone
    says 'Bucketed: false (disabled by query planner)' even when the
    layout is healthy. Used by bench.py to refuse to time the silently
    downgraded plan."""
    from crypto_data_pipeline_spark.sources.bucketed import exchange_count

    df = _history(spark, sf_dir)
    if "silver_history_" not in df._jdf.queryExecution().executedPlan().toString():
        return False
    w = Window.partitionBy(ENTITY).orderBy(DATE)
    probe = df.select(ENTITY, DATE, F.lag(PRICE).over(w).alias("_p"))
    return exchange_count(probe) == 0


# ---------------------------------------------------------------------------
# Query 1 — monthly average price (A1, F1, F2, P2, O1)


@register(
    "monthly_avg_price",
    survey_ids=("A1", "F1", "F2", "P2", "O1"),
    bench=True,
    oracle=f"""
WITH {HISTORY_CTE}
SELECT entity_id,
       CAST(year(fetch_date) AS INT) AS year,
       CAST(month(fetch_date) AS INT) AS month,
       round(avg(price) + 1e-9, 2) AS avg_price
FROM history
WHERE price IS NOT NULL
GROUP BY 1, 2, 3
""",
)
def monthly_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Query 1 (sql/analysis_queries.sql:4-12)."""
    return ts.monthly_avg(_history(spark, sf_dir))


# ---------------------------------------------------------------------------
# Query 2 — the flagship: recovery after >=3 consecutive down days
# (W1, W2, W3, A2, J1, A3, A8, F3, F5, J2, A4, O2)

_Q2_ORACLE = f"""
WITH {HISTORY_CTE},
daily_changes AS (
  SELECT entity_id, fetch_date, price,
         lag(price) OVER {W_ENTITY} AS prev_price,
         CASE WHEN price < lag(price) OVER {W_ENTITY} THEN 1 ELSE 0 END AS is_drop_day
  FROM history
  WHERE price IS NOT NULL
),
drop_sequences AS (
  SELECT *,
         SUM(CASE WHEN is_drop_day = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY entity_id ORDER BY fetch_date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS drop_group
  FROM daily_changes
),
consecutive_drops AS (
  SELECT entity_id, drop_group,
         count(*) AS consecutive_days,
         min(price) AS lowest_price,
         max(fetch_date) AS end_date
  FROM drop_sequences
  WHERE is_drop_day = 1
  GROUP BY 1, 2
  HAVING count(*) >= 3
),
price_increases AS (
  SELECT d.entity_id, d.lowest_price, d.end_date,
         h.price AS recovery_price,
         min(h.fetch_date) AS recovery_date
  FROM consecutive_drops d
  JOIN history h
    ON h.entity_id = d.entity_id
   AND h.fetch_date > d.end_date
   AND h.price > d.lowest_price
  GROUP BY 1, 2, 3, 4
),
latest_cap AS (
  SELECT entity_id, market_cap,
         CASE WHEN market_cap >= 1e12
              THEN CAST(round(market_cap / 1e12, 2) AS VARCHAR) || 'T'
              WHEN market_cap IS NOT NULL
              THEN CAST(round(market_cap / 1e9, 2) AS VARCHAR) || 'B'
         END AS market_cap_formatted
  FROM (
    SELECT user_id AS entity_id,
           CAST(json_extract_string(props, '$.k') AS DOUBLE) * 5e10 AS market_cap,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  )
  WHERE rn = 1
),
gains AS (
  SELECT entity_id,
         round(avg((recovery_price - lowest_price) / lowest_price * 100) + 1e-9, 2)
           AS avg_price_increase_pct
  FROM price_increases
  GROUP BY 1
)
SELECT g.entity_id, g.avg_price_increase_pct, c.market_cap, c.market_cap_formatted
FROM gains g
LEFT JOIN latest_cap c USING (entity_id)
"""


def _latest_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON (latest row per entity) as a max_by aggregate rather
    than a row_number window: the aggregate partial-combines map-side,
    so at scale only one pre-reduced row per (partition, entity) enters
    the shuffle instead of every event row through a full sort.
    (ts, event_id) is the unique order key, packed into a struct whose
    lexicographic max reproduces ORDER BY ts DESC, event_id DESC."""
    events = load_table(spark, sf_dir, "events")
    cap = F.get_json_object(F.col("latest.props"), "$.k").cast("double") * F.lit(5e10)
    return (
        events.groupBy(F.col("user_id").alias(ENTITY))
        .agg(F.max_by(F.struct("props"), F.struct("ts", "event_id")).alias("latest"))
        .select(
            ENTITY,
            cap.alias("market_cap"),
            islands.format_market_cap(cap).alias("market_cap_formatted"),
        )
    )


@register(
    "drop_recovery",
    survey_ids=("W1", "W2", "W3", "A2", "J1", "A3", "A8", "F3", "F5", "J2", "A4", "O2"),
    bench=True,
    oracle=_Q2_ORACLE,
)
def drop_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Query 2, the 5-CTE gaps-and-islands pipeline
    (sql/analysis_queries.sql:23-89)."""
    return islands.recovery_report(_history(spark, sf_dir), _latest_caps(spark, sf_dir))


@register(
    "reference_sql_verbatim",
    extra=True,
    survey_ids=("W1", "W2", "W3", "A2", "J1", "A3", "A8", "F3", "F5", "J2", "A4", "O2"),
    oracle=f"""
SELECT entity_id AS coin_id, avg_price_increase_pct,
       market_cap_formatted AS current_market_cap_usd
FROM ({_Q2_ORACLE})
""",
)
def reference_sql_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-frontend parity gate as a catalog query: the reference's
    `sql/analysis_queries.sql` executed VERBATIM through
    `sql/pg_compat.py` (PostgreSQL-dialect transpile + `coin_history`
    view), Query 2's result hash-checked against the same DuckDB
    oracle that gates the DataFrame implementation — so "a reference
    user can run the SQL they run today" is a driver-class-verified
    claim, not a README sentence."""
    from crypto_data_pipeline_spark.sql import run_reference_sql

    return run_reference_sql(spark, sf_dir)[1]


# ---------------------------------------------------------------------------
# W4 — pct_change


@register(
    "pct_change",
    extra=True,
    survey_ids=("W4", "W1"),
    oracle=f"""
WITH {HISTORY_CTE}
SELECT entity_id, fetch_date, price,
       (price / lag(price) OVER {W_ENTITY} - 1) * 100 AS pct_change
FROM history
""",
)
def pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas groupby().pct_change()*100 (EDA.ipynb:816). Pure IEEE
    arithmetic on identical operands → bit-exact vs the oracle, no
    rounding needed."""
    return ts.with_pct_change(_history(spark, sf_dir))


# ---------------------------------------------------------------------------
# W5/W6 — lag feature block + lead target


@register(
    "lag_lead_features",
    survey_ids=("W5", "W6"),
    extra=True,  # r6 rotation: W5/W6 driver-covered by prediction_features
    oracle=f"""
WITH {HISTORY_CTE}
SELECT entity_id, fetch_date, price,
       {", ".join(f"lag(price, {i}) OVER {W_ENTITY} AS price_lag_{i}" for i in range(1, 8))},
       lead(price, 1) OVER {W_ENTITY} AS next_day_price
FROM history
""",
)
def lag_lead_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_data.ipynb:517-521: price_lag_1..7 + next_day_price."""
    return ts.with_lead_target(ts.with_lag_features(_history(spark, sf_dir)))


# ---------------------------------------------------------------------------
# W7/W8 — rolling 8-row trend + population variance


@register(
    "rolling_trend_variance",
    extra=True,
    survey_ids=("W7", "W8"),
    bench=True,
    oracle=f"""
WITH {HISTORY_CTE}
SELECT entity_id, fetch_date, price,
       (price / lag(price, 7) OVER {W_ENTITY} - 1) * 100 AS rolling_7d_trend,
       CASE WHEN count(price) OVER w8 = 8
            THEN round(var_pop(price) OVER w8, 6) END AS rolling_7d_variance
FROM history
WINDOW w8 AS (PARTITION BY entity_id ORDER BY fetch_date
              ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
""",
)
def rolling_trend_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDA.ipynb:1596-1624 — trend is exact arithmetic; variance is
    POPULATION (np.var ddof=0), rounded both sides (accumulation
    order differs between engines)."""
    df = ts.with_rolling_variance(ts.with_rolling_trend(_history(spark, sf_dir)))
    return df.withColumn("rolling_7d_variance", F.round("rolling_7d_variance", 6))


# ---------------------------------------------------------------------------
# W9 — bias-corrected rolling skewness


@register(
    "rolling_skew",
    survey_ids=("W9",),
    extra=True,  # r6 rotation: W9 driver-covered by prediction_features
    oracle=f"""
WITH {HISTORY_CTE}
SELECT entity_id, fetch_date, price,
       CASE WHEN count(price) OVER w7 = 7 THEN round(
         ( (avg(price*price*price) OVER w7
            - 3 * avg(price) OVER w7 * avg(price*price) OVER w7
            + 2 * avg(price) OVER w7 * avg(price) OVER w7 * avg(price) OVER w7)
           / power(avg(price*price) OVER w7 - avg(price) OVER w7 * avg(price) OVER w7, 1.5)
         ) * (sqrt(42.0) / 5), 6) END AS price_skew_7d
FROM history
WINDOW w7 AS (PARTITION BY entity_id ORDER BY fetch_date
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def rolling_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas rolling(7).skew() = bias-corrected Fisher-Pearson G1
    (transform_data.ipynb:524), derived from windowed raw moments —
    stays in JVM codegen, no Python UDF."""
    df = ts.with_rolling_skew(_history(spark, sf_dir))
    return df.withColumn("price_skew_7d", F.round("price_skew_7d", 6))


# ---------------------------------------------------------------------------
# W4 + W10 — absolute return + rolling mean


@register(
    "rolling_return_mean",
    survey_ids=("W10", "W4", "F7"),
    oracle=f"""
WITH {HISTORY_CTE},
pc AS (
  SELECT entity_id, fetch_date, price,
         abs((price / lag(price) OVER {W_ENTITY} - 1) * 100) AS return_abs
  FROM history
)
SELECT entity_id, fetch_date, price, return_abs,
       CASE WHEN count(return_abs) OVER w7 = 7
            THEN round(avg(return_abs) OVER w7, 6) END AS return_rolling_mean_7d
FROM pc
WINDOW w7 AS (PARTITION BY entity_id ORDER BY fetch_date
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def rolling_return_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_data.ipynb:551-552."""
    df = ts.with_return_features(ts.with_pct_change(_history(spark, sf_dir)))
    return df.select(
        ENTITY, DATE, PRICE, "return_abs", F.round("return_rolling_mean_7d", 6).alias("return_rolling_mean_7d")
    )


# ---------------------------------------------------------------------------
# A11/A12 — full-column scaling


@register(
    "scaling",
    survey_ids=("A11", "A12"),
    extra=True,  # r6 rotation: A11/A12 driver-covered by prediction_features
    oracle=f"""
WITH {HISTORY_CTE}
SELECT entity_id, fetch_date, price,
       (price - min(price) OVER we) / (max(price) OVER we - min(price) OVER we)
         AS price_normalized,
       round((price - avg(price) OVER we) / stddev_pop(price) OVER we, 6)
         AS price_standardized
FROM history
WINDOW we AS (PARTITION BY entity_id)
""",
)
def scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinMaxScaler + population z-score over the FULL per-entity column
    (transform_data.ipynb:569-573) — fit before dropna, replicating the
    reference's leakage."""
    df = ts.with_zscore(ts.with_minmax_norm(_history(spark, sf_dir)))
    return df.withColumn("price_standardized", F.round("price_standardized", 6))


# ---------------------------------------------------------------------------
# A5 — maintained monthly min/max (gold table recompute)


@register(
    "monthly_min_max",
    survey_ids=("A5", "S8"),
    oracle=f"""
WITH {HISTORY_CTE}
SELECT entity_id,
       CAST(year(fetch_date) AS INT) AS year,
       CAST(month(fetch_date) AS INT) AS month,
       min(price) AS min_price,
       max(price) AS max_price
FROM history
GROUP BY 1, 2, 3
""",
)
def monthly_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """crypto_app/db.py:150-197 — idempotent full recompute replaces the
    reference's per-insert upsert."""
    return ts.monthly_min_max(_history(spark, sf_dir))


# ---------------------------------------------------------------------------
# A8 + F3 — latest event per user with JSON extraction


@register(
    "latest_event_per_user",
    survey_ids=("A8", "F3", "W11"),
    oracle="""
SELECT user_id, event_id, ts,
       CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PostgreSQL DISTINCT ON translation (sql/analysis_queries.sql:72-80)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "event_id", "ts", F.get_json_object("props", "$.k").cast("double").alias("k"))
    )


# ---------------------------------------------------------------------------
# S7/ST2 — keyed last-write-wins dedupe (the upsert translation)


@register(
    "dedupe_last_write_wins",
    extra=True,  # r6 rotation: S7 stays driver-green via cdc_apply_changes,
    # ST2 via sessionize_stateful + stream_dedup_idempotent; slot traded
    # for bpe_encode_corpus (the round-6 tokenizer-lifecycle flagship)
    survey_ids=("S7", "ST2"),
    oracle="""
SELECT user_id, event_type, event_id, ts, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def dedupe_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's INSERT-or-UPDATE on (coin_id, fetch_date)
    (load_data.py:66-102) re-expressed append-only: keep the newest row
    per key by (ts, event_id) tiebreak — idempotent re-ingestion (ST2)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


# ---------------------------------------------------------------------------
# P1-P4/P6 — projection + predicate stack


@register(
    "filtered_projection",
    # S4: the reference's pd.read_sql_query-with-SQL-text filter
    # pushdown maps to exactly this — a table scan whose predicates
    # reach the storage layer (PushedFilters in explain), parquet
    # standing in for JDBC in this container
    survey_ids=("P1", "P2", "P3", "P4", "P6", "S4"),
    oracle="""
SELECT event_id, user_id, event_type, value
FROM events
WHERE event_type IN ('purchase', 'signup')
  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND value IS NOT NULL
""",
)
def filtered_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EDA load filters (notebooks/EDA.ipynb:396-408) — expressed
    declaratively; Catalyst pushes all three predicates into the
    parquet scan (PushedFilters) and prunes to 5 columns (ReadSchema)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.where(
            F.col("event_type").isin("purchase", "signup")
            & (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & F.col("value").isNotNull()
        )
        .select("event_id", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# P8 — positional offset (drop first 7 rows per series)


@register(
    "positional_offset",
    survey_ids=("P8",),
    oracle=f"""
WITH {HISTORY_CTE}
SELECT entity_id, fetch_date, price
FROM (
  SELECT *, row_number() OVER {W_ENTITY} AS rn FROM history
)
WHERE rn > 7
""",
)
def positional_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """models.ipynb:296 ``iloc[7:]`` per coin → row_number filter."""
    w = Window.partitionBy(ENTITY).orderBy(DATE)
    return (
        _history(spark, sf_dir)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > 7)
        .select(ENTITY, DATE, PRICE)
    )


# ---------------------------------------------------------------------------
# A10 — risk classification (+J3 join-back covered by risk.with_risk_level)


_RISK_CTE = f"""
WITH {HISTORY_CTE},
pc AS (
  SELECT entity_id, fetch_date, price,
         (price / lag(price) OVER {W_ENTITY} - 1) * 100 AS pct_change,
         strftime(fetch_date, '%Y-%m') AS year_month
  FROM history
),
sev AS (
  SELECT entity_id, year_month,
         CASE WHEN (1 + pct_change / 100)
                   * (1 + lead(pct_change, 1) OVER (PARTITION BY entity_id, year_month
                                                    ORDER BY fetch_date) / 100) - 1 <= -0.5 THEN 2
              WHEN (1 + pct_change / 100)
                   * (1 + lead(pct_change, 1) OVER (PARTITION BY entity_id, year_month
                                                    ORDER BY fetch_date) / 100) - 1 <= -0.2 THEN 1
              ELSE 0 END AS s
  FROM pc
)
SELECT entity_id, year_month,
       CASE max(s) WHEN 2 THEN 'High Risk' WHEN 1 THEN 'Medium Risk'
            ELSE 'Low Risk' END AS risk_level
FROM sev
GROUP BY 1, 2
"""


@register("risk_classification", survey_ids=("A10", "U1", "F4", "F6", "F11"), oracle=_RISK_CTE)
def risk_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDA.ipynb:1192-1226 groupby().apply(calculate_risk_level) as a
    pure window + grouped-max plan (U1 rewritten JVM-side)."""
    df = ts.with_pct_change(_history(spark, sf_dir)).withColumn(
        "year_month", F.date_format(DATE, "yyyy-MM")
    )
    return risk.risk_levels(df)


# ---------------------------------------------------------------------------
# F8-F11 + J4 — calendar + holiday features


@register(
    "calendar_features",
    survey_ids=("F8", "F9", "F10", "F11", "J4", "U3"),
    oracle=f"""
WITH {HISTORY_CTE}
SELECT entity_id, fetch_date,
       CAST(isodow(fetch_date) - 1 AS INT) AS day_of_week,
       CASE isodow(fetch_date)
            WHEN 1 THEN 'Lunes' WHEN 2 THEN 'Martes' WHEN 3 THEN 'Miércoles'
            WHEN 4 THEN 'Jueves' WHEN 5 THEN 'Viernes' WHEN 6 THEN 'Sábado'
            ELSE 'Domingo' END AS day_name,
       CASE WHEN isodow(fetch_date) IN (6, 7) THEN 1 ELSE 0 END AS is_weekend,
       CAST(weekofyear(fetch_date) AS INT) AS week_of_year,
       CAST(day(fetch_date) AS INT) AS day_of_month,
       CAST(quarter(fetch_date) AS INT) AS quarter,
       CAST(dayofyear(fetch_date) AS INT) AS day_of_year,
       strftime(fetch_date, '%Y-%m') AS year_month,
       CASE WHEN fetch_date IN ({cal.us_holiday_sql_list()}) THEN 1 ELSE 0 END AS is_us_holiday,
       CASE WHEN fetch_date IN ({cal.cn_holiday_sql_list()}) THEN 1 ELSE 0 END AS is_china_holiday,
       CASE WHEN fetch_date + 1 IN ({cal.us_holiday_sql_list()}) THEN 1 ELSE 0 END AS is_pre_us_holiday
FROM history
""",
)
def calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform_data.ipynb:528-564 calendar block; holiday flags via
    generated broadcast dim join (J4), not per-row Python."""
    df = cal.with_calendar_features(_history(spark, sf_dir))
    df = cal.with_holiday_flags(df, spark)
    return df.select(
        ENTITY, DATE, "day_of_week", "day_name", "is_weekend", "week_of_year",
        "day_of_month", "quarter", "day_of_year", "year_month",
        "is_us_holiday", "is_china_holiday", "is_pre_us_holiday",
    )


# ---------------------------------------------------------------------------
# A7 — grouped describe


@register(
    "describe_stats",
    survey_ids=("A7",),
    oracle=f"""
WITH {HISTORY_CTE}
SELECT entity_id,
       count(price) AS count,
       round(avg(price), 6) AS mean,
       round(stddev_samp(price), 6) AS std,
       min(price) AS min,
       round(quantile_cont(price, 0.25), 6) AS p25,
       round(quantile_cont(price, 0.5), 6) AS p50,
       round(quantile_cont(price, 0.75), 6) AS p75,
       max(price) AS max
FROM history
GROUP BY 1
""",
)
def describe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby().describe() (EDA.ipynb:416): EXACT interpolated
    percentiles (pandas parity), sample std."""
    df = stats.describe_by_group(_history(spark, sf_dir))
    return df.select(
        ENTITY, "count",
        F.round("mean", 6).alias("mean"), F.round("std", 6).alias("std"),
        "min",
        F.round("p25", 6).alias("p25"), F.round("p50", 6).alias("p50"),
        F.round("p75", 6).alias("p75"), "max",
    )


# ---------------------------------------------------------------------------
# A9 — pivot / crosstab

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "event_type_pivot",
    extra=True,
    survey_ids=("A9",),
    oracle=f"""
SELECT user_id,
       {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in EVENT_TYPES)}
FROM events
GROUP BY 1
""",
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby().size().unstack() (EDA.ipynb:1378). Explicit pivot
    values → static schema, no discovery job."""
    return stats.count_pivot(load_table(spark, sf_dir, "events"), "user_id", "event_type", EVENT_TYPES)


PIVOT_ENTITIES = [1, 2, 3, 4, 5]


@register(
    "price_pivot_by_entity",
    survey_ids=("A9",),
    oracle=f"""
WITH {HISTORY_CTE}
SELECT fetch_date,
       {", ".join(f"coalesce(max(price) FILTER (WHERE entity_id = {k}), 0.0) AS e{k}" for k in PIVOT_ENTITIES)}
FROM history
WHERE entity_id IN ({", ".join(map(str, PIVOT_ENTITIES))})
GROUP BY 1
""",
)
def price_pivot_by_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VALUE form of A9: the date × coin price matrix of
    EDA.ipynb:509 (`pivot(index='fetch_date', columns='coin_id',
    values='price_usd')`), over the five stable entity ids so the
    output schema is SF-independent. Missing (date, entity) cells are
    filled 0.0 in both engines (NULL cells would break the gate's
    sorted-tuple compare)."""
    hist = _history(spark, sf_dir).where(F.col(ENTITY).isin(PIVOT_ENTITIES))
    out = stats.value_pivot(hist, DATE, ENTITY, PIVOT_ENTITIES, PRICE)
    return out.select(
        DATE,
        *[F.coalesce(F.col(str(k)), F.lit(0.0)).alias(f"e{k}") for k in PIVOT_ENTITIES],
    )


# ---------------------------------------------------------------------------
# A13 — correlation


@register(
    "correlation_by_type",
    survey_ids=("A13",),
    oracle="""
SELECT event_type,
       round(corr(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS corr
FROM events
GROUP BY 1
""",
)
def correlation_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise sample Pearson (transform_data.ipynb:647)."""
    events = load_table(spark, sf_dir, "events")
    df = events.withColumn("k", F.get_json_object("props", "$.k").cast("double"))
    return stats.pairwise_corr(df, "event_type", "value", "k").withColumn("corr", F.round("corr", 6))


# ---------------------------------------------------------------------------
# O2/O3 — top-k


@register(
    "top_users_by_value",
    survey_ids=("O2", "O3", "A6"),
    oracle="""
SELECT user_id, n_events, total_value
FROM (
  SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
  FROM events
  GROUP BY 1
)
ORDER BY total_value DESC, user_id
LIMIT 10
""",
)
def top_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k = orderBy(desc).limit(k) — Spark plans TakeOrderedAndProject
    (no full sort, no full shuffle of the sorted data)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy(F.col("total_value").desc(), "user_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §2.7 — distinct; A2-style HAVING


@register(
    "distinct_priorities",
    survey_ids=("§2.7",),
    oracle="SELECT DISTINCT o_orderpriority FROM orders",
)
def distinct_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df['col'].unique() → select().distinct() (EDA.ipynb:501)."""
    return load_table(spark, sf_dir, "orders").select("o_orderpriority").distinct()


@register(
    "repeat_customers",
    extra=True,
    survey_ids=("A2", "A6"),
    oracle="""
SELECT o_custkey, count(*) AS n_orders
FROM orders
GROUP BY 1
HAVING count(*) >= 10
""",
)
def repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (sql/analysis_queries.sql:46-56 shape)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 10)
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped scan/agg and join coverage (S4, P-stack, A-stack, J2/J3)


@register(
    "pricing_summary",
    survey_ids=("P1", "P4", "A1", "A6", "F2"),
    bench=True,
    # demoted to extra in round 8 to seat lm_perplexity_buckets in the
    # driver gate: every id here keeps a driver-facing row elsewhere
    # (P1/P4 filtered_projection, A1 monthly_avg_price, A6
    # top_users_by_value/data_quality_report, F2 monthly_avg_price);
    # stays bench-flagged and locally oracle-tested
    extra=True,
    oracle="""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan→filter→agg; the headline bench scan. The
    date predicate pushes to parquet row groups; aggregation is
    partial (map-side combine) before one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "revenue_by_nation",
    extra=True,
    survey_ids=("J2", "J3", "A1", "F2"),
    bench=True,
    oracle="""
SELECT r_name, n_name,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
""",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact ⋈ dims. nation/region (and customer at small SF)
    broadcast — zero shuffle on the fact side for the joins; one
    shuffle for the final aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


@register(
    "local_supplier_volume",
    extra=True,
    survey_ids=("J2", "J3", "A1", "EXT-olap"),
    oracle="""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1
""",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped six-table star: revenue shipped by suppliers in
    the SAME nation as the ordering customer, for one region. The join
    graph is the interesting part — two independent fact→dim paths
    (customer-side and supplier-side) constrained to the same nation —
    so Catalyst must pick an order through a cyclic-ish graph; the
    region filter reaches the nation dim BEFORE the fact joins
    (broadcast + pushdown), and at 100 TB the lineitem side never
    shuffles for any of the dims. Same-expression-order revenue math,
    rounded identically on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "data_quality_report",
    survey_ids=("A6", "S9", "EXT-olap"),
    oracle="""
SELECT 'not_null(o_orderkey)' AS expectation, 'not_null' AS kind,
       CAST(count(*) AS BIGINT) AS n_checked,
       CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations,
       coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) = 0 AS passed
FROM orders
UNION ALL
SELECT 'in_set(o_orderpriority)', 'in_set', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(CASE WHEN o_orderpriority IS NOT NULL AND o_orderpriority NOT IN
         ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW') THEN 1 ELSE 0 END), 0) AS BIGINT),
       coalesce(sum(CASE WHEN o_orderpriority IS NOT NULL AND o_orderpriority NOT IN
         ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW') THEN 1 ELSE 0 END), 0) = 0
FROM orders
UNION ALL
SELECT 'in_range(o_totalprice,0.0,400000.0)', 'in_range', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(CASE WHEN o_totalprice IS NOT NULL
                      AND (o_totalprice < 0.0 OR o_totalprice > 400000.0)
                     THEN 1 ELSE 0 END), 0) AS BIGINT),
       coalesce(sum(CASE WHEN o_totalprice IS NOT NULL
                 AND (o_totalprice < 0.0 OR o_totalprice > 400000.0)
                THEN 1 ELSE 0 END), 0) = 0
FROM orders
UNION ALL
SELECT 'unique(o_orderkey)', 'unique', CAST(count(*) AS BIGINT),
       CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT),
       count(o_orderkey) - count(DISTINCT o_orderkey) = 0
FROM orders
UNION ALL
SELECT 'foreign_key(o_custkey)', 'foreign_key',
       CAST(count(*) FILTER (WHERE o_custkey IS NOT NULL) AS BIGINT),
       CAST(count(*) FILTER (WHERE o_custkey IS NOT NULL AND o_custkey NOT IN
         (SELECT c_custkey FROM customer)) AS BIGINT),
       count(*) FILTER (WHERE o_custkey IS NOT NULL AND o_custkey NOT IN
         (SELECT c_custkey FROM customer)) = 0
FROM orders
""",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract gate (`operators/expectations.py`): the orders
    table's declared expectations evaluated as ONE conditional
    aggregate over one scan (plus a broadcast anti-join count for the
    foreign key). The 400k price ceiling is deliberately violated by
    the data, proving the violation counting — a gate that only ever
    reports zeros proves nothing. The reference loads with no
    validation at all (load_data.py inserts whatever the API
    returned); at 100 TB this report IS the publish gate."""
    from crypto_data_pipeline_spark.operators import expectations as ex

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return ex.check(
        orders,
        [
            ex.not_null("o_orderkey"),
            ex.in_set(
                "o_orderpriority",
                ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
            ),
            ex.in_range("o_totalprice", 0.0, 400000.0),
            ex.unique("o_orderkey"),
            ex.foreign_key("o_custkey", customer, "c_custkey"),
        ],
    )


@register(
    "cdc_apply_changes",
    survey_ids=("S7", "A8", "EXT-stream"),
    oracle="""
WITH cut AS (SELECT max(ts) - INTERVAL 7 DAY AS c FROM events),
base AS (
  SELECT user_id, value, ts, event_id FROM (
    SELECT user_id, value, ts, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events, cut WHERE ts < c) WHERE rn = 1
),
changes AS (
  SELECT user_id, value, ts, event_id,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events, cut WHERE ts >= c
),
all_rows AS (
  SELECT user_id, value, ts, event_id, 'U' AS op, 0 AS is_change FROM base
  UNION ALL
  SELECT user_id, value, ts, event_id, op, 1 AS is_change FROM changes
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id
    ORDER BY ts DESC, event_id DESC, is_change DESC) AS rn
  FROM all_rows
)
SELECT user_id, value, ts, event_id FROM ranked WHERE rn = 1 AND op <> 'D'
""",
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge with delete tombstones (`sources/cdc.py`): the state
    of a keyed table after replaying a change feed where 'error'
    events are deletes. Base = newest row per user in the first ~3
    weeks; the final week is the feed. One key Exchange for the whole
    merge — no per-row lookups, and deletes cost nothing extra (the
    reference's loader has no delete path at all; a delisted coin
    lives forever — load_data.py:66-102)."""
    from datetime import timedelta

    from crypto_data_pipeline_spark.sources.cdc import apply_changes

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "value", "ts", "event_id", "event_type"
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    cutoff = F.lit(max_ts - timedelta(days=7) if max_ts is not None else None)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    base = (
        ev.where(F.col("ts") < cutoff)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "value", "ts", "event_id")
    )
    changes = ev.where(F.col("ts") >= cutoff).select(
        "user_id",
        "value",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    return apply_changes(base, changes, keys=["user_id"], order_by=["ts", "event_id"])


# ---------------------------------------------------------------------------
# OLAP extensions beyond the reference: grouping sets + distinct counts
# (SURVEY §2.4 notes the reference has none — these round out the
# aggregate surface a warehouse engine is expected to have)


@register(
    "cube_order_stats",
    survey_ids=("A6", "EXT-olap"),
    extra=True,  # r6 rotation: A6 via pricing_summary/top_users, EXT-olap via data_quality_report
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets in one
    pass — Spark expands the cube map-side, so it costs one shuffle
    like a plain groupBy. Subtotal rows surface as 'ALL' (not NULL) so
    the result sorts/hashes cleanly in any comparator."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@register(
    "rollup_order_stats",
    extra=True,
    survey_ids=("A6", "EXT-olap"),
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP twin of cube_order_stats: the hierarchical grouping-set
    ladder (flag,status) → (flag) → () in one pass/one shuffle —
    the drill-down report shape, vs CUBE's full lattice."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@register(
    "entity_trend_ols",
    extra=True,
    survey_ids=("A1", "M2", "EXT-olap"),
    oracle=f"""
WITH {HISTORY_CTE}
SELECT entity_id,
       CAST(count(*) AS BIGINT) AS n_days,
       round(covar_pop(CAST(fetch_date - DATE '2024-01-01' AS DOUBLE), price)
             / var_pop(CAST(fetch_date - DATE '2024-01-01' AS DOUBLE)), 6) AS slope,
       round(avg(price)
             - covar_pop(CAST(fetch_date - DATE '2024-01-01' AS DOUBLE), price)
               / var_pop(CAST(fetch_date - DATE '2024-01-01' AS DOUBLE))
               * avg(CAST(fetch_date - DATE '2024-01-01' AS DOUBLE)), 6) AS intercept,
       round(corr(CAST(fetch_date - DATE '2024-01-01' AS DOUBLE), price)
             * corr(CAST(fetch_date - DATE '2024-01-01' AS DOUBLE), price), 6) AS r2
FROM history
GROUP BY 1 HAVING count(*) >= 2
""",
)
def entity_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity OLS price trend in closed form: slope = cov(x,y)/
    var(x), intercept from the means, R² = corr² — per-group model
    fitting as ONE aggregation over the silver history (no ML library,
    no iteration), so it distributes like any agg. Deliberately built
    on the STABLE moment aggregates (covar_pop/var_pop/corr, the same
    portability contract correlation_by_type proves) rather than raw
    Σxy sums, whose catastrophic cancellation would wreck cross-engine
    6-dp agreement at scale."""
    h = _history(spark, sf_dir)
    x = F.datediff(F.col(DATE), F.lit("2024-01-01").cast("date")).cast("double")
    y = F.col(PRICE)
    slope = F.covar_pop(x, y) / F.var_pop(x)
    return (
        h.groupBy(ENTITY)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(slope, 6).alias("slope"),
            F.round(F.avg(y) - slope * F.avg(x), 6).alias("intercept"),
            F.round(F.corr(x, y) * F.corr(x, y), 6).alias("r2"),
        )
        .where(F.col("n_days") >= 2)
    )


@register(
    "value_ntile_deciles",
    extra=True,
    survey_ids=("A6", "EXT-olap"),
    oracle="""
SELECT decile,
       CAST(count(*) AS BIGINT) AS n,
       round(min(value), 6) AS lo,
       round(max(value), 6) AS hi
FROM (
  SELECT value,
         CAST(ntile(10) OVER (ORDER BY value, event_id) AS INT) AS decile
  FROM events WHERE value IS NOT NULL
)
GROUP BY 1
""",
)
def value_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bucketing via NTILE over a TOTAL order (value, event_id
    tiebreak — without it equal values straddle bucket edges
    nondeterministically), reduced to per-decile count/min/max. Both
    engines use the ANSI equal-buckets-remainder-first rule, so the
    assignment hash-matches exactly.

    Scale note: an unpartitioned ORDER BY window is a one-partition
    sort — correct here as the exactness reference, but at 100 TB the
    same report comes from approx_percentile boundaries + width_bucket
    (value_percentiles covers that sketch path)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = Window.orderBy("value", "event_id")
    return (
        ev.select("value", F.ntile(10).over(w).cast("int").alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )


@register(
    "distinct_users_exact_and_approx",
    extra=True,
    survey_ids=("A6", "EXT-olap"),
    oracle="""
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
""",
)
def distinct_users_exact_and_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type distinct users (oracle-checked). The scale path —
    approx_count_distinct's HLL++ sketch, mergeable and fixed-memory —
    is asserted within 5% of this result by the catalog test suite
    rather than hash-compared (sketches are engine-specific)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_users"))


@register(
    "rolling_time_window_30d",
    extra=True,
    survey_ids=("W7", "EXT-olap"),
    oracle=f"""
WITH {HISTORY_CTE}
SELECT entity_id, fetch_date,
       round(avg(price) OVER (PARTITION BY entity_id ORDER BY fetch_date
             RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW) + 1e-9, 6) AS avg_30d,
       CAST(count(*) OVER (PARTITION BY entity_id ORDER BY fetch_date
             RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_in_window
FROM history
""",
)
def rolling_time_window_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-range rolling window — the calendar twin of the row-count
    rolling features: average over the trailing 30 calendar DAYS
    (rangeBetween on epoch days), which unlike a 30-ROW frame stays
    correct across gaps in the series. n_in_window exposes how many
    days actually populated each frame. Same single entity-partitioned
    Exchange as every other window in the chain."""
    h = _history(spark, sf_dir)
    w = (
        Window.partitionBy(ENTITY)
        .orderBy(F.unix_date(F.col(DATE)))
        .rangeBetween(-29, 0)
    )
    return h.select(
        ENTITY,
        DATE,
        F.round(F.avg(PRICE).over(w) + F.lit(1e-9), 6).alias("avg_30d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_in_window"),
    )


@register(
    "ewma_price",
    extra=True,
    survey_ids=("W10", "EXT-olap"),
    oracle=f"""
WITH {HISTORY_CTE},
win AS (
  SELECT entity_id, fetch_date,
         list(price) OVER (PARTITION BY entity_id ORDER BY fetch_date
              ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vals
  FROM history
)
SELECT entity_id, fetch_date,
       round(
         CASE WHEN list_sum(list_transform(range(len(vals)),
                  i -> CASE WHEN vals[i + 1] IS NULL THEN 0.0
                       ELSE pow(0.7, len(vals) - 1 - i) END)) > 0
         THEN
         list_sum(list_transform(range(len(vals)),
                  i -> CASE WHEN vals[i + 1] IS NULL THEN 0.0
                       ELSE CAST(vals[i + 1] AS DOUBLE) * pow(0.7, len(vals) - 1 - i) END))
         / list_sum(list_transform(range(len(vals)),
                  i -> CASE WHEN vals[i + 1] IS NULL THEN 0.0
                       ELSE pow(0.7, len(vals) - 1 - i) END))
         END,
       6) AS ewma_price
FROM win
""",
)
def ewma_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=0.3, trailing 10
    rows, pandas adjust=True semantics truncated to the frame) — the
    finance-native smoother the reference's flat rolling means stand
    in for (`operators/timeseries.py:with_ewma`). Deterministic fold
    order via sorted (date, price) structs; DuckDB reproduces it from
    the frame-ordered window list. Rides the bucketed silver history:
    zero Exchange below the window."""
    h = _history(spark, sf_dir)
    return ts.with_ewma(h, value=PRICE, alpha=0.3, window=10).select(
        ENTITY, DATE, "ewma_price"
    )


@register(
    "chi_square_independence",
    extra=True,
    survey_ids=("A6", "A13", "EXT-olap"),
    oracle="""
WITH cells AS (
  SELECT event_type,
         CAST(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS INT) AS is_weekend,
         CAST(count(*) AS DOUBLE) AS o
  FROM events GROUP BY 1, 2
),
tot AS (SELECT sum(o) AS n FROM cells),
rowm AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY 1),
colm AS (SELECT is_weekend, sum(o) AS ct FROM cells GROUP BY 1)
SELECT CAST(coalesce((SELECT n FROM tot), 0) AS BIGINT) AS n,
       CAST((SELECT count(*) FROM rowm) - 1 AS BIGINT)
         * CAST((SELECT count(*) FROM colm) - 1 AS BIGINT) AS dof,
       round(coalesce(sum(pow(c.o - r.rt * cm.ct / t.n, 2) / (r.rt * cm.ct / t.n)), 0.0), 6)
         AS chi2
FROM cells c
JOIN rowm r USING (event_type)
JOIN colm cm USING (is_weekend)
CROSS JOIN tot t
""",
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence: is event type
    associated with weekends? Observed counts from one groupBy;
    expected = row-margin x col-margin / total; the statistic and
    degrees of freedom computed fully in SQL on both engines (the
    p-value lookup is a client-side chi2 CDF — the distributed part is
    the contingency table, which at 100 TB is the only part that
    touches data). DuckDB dayofweek is 0=Sunday; Spark dayofweek is
    1=Sunday — both sides map to the same weekend flag."""
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            "event_type",
            F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("is_weekend"),
        )
        .groupBy("event_type", "is_weekend")
        .agg(F.count(F.lit(1)).cast("double").alias("o"))
    )
    tot = cells.agg(F.sum("o").alias("n"))
    rowm = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    colm = cells.groupBy("is_weekend").agg(F.sum("o").alias("ct"))
    joined = (
        cells.join(F.broadcast(rowm), "event_type")
        .join(F.broadcast(colm), "is_weekend")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("rt") * F.col("ct") / F.col("n")
    stat = joined.agg(
        F.round(F.coalesce(F.sum(F.pow(F.col("o") - e, 2) / e), F.lit(0.0)), 6).alias("chi2")
    )
    dof = (
        (rowm.count() - 1) * (colm.count() - 1)
    )
    n_total = tot.collect()[0][0]
    return stat.select(
        F.lit(int(n_total or 0)).cast("bigint").alias("n"),
        F.lit(int(dof)).cast("bigint").alias("dof"),
        "chi2",
    )


@register(
    "psi_value_drift",
    extra=True,
    survey_ids=("A6", "EXT-olap"),
    oracle="""
WITH bounds AS (
  SELECT min(epoch_us(ts)) AS a, max(epoch_us(ts)) AS b FROM events
  WHERE value IS NOT NULL
),
halves AS (
  SELECT CAST(least(floor(value / 50.0), 9) AS INT) AS bin,
         CASE WHEN epoch_us(ts) * 2 <= a + b THEN 0 ELSE 1 END AS half
  FROM events, bounds WHERE value IS NOT NULL
),
bins AS (SELECT CAST(i AS INT) AS bin FROM range(10) t(i)),
cnt AS (
  SELECT b.bin,
         CAST(coalesce(sum(CASE WHEN h.half = 0 THEN 1 END), 0) AS DOUBLE) AS nb,
         CAST(coalesce(sum(CASE WHEN h.half = 1 THEN 1 END), 0) AS DOUBLE) AS na
  FROM bins b LEFT JOIN halves h ON b.bin = h.bin GROUP BY 1
),
tot AS (SELECT sum(nb) AS tb, sum(na) AS ta FROM cnt)
SELECT bin,
       CAST(nb AS BIGINT) AS n_before,
       CAST(na AS BIGINT) AS n_after,
       round(((nb + 0.5) / (tb + 5.0) - (na + 0.5) / (ta + 5.0))
             * ln(((nb + 0.5) / (tb + 5.0)) / ((na + 0.5) / (ta + 5.0))), 6)
         AS psi_contrib
FROM cnt, tot
""",
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between the first and second half of
    the event stream's time range — the drift monitor a training-data
    pipeline alarms on when a source quietly changes distribution.
    Fixed-width value bins (50-wide, capped at bin 9), halves split at
    the integer-microsecond midpoint (epoch arithmetic identical on
    both engines), Laplace-smoothed shares so empty bins contribute
    finitely. One scan + one tiny broadcast of the 10-bin counts; the
    total PSI is the sum of the per-bin contributions reported."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    us = F.unix_micros("ts")
    bounds = ev.agg(F.min(us).alias("a"), F.max(us).alias("b")).collect()[0]
    a, b = bounds["a"], bounds["b"]
    half = F.when((us * 2) <= F.lit((a or 0) + (b or 0)), 0).otherwise(1)
    halves = ev.select(
        F.least(F.floor(F.col("value") / 50.0), F.lit(9)).cast("int").alias("bin"),
        half.alias("half"),
    )
    bins = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    cnt = (
        bins.join(halves, "bin", "left")
        .groupBy("bin")
        .agg(
            F.coalesce(F.sum(F.when(F.col("half") == 0, 1)), F.lit(0))
            .cast("double").alias("nb"),
            F.coalesce(F.sum(F.when(F.col("half") == 1, 1)), F.lit(0))
            .cast("double").alias("na"),
        )
    )
    tot = cnt.agg(F.sum("nb").alias("tb"), F.sum("na").alias("ta"))
    p = (F.col("nb") + 0.5) / (F.col("tb") + 5.0)
    q = (F.col("na") + 0.5) / (F.col("ta") + 5.0)
    return cnt.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.col("nb").cast("bigint").alias("n_before"),
        F.col("na").cast("bigint").alias("n_after"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
    )


@register(
    "max_drawdown",
    extra=True,
    survey_ids=("W3", "A5", "EXT-olap"),
    oracle=f"""
WITH {HISTORY_CTE},
dd AS (
  SELECT entity_id, fetch_date,
         price / max(price) OVER (PARTITION BY entity_id ORDER BY fetch_date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS drawdown
  FROM history
)
SELECT entity_id,
       CAST(count(*) AS BIGINT) AS n_days,
       round(min(drawdown), 6) AS max_drawdown,
       CAST(coalesce(sum(CASE WHEN drawdown < 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS days_underwater
FROM dd GROUP BY 1
""",
)
def max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per entity — the canonical formalization of
    the reference's drop-hunting Query 2: price over its running peak,
    minus one; the per-entity minimum is the worst peak-to-trough
    loss, days_underwater counts time below the prior peak. One
    running-max window on the entity Exchange the silver table already
    provides (zero Exchange below it), one groupBy."""
    h = _history(spark, sf_dir)
    w = (
        Window.partitionBy(ENTITY)
        .orderBy(DATE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = F.col(PRICE) / F.max(PRICE).over(w) - 1
    return (
        h.withColumn("drawdown", dd)
        .groupBy(ENTITY)
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.min("drawdown"), 6).alias("max_drawdown"),
            F.sum(F.when(F.col("drawdown") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("days_underwater"),
        )
    )


@register(
    "rsi_cutler_14",
    extra=True,
    survey_ids=("W1", "W10", "EXT-olap"),
    oracle=f"""
WITH {HISTORY_CTE},
delta AS (
  SELECT entity_id, fetch_date,
         price - lag(price) OVER (PARTITION BY entity_id ORDER BY fetch_date) AS d
  FROM history
),
avgs AS (
  SELECT entity_id, fetch_date,
         avg(CASE WHEN d > 0 THEN d ELSE 0 END) OVER w AS avg_gain,
         avg(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER w AS avg_loss,
         CAST(count(d) OVER w AS BIGINT) AS n_deltas
  FROM delta
  WINDOW w AS (PARTITION BY entity_id ORDER BY fetch_date
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT entity_id, fetch_date,
       CASE WHEN avg_loss = 0 THEN 100.0
            ELSE round(100.0 - 100.0 / (1.0 + avg_gain / avg_loss), 6)
       END AS rsi
FROM avgs WHERE n_deltas = 14
""",
)
def rsi_cutler_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day RSI, Cutler's simple-moving-average variant — windowed
    and therefore engine-portable, unlike Wilder's recursive smoothing
    (an unbounded EWM; `with_ewma` is the bounded cousin). Gains and
    losses are conditional means over the trailing 14 deltas; rows
    emit only once a full 14-delta window exists (count(d) OVER w
    skips the leading NULL delta identically on both engines). Same
    single entity Exchange as every other window in the chain."""
    h = _history(spark, sf_dir)
    wl = Window.partitionBy(ENTITY).orderBy(DATE)
    w14 = wl.rowsBetween(-13, Window.currentRow)
    d = F.col(PRICE) - F.lag(PRICE).over(wl)
    staged = (
        h.withColumn("d", d)
        .withColumn("avg_gain", F.avg(F.when(F.col("d") > 0, F.col("d")).otherwise(0.0)).over(w14))
        .withColumn("avg_loss", F.avg(F.when(F.col("d") < 0, -F.col("d")).otherwise(0.0)).over(w14))
        .withColumn("n_deltas", F.count("d").over(w14).cast("bigint"))
    )
    rsi = F.when(F.col("avg_loss") == 0, F.lit(100.0)).otherwise(
        F.round(100.0 - 100.0 / (1.0 + F.col("avg_gain") / F.col("avg_loss")), 6)
    )
    return staged.where(F.col("n_deltas") == 14).select(
        ENTITY, DATE, rsi.alias("rsi")
    )


@register(
    "price_anomaly_stats",
    extra=True,
    survey_ids=("A7", "A13", "EXT-olap"),
    oracle=f"""
WITH {HISTORY_CTE},
med AS (
  SELECT entity_id,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY price) AS med
  FROM history GROUP BY 1
),
dev AS (
  SELECT h.entity_id, h.price, h.fetch_date, m.med,
         abs(h.price - m.med) AS ad
  FROM history h JOIN med m USING (entity_id)
),
mad AS (
  SELECT entity_id,
         percentile_cont(0.5) WITHIN GROUP (ORDER BY ad) AS mad
  FROM dev GROUP BY 1
),
lagd AS (
  SELECT entity_id, price,
         lag(price) OVER (PARTITION BY entity_id ORDER BY fetch_date) AS pl
  FROM history
),
acf AS (SELECT entity_id, corr(price, pl) AS acf1 FROM lagd GROUP BY 1)
SELECT d.entity_id,
       CAST(count(*) AS BIGINT) AS n_days,
       round(min(d.med), 6) AS med,
       round(min(m.mad), 6) AS mad,
       CAST(coalesce(sum(CASE WHEN d.ad > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_anomalies,
       round(coalesce(min(a.acf1), -99.0), 6) AS acf1
FROM dev d
JOIN mad m USING (entity_id)
JOIN acf a USING (entity_id)
GROUP BY 1
""",
)
def price_anomaly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly census per entity: exact median and MAD (median
    absolute deviation — outlier-immune, unlike the z-score the
    notebooks use), count of |x - med| > 3·1.4826·MAD days, plus the
    lag-1 autocorrelation of the daily price. Two grouped exact
    percentiles (entity-partitioned, the scale path being
    approx_percentile as pinned elsewhere), broadcast joins back, and
    the ACF from the same entity window Exchange the feature chain
    already pays. acf1 is sentinel -99 for degenerate series (single
    day / zero variance) on BOTH engines — NULLs break the gate's
    sorted-tuple compare."""
    h = _history(spark, sf_dir)
    # med/mad/acf are one row per entity — smaller than the daily frame
    # but entity-proportional, so no broadcast hints: AQE measures them
    # (broadcast at fixture scale, sort-merge at 100M entities)
    med = h.groupBy(ENTITY).agg(F.expr(f"percentile({PRICE}, 0.5)").alias("med"))
    dev = h.join(med, ENTITY).withColumn(
        "ad", F.abs(F.col(PRICE) - F.col("med"))
    )
    mad = dev.groupBy(ENTITY).agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    w = Window.partitionBy(ENTITY).orderBy(DATE)
    acf = (
        h.withColumn("pl", F.lag(PRICE).over(w))
        .groupBy(ENTITY)
        .agg(F.corr(PRICE, "pl").alias("acf1"))
    )
    return (
        dev.join(mad, ENTITY)
        .join(acf, ENTITY)
        .groupBy(ENTITY)
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("ad") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_anomalies"),
            F.round(F.coalesce(F.min("acf1"), F.lit(-99.0)), 6).alias("acf1"),
        )
    )


@register(
    "value_percentiles",
    extra=True,
    survey_ids=("A7", "EXT-olap"),
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events WHERE value IS NOT NULL GROUP BY 1
""",
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tail percentiles per event type (linear-interpolated, the
    pandas/DuckDB definition — same portability contract as
    describe_stats). The scale path — approx_percentile's KLL-style
    sketch, mergeable and fixed-memory where exact needs a per-group
    sort — is asserted within tolerance of this result in the test
    suite rather than hash-compared (sketches are engine-specific)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


# ---------------------------------------------------------------------------
# Sessionization — gaps-and-islands over time gaps (streaming-shaped batch)


_SESSIONS_ORACLE = """
WITH stamped AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
),
flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
  FROM stamped
),
sessions AS (
  SELECT user_id, event_id, us,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         max(us) - min(us) AS duration_us
  FROM sessions
  GROUP BY 1, 2
)
SELECT user_id,
       count(*) AS n_sessions,
       round(CAST(sum(n_events) AS DOUBLE) / count(*) + 1e-9, 6) AS avg_events_per_session,
       round(CAST(sum(duration_us) AS DOUBLE) / count(*) / 1e6 + 1e-9, 6) AS avg_session_sec
FROM per_session
GROUP BY 1
"""


@register(
    "sessionization",
    survey_ids=("W3", "ST1", "A2"),
    bench=True,
    # demoted from the driver gate in round 9 to seat
    # lm_perplexity_buckets_kn (the rotation pattern of rounds 5-8):
    # every id here keeps >= 1 other driver-facing cover (W3/A2 via
    # drop_recovery, ST1 via sessionize_stateful) and the query stays
    # oracle-tested locally plus benched
    extra=True,
    oracle=_SESSIONS_ORACLE,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization: the batch twin of a streaming
    session window. Exact integer microsecond math (unix_micros /
    epoch_us) so gap comparisons are engine-portable."""
    events = load_table(spark, sf_dir, "events")
    # project to (user_id, event_id, us) BEFORE the window and order by
    # the projected us rather than ts (round 13, guide §2.3):
    # unix_micros is strictly monotone in ts, so the row order —
    # including event_id tie-breaks — is identical, but the events
    # shuffle stops carrying ts AND the _w0 duplicate Spark
    # materializes when the lag input is an expression instead of a
    # column (5 shuffled columns -> 3, measured 2,038,975 -> 1,446,393
    # bytes at sf0.1), and the second window's re-sort collapses
    # because both windows now share one (us, event_id) order.
    us = F.unix_micros("ts")
    staged = events.select("user_id", "event_id", us.alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    stamped = staged.select("user_id", "event_id", "us", F.lag("us").over(w).alias("prev_us"))
    flagged = stamped.withColumn(
        "new_session",
        F.when(F.col("prev_us").isNull() | (F.col("us") - F.col("prev_us") > 1800000000), 1).otherwise(0),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(wrun))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )
    # exact integer sums divided ONCE: avg() accumulates in doubles in
    # engine-specific order, which at sf0.1 lands on a 6-dp rounding
    # boundary (64.2340175) and splits the engines by one ulp
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(
            F.sum("n_events").cast("double") / F.count(F.lit(1)) + 1e-9, 6
        ).alias("avg_events_per_session"),
        # + 1e-9 = the repo's decimal-tie nudge: integer-sum averages
        # land EXACTLY on x.xxxxxx5 (e.g. 64234017.5 us), where the
        # engines' round() semantics split by one ulp
        F.round(
            F.sum("duration_us").cast("double") / F.count(F.lit(1)) / 1e6 + 1e-9, 6
        ).alias("avg_session_sec"),
    )


@register(
    "session_window_native",
    extra=True,
    survey_ids=("ST1", "A2", "EXT-stream"),
    oracle=_SESSIONS_ORACLE,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME 30-minute-gap sessions computed with Spark's native
    ``session_window`` aggregate instead of the hand-rolled
    gaps-and-islands windows — one groupBy, no lag/running-sum chain,
    and the identical construct runs unchanged under readStream with a
    watermark (the streaming upgrade path). Verified against the same
    oracle as `sessionization`: a probe test pinned that an
    exactly-30:00 gap MERGES in both formulations (session_window
    splits strictly-greater gaps, like the islands `>`)."""
    ev = load_table(spark, sf_dir, "events")
    per_session = ev.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )
    # exact integer sums divided ONCE: avg() accumulates in doubles in
    # engine-specific order, which at sf0.1 lands on a 6-dp rounding
    # boundary (64.2340175) and splits the engines by one ulp
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(
            F.sum("n_events").cast("double") / F.count(F.lit(1)) + 1e-9, 6
        ).alias("avg_events_per_session"),
        # + 1e-9 = the repo's decimal-tie nudge: integer-sum averages
        # land EXACTLY on x.xxxxxx5 (e.g. 64234017.5 us), where the
        # engines' round() semantics split by one ulp
        F.round(
            F.sum("duration_us").cast("double") / F.count(F.lit(1)) / 1e6 + 1e-9, 6
        ).alias("avg_session_sec"),
    )


_FUNNEL_ORACLE = """
WITH stamped AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
),
sessions AS (
  SELECT user_id, event_id, event_type, us,
         SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM stamped
),
per_session AS (
  SELECT user_id, session_id,
         min(CASE WHEN event_type = 'click' THEN us END) AS first_click_us,
         max(CASE WHEN event_type = 'purchase' THEN us END) AS last_purchase_us
  FROM sessions
  GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN first_click_us IS NOT NULL
                      AND last_purchase_us >= first_click_us THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted,
       round(CAST(sum(CASE WHEN first_click_us IS NOT NULL
                            AND last_purchase_us >= first_click_us THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS conv_rate
FROM per_session
GROUP BY 1
"""


@register(
    "session_funnel",
    extra=True,
    survey_ids=("A2", "W3", "EXT-olap"),
    oracle=_FUNNEL_ORACLE,
)
def session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion funnel over the 30-minute-gap
    sessions: a session converts when it contains a click and a
    purchase at-or-after the first click. Same one-Exchange
    gaps-and-islands chain as `sessionization` (the windows and both
    groupBys share the user_id partitioning), with the funnel flags as
    conditional aggregates — no extra shuffle, no self-join."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    stamped = events.select(
        "user_id", "event_id", "event_type", us.alias("us"),
        F.lag(us).over(w).alias("prev_us"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = stamped.withColumn(
        "session_id",
        F.sum(
            F.when(
                F.col("prev_us").isNull() | (F.col("us") - F.col("prev_us") > 1800000000), 1
            ).otherwise(0)
        ).over(wrun),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("us"))).alias("first_click_us"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("us"))).alias("last_purchase_us"),
    )
    # F.when(...).otherwise(0) mirrors the oracle's CASE ... ELSE 0: a
    # click-only session makes the raw AND three-valued (TRUE AND NULL =
    # NULL), and a user whose EVERY session is click-only would sum to
    # NULL instead of 0 under a bare cast.
    converted = F.when(
        F.col("first_click_us").isNotNull()
        & (F.col("last_purchase_us") >= F.col("first_click_us")),
        1,
    ).otherwise(0)
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(converted).cast("bigint").alias("n_converted"),
        F.round(F.sum(converted).cast("double") / F.count(F.lit(1)), 6).alias("conv_rate"),
    )


_PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct FROM events"""
    for c in _PROFILE_COLS
)


@register(
    "table_profile",
    extra=True,
    survey_ids=("S9", "A6", "EXT-olap"),
    oracle=_PROFILE_ORACLE,
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data-quality census — the first job any 100 TB
    ingest runs: per column, row count, null count, and EXACT distinct
    count, in ONE scan. All columns' aggregates compute in a single
    agg (Catalyst plans the multi-distinct via Expand, still one pass
    over the data); the wide 1-row result then unpivots with stack()
    into the (column, stats) report shape. The mergeable sketch path
    for petabyte profiles is approx_count_distinct — its accuracy vs
    this exact census is pinned in
    tests/test_catalog_oracle.py::test_approx_distinct_tracks_exact."""
    ev = load_table(spark, sf_dir, "events")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(c).alias(f"nd_{c}"))
    row = ev.agg(*aggs)
    stack_args = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS)
    return row.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (col_name, n_non_null, n_distinct)",
    ).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_rows") - F.col("n_non_null")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )


@register(
    "cohort_retention",
    extra=True,
    survey_ids=("A6", "EXT-olap"),
    oracle="""
WITH firsts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY 1
),
activity AS (
  SELECT DISTINCT e.user_id,
         date_trunc('week', f.first_day) AS cohort_week,
         CAST(floor(date_diff('day', date_trunc('week', f.first_day),
                              date_trunc('week', CAST(e.ts AS DATE))) / 7) AS INT)
           AS week_offset
  FROM events e JOIN firsts f USING (user_id)
)
SELECT CAST(cohort_week AS DATE) AS cohort_week, week_offset,
       CAST(count(*) AS BIGINT) AS n_active_users
FROM activity GROUP BY 1, 2
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix — the classic warehouse report:
    users bucketed by the Monday-start week of their FIRST event, and
    for each cohort, how many of them are active k weeks later.

    One user_id shuffle total: the first-event day is a window-min over
    the same user partitioning the distinct (user, cohort, offset)
    reduction then reuses — no self-join of events against events, no
    second Exchange of the fact table. Week arithmetic is integer day
    subtraction / 7 (both engines truncate weeks to Monday), so the
    matrix hash-matches exactly."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    w = Window.partitionBy("user_id")
    cohorted = ev.withColumn("first_day", F.min("day").over(w))
    activity = cohorted.select(
        "user_id",
        F.date_trunc("week", "first_day").cast("date").alias("cohort_week"),
        F.floor(
            F.datediff(
                F.date_trunc("week", "day").cast("date"),
                F.date_trunc("week", "first_day").cast("date"),
            )
            / 7
        )
        .cast("int")
        .alias("week_offset"),
    ).distinct()
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


@register(
    "value_histogram",
    extra=True,
    survey_ids=("A6", "EXT-olap"),
    oracle="""
SELECT event_type,
       CAST(least(floor(value / 50), 19) AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM events
WHERE value IS NOT NULL
GROUP BY 1, 2
""",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (20 buckets of 50,
    top bucket open) — the one-pass distribution profile a quality
    dashboard runs at any scale. Bucket arithmetic is explicit floor
    division (exact for this data: bucket boundaries are integers,
    representable exactly as doubles) so both engines agree without a
    width_bucket builtin."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    bucket = F.least(F.floor(F.col("value") / 50), F.lit(19)).cast("int")
    return ev.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# ST3-shaped batch twin — tumbling hourly aggregate


@register(
    "tumbling_hourly",
    survey_ids=("ST3", "A1"),
    oracle="""
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate — the batch semantics of the
    streaming gold table (crypto_app/db.py:150-197 analog). The same
    expression runs under readStream with a watermark
    (streaming/ingest.py)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "total_value")
    )


@register(
    "sliding_hourly_15m",
    extra=True,
    survey_ids=("ST3", "A1", "EXT-stream"),
    oracle="""
WITH slid AS (
  SELECT date_trunc('hour', ts) + INTERVAL 15 MINUTE
           * CAST(floor(date_part('minute', ts) / 15) - 3 + k AS BIGINT) AS window_start,
         event_type, value
  FROM events, UNNEST([0, 1, 2, 3]) AS t(k)
)
SELECT window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS total_value
FROM slid GROUP BY 1, 2
""",
)
def sliding_hourly_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING window aggregate — 1-hour windows every 15 minutes, the
    third streaming window shape next to tumbling (tumbling_hourly) and
    session (sessionization / session_window_native). Each event lands
    in slide/width = 4 overlapping windows; Spark's ``window()`` with a
    slideDuration expands exactly that assignment JVM-side, and the
    identical expression runs under readStream with a watermark. The
    oracle reproduces the 4-window expansion with an UNNEST: window
    starts are the four 15-minute marks in (ts - 1h, ts]."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# The notebook pipelines end-to-end (EDA 10-col table; 34-col prediction
# table; model comparison)


@register(
    "processed_features",
    survey_ids=("W4", "A10", "W7", "W8", "J3", "F11", "U1", "U2"),
    bench=True,
    oracle=f"""
WITH {HISTORY_CTE},
pc AS (
  SELECT entity_id, price, fetch_date,
         (price / lag(price) OVER {W_ENTITY} - 1) * 100 AS pct_change,
         CAST(year(fetch_date) AS INT) AS year,
         CAST(month(fetch_date) AS INT) AS month,
         strftime(fetch_date, '%Y-%m') AS year_month
  FROM history
),
sev AS (
  SELECT entity_id, year_month,
         CASE WHEN (1 + pct_change / 100)
                   * (1 + lead(pct_change, 1) OVER (PARTITION BY entity_id, year_month
                                                    ORDER BY fetch_date) / 100) - 1 <= -0.5 THEN 2
              WHEN (1 + pct_change / 100)
                   * (1 + lead(pct_change, 1) OVER (PARTITION BY entity_id, year_month
                                                    ORDER BY fetch_date) / 100) - 1 <= -0.2 THEN 1
              ELSE 0 END AS s
  FROM pc
),
risk AS (
  SELECT entity_id, year_month,
         CASE max(s) WHEN 2 THEN 'High Risk' WHEN 1 THEN 'Medium Risk'
              ELSE 'Low Risk' END AS risk_level
  FROM sev GROUP BY 1, 2
)
SELECT p.entity_id, p.price, p.fetch_date, p.pct_change, p.year, p.month,
       p.year_month, r.risk_level,
       (p.price / lag(p.price, 7) OVER (PARTITION BY p.entity_id ORDER BY p.fetch_date) - 1) * 100
         AS rolling_7d_trend,
       CASE WHEN count(p.price) OVER w8 = 8
            THEN round(var_pop(p.price) OVER w8, 6) END AS rolling_7d_variance
FROM pc p
LEFT JOIN risk r USING (entity_id, year_month)
WINDOW w8 AS (PARTITION BY p.entity_id ORDER BY p.fetch_date
              ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
""",
)
def processed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EDA notebook's full feature stage (processed_crypto_data.csv
    shape) as ONE lazy DAG — pct_change + calendar keys + risk labels
    + rolling trend/variance, all entities in one pass."""
    from crypto_data_pipeline_spark.plans.feature_pipeline import processed_table

    df = processed_table(_history(spark, sf_dir))
    return df.withColumn("rolling_7d_variance", F.round("rolling_7d_variance", 6))


_SKEW_G1 = """( (avg(price*price*price) OVER w7
            - 3 * avg(price) OVER w7 * avg(price*price) OVER w7
            + 2 * avg(price) OVER w7 * avg(price) OVER w7 * avg(price) OVER w7)
           / power(avg(price*price) OVER w7 - avg(price) OVER w7 * avg(price) OVER w7, 1.5)
         ) * (sqrt(42.0) / 5)"""

_PREDICTION_ORACLE = f"""
WITH {HISTORY_CTE},
pc AS (
  SELECT entity_id, price, fetch_date,
         (price / lag(price) OVER {W_ENTITY} - 1) * 100 AS pct_change,
         CAST(year(fetch_date) AS INT) AS year,
         CAST(month(fetch_date) AS INT) AS month,
         strftime(fetch_date, '%Y-%m') AS year_month
  FROM history
),
sev AS (
  SELECT entity_id, year_month,
         CASE WHEN (1 + pct_change / 100)
                   * (1 + lead(pct_change, 1) OVER (PARTITION BY entity_id, year_month
                                                    ORDER BY fetch_date) / 100) - 1 <= -0.5 THEN 2
              WHEN (1 + pct_change / 100)
                   * (1 + lead(pct_change, 1) OVER (PARTITION BY entity_id, year_month
                                                    ORDER BY fetch_date) / 100) - 1 <= -0.2 THEN 1
              ELSE 0 END AS s
  FROM pc
),
risk AS (
  SELECT entity_id, year_month,
         CASE max(s) WHEN 2 THEN 'High Risk' WHEN 1 THEN 'Medium Risk'
              ELSE 'Low Risk' END AS risk_level
  FROM sev GROUP BY 1, 2
),
base AS (
  SELECT p.*, r.risk_level FROM pc p LEFT JOIN risk r USING (entity_id, year_month)
),
feat AS (
  SELECT entity_id, price, fetch_date, pct_change, year, month, year_month, risk_level,
         (price / lag(price, 7) OVER we - 1) * 100 AS rolling_7d_trend,
         CASE WHEN count(price) OVER w8 = 8
              THEN round(var_pop(price) OVER w8, 6) END AS rolling_7d_variance,
         {", ".join(f"lag(price, {i}) OVER we AS price_lag_{i}" for i in range(1, 8))},
         lead(price, 1) OVER we AS next_day_price,
         CASE WHEN count(price) OVER w7 = 7
              THEN round({_SKEW_G1}, 6) END AS price_skew_7d,
         CAST(isodow(fetch_date) - 1 AS INT) AS day_of_week,
         CASE isodow(fetch_date)
              WHEN 1 THEN 'Lunes' WHEN 2 THEN 'Martes' WHEN 3 THEN 'Miércoles'
              WHEN 4 THEN 'Jueves' WHEN 5 THEN 'Viernes' WHEN 6 THEN 'Sábado'
              ELSE 'Domingo' END AS day_name,
         CASE WHEN isodow(fetch_date) IN (6, 7) THEN 1 ELSE 0 END AS is_weekend,
         CAST(weekofyear(fetch_date) AS INT) AS week_of_year,
         CAST(day(fetch_date) AS INT) AS day_of_month,
         CAST(quarter(fetch_date) AS INT) AS quarter,
         CAST(dayofyear(fetch_date) AS INT) AS day_of_year,
         CASE WHEN fetch_date IN ({cal.us_holiday_sql_list()}) THEN 1 ELSE 0 END AS is_us_holiday,
         CASE WHEN fetch_date IN ({cal.cn_holiday_sql_list()}) THEN 1 ELSE 0 END AS is_china_holiday,
         CASE WHEN fetch_date + 1 IN ({cal.us_holiday_sql_list()}) THEN 1 ELSE 0 END AS is_pre_us_holiday,
         abs(pct_change) AS return_abs,
         CASE WHEN count(abs(pct_change)) OVER w7 = 7
              THEN round(avg(abs(pct_change)) OVER w7, 6) END AS return_rolling_mean_7d,
         (price - min(price) OVER wall) / (max(price) OVER wall - min(price) OVER wall)
           AS price_normalized,
         round((price - avg(price) OVER wall) / stddev_pop(price) OVER wall, 6)
           AS price_standardized
  FROM base
  WINDOW we AS (PARTITION BY entity_id ORDER BY fetch_date),
         w8 AS (PARTITION BY entity_id ORDER BY fetch_date
                ROWS BETWEEN 7 PRECEDING AND CURRENT ROW),
         w7 AS (PARTITION BY entity_id ORDER BY fetch_date
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
         wall AS (PARTITION BY entity_id)
)
SELECT * FROM feat
WHERE pct_change IS NOT NULL
  AND rolling_7d_trend IS NOT NULL AND rolling_7d_variance IS NOT NULL
  AND {" AND ".join(f"price_lag_{i} IS NOT NULL" for i in range(1, 8))}
  AND next_day_price IS NOT NULL AND price_skew_7d IS NOT NULL
  AND return_abs IS NOT NULL AND return_rolling_mean_7d IS NOT NULL
"""


@register("prediction_features",
    survey_ids=("W5", "W6", "W9", "W10", "F8", "F9", "F10", "J4", "A11", "A12"),
    oracle=_PREDICTION_ORACLE)
def prediction_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transform notebook's full prediction table end-to-end
    (transform_data.ipynb cell 6): every constituent operator is
    oracle-checked individually, and this composed DuckDB twin pins the
    COMPOSITION too — join ordering, year_month recomputation, and the
    reference's scaling-fit-before-dropna leakage
    (transform_data.ipynb:576). Engine-noise-prone aggregates
    (variance/skew/rolling-mean/z-score) are rounded 6 dp on both
    sides, same as their standalone queries; dropna nullity is decided
    pre-rounding in both engines."""
    from crypto_data_pipeline_spark.plans.feature_pipeline import prediction_table

    df = prediction_table(_history(spark, sf_dir), spark)
    for c in ("rolling_7d_variance", "price_skew_7d",
              "return_rolling_mean_7d", "price_standardized"):
        df = df.withColumn(c, F.round(c, 6))
    return df


@register(
    "model_comparison",
    survey_ids=("M1", "M2", "M3", "M4", "M5", "M6", "O4"),
    oracle=None,
    # r11 rotation: demoted from the driver gate in favor of
    # rho_excess_perplexity_select. This was the gate's ONLY rows-only
    # row (no oracle — learner-dependent floats); every id it covers
    # keeps a hash-green driver twin (M1/M2/M4/M5 linear_ridge_closed_
    # form, M3/M4/M5 gbt_closed_form, M5/M6/O4 model_comparison_sanity,
    # which wraps THIS query), so the driver set is now 50/50 full
    # hash-match. Still executed rows-only every suite run via
    # tests/test_catalog_oracle.py::test_rows_only_queries_run.
    extra=True,
)
def model_comparison_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """models.ipynb: 4 regression pipelines on the prediction features,
    chronological holdout, RMSE/MAE/R² table ordered by RMSE (non-SQL —
    Spark ML; rows-only check: 4 rows, stable schema)."""
    from crypto_data_pipeline_spark.ml.regression import model_comparison
    from crypto_data_pipeline_spark.plans.feature_pipeline import prediction_table

    feats = prediction_table(_history(spark, sf_dir), spark)
    feature_cols = [
        "price", "pct_change", "rolling_7d_trend", "rolling_7d_variance",
        *[f"price_lag_{i}" for i in range(1, 8)],
        "price_skew_7d", "day_of_week", "is_weekend", "return_abs",
        "return_rolling_mean_7d", "price_normalized", "price_standardized",
    ]
    return model_comparison(feats, feature_cols, DATE, entity=None)


_LINEAR_RIDGE_ORACLE = f"""
WITH {HISTORY_CTE},
feats AS (
  SELECT entity_id, fetch_date, price AS y,
         lag(price, 1) OVER {W_ENTITY} AS x1,
         CAST(isodow(fetch_date) - 1 AS DOUBLE) AS x2
  FROM history
),
clean AS (SELECT * FROM feats WHERE x1 IS NOT NULL),
split AS (
  SELECT *, row_number() OVER (PARTITION BY entity_id ORDER BY fetch_date) AS rn,
         count(*) OVER (PARTITION BY entity_id) AS n_ent
  FROM clean
),
train AS (SELECT y, x1, x2 FROM split
          WHERE rn <= CAST(floor(n_ent * (1 - 1.0/6.0)) AS BIGINT)),
test  AS (SELECT y, x1, x2 FROM split
          WHERE rn >  CAST(floor(n_ent * (1 - 1.0/6.0)) AS BIGINT)),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         avg(x1) AS m1, avg(x2) AS m2, avg(y) AS my,
         stddev_samp(x1) AS s1, stddev_samp(x2) AS s2,
         stddev_pop(y) AS sy
  FROM train
),
g AS (
  SELECT n, m1, m2, my, s1, s2, sy,
         sum(((x1 - m1)/s1) * ((x1 - m1)/s1)) AS z11,
         sum(((x1 - m1)/s1) * ((x2 - m2)/s2)) AS z12,
         sum(((x2 - m2)/s2) * ((x2 - m2)/s2)) AS z22,
         sum(((x1 - m1)/s1) * (y - my)) AS z1y,
         sum(((x2 - m2)/s2) * (y - my)) AS z2y
  FROM train, m
  GROUP BY ALL
),
sol AS (
  SELECT 'linear' AS model, my, m1, m2, s1, s2,
         (z22*z1y - z12*z2y) / (z11*z22 - z12*z12) AS w1,
         (z11*z2y - z12*z1y) / (z11*z22 - z12*z12) AS w2
  FROM g
  UNION ALL
  SELECT 'ridge', my, m1, m2, s1, s2,
         ((z22 + d)*z1y - z12*z2y) / ((z11 + d)*(z22 + d) - z12*z12),
         ((z11 + d)*z2y - z12*z1y) / ((z11 + d)*(z22 + d) - z12*z12)
  FROM (SELECT *, (n - 1) / sy AS d FROM g)
),
scored AS (
  SELECT s.model, s.my, s.w1, s.w2,
         sqrt(avg(pow(t.y - (s.my + s.w1*(t.x1 - s.m1)/s.s1
                             + s.w2*(t.x2 - s.m2)/s.s2), 2))) AS rmse
  FROM test t CROSS JOIN sol s
  GROUP BY s.model, s.my, s.w1, s.w2
)
SELECT model, round(my, 6) AS intercept,
       round(w1, 6) AS w1, round(w2, 6) AS w2,
       round(rmse, 6) AS rmse_test
FROM scored
"""


@register(
    "linear_ridge_closed_form",
    survey_ids=("M1", "M2", "M4", "M5"),
    oracle=_LINEAR_RIDGE_ORACLE,
)
def linear_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M2/M4/M5 VALUE verification: the scaler+linear pipeline's
    learned parameters pinned to a DuckDB closed-form oracle to 6 dp.

    The Spark side is the real ML pipeline (VectorAssembler →
    StandardScaler(withMean, withStd) → LinearRegression) fit on the
    per-entity chronological 5/6 split (models.ipynb:110-137 / M4),
    features (price_lag_1, day_of_week), label price. The oracle
    re-derives the solutions analytically:

      * OLS (regParam=0): centered normal equations on the
        standardized design (Cramer's rule, 2×2).
      * Ridge (regParam=1, standardization=True): Spark's
        WeightedLeastSquares adds n·(λ/σy_pop)·varpop(z_j) to the
        normal-matrix diagonal (λ scaled by the label's population
        std, penalty scaled by each feature's population variance —
        identified empirically to ~1e-10 against candidate forms).
        With scaler-standardized z (samp-std=1), that diagonal is
        exactly (n-1)/σy.

    Holdout RMSE on the test fold (scaler stats from train — no
    leakage) pins M5's metric arithmetic too. Agreement is ~1e-10
    absolute, far inside the 6-dp rounding."""
    from pyspark.ml import Pipeline
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import StandardScaler, VectorAssembler
    from pyspark.ml.regression import LinearRegression

    from crypto_data_pipeline_spark.ml.regression import chronological_split

    w = ts.entity_window()
    feats = (
        _history(spark, sf_dir)
        .withColumn("x1", F.lag(PRICE, 1).over(w))
        .withColumn("x2", ((F.dayofweek(DATE) + 5) % 7).cast("double"))
        .where(F.col("x1").isNotNull())
        .select(ENTITY, DATE, F.col(PRICE).alias("y"), "x1", "x2")
    )
    # persist the split across the two fits + evals (round 13, guide
    # §2.4): each scaler fit, WLS solve, and evaluator pass otherwise
    # re-runs the silver-scan + lag-window lineage (~6 re-runs,
    # measured 29.5 CPU-s at sf0.1). Cached rows are identical to
    # recomputed rows, so the 6-dp closed-form hash is untouched.
    train, test = chronological_split(feats, DATE, entity=ENTITY)
    train = train.persist()
    test = test.persist()
    rows = []
    # try/finally (round 14, ADVICE r13): an exception during any
    # fit/eval must still release the cached split partitions —
    # evaluate_models got the same treatment in round 13
    try:
        for name, reg in (("linear", 0.0), ("ridge", 1.0)):
            pipe = Pipeline(
                stages=[
                    VectorAssembler(inputCols=["x1", "x2"], outputCol="_raw"),
                    StandardScaler(
                        inputCol="_raw", outputCol="features", withMean=True, withStd=True
                    ),
                    LinearRegression(
                        featuresCol="features", labelCol="y",
                        regParam=reg, elasticNetParam=0.0,
                    ),
                ]
            )
            model = pipe.fit(train)
            lrm = model.stages[-1]
            rmse = RegressionEvaluator(
                labelCol="y", predictionCol="prediction", metricName="rmse"
            ).evaluate(model.transform(test))
            rows.append(
                (name, float(lrm.intercept), float(lrm.coefficients[0]),
                 float(lrm.coefficients[1]), float(rmse))
            )
    finally:
        train.unpersist()
        test.unpersist()
    out = spark.createDataFrame(
        rows, "model string, intercept double, w1 double, w2 double, rmse_test double"
    )
    return out.select(
        "model",
        F.round("intercept", 6).alias("intercept"),
        F.round("w1", 6).alias("w1"),
        F.round("w2", 6).alias("w2"),
        F.round("rmse_test", 6).alias("rmse_test"),
    )


@register(
    "model_comparison_sanity",
    survey_ids=("M5", "M6", "O4"),
    oracle="""
SELECT * FROM (VALUES ('gbt', true), ('lasso', true), ('linear', true), ('ridge', true))
AS t(model, metrics_valid)
""",
)
def model_comparison_sanity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-checkable face of the ML table: metric VALUES are
    learner-dependent floats (rows-only on model_comparison by design),
    but the model set and the metric INVARIANTS — rmse >= mae > 0
    (RMS-AM inequality), r2 <= 1, all finite — are deterministic, so
    the driver gets a green row pinning the comparison's shape."""
    cmp = model_comparison_query(spark, sf_dir)
    valid = (
        F.col("rmse").isNotNull()
        & ~F.isnan("rmse")
        & (F.col("rmse") >= F.col("mae"))
        & (F.col("mae") > 0)
        & (F.col("r2") <= 1.0)
    )
    return cmp.select("model", valid.alias("metrics_valid"))


_GBT_ORACLE = f"""
WITH {HISTORY_CTE},
feats AS (
  SELECT entity_id, fetch_date, price AS y,
         CAST(isodow(fetch_date) - 1 AS DOUBLE) AS dow
  FROM history
),
split AS (
  SELECT *, row_number() OVER (PARTITION BY entity_id ORDER BY fetch_date) AS rn,
         count(*) OVER (PARTITION BY entity_id) AS n_ent
  FROM feats
),
train AS (SELECT y, dow FROM split
          WHERE rn <= CAST(floor(n_ent * (1 - 1.0/6.0)) AS BIGINT)),
test  AS (SELECT y, dow FROM split
          WHERE rn >  CAST(floor(n_ent * (1 - 1.0/6.0)) AS BIGINT)),
g1 AS (
  SELECT dow, CAST(count(*) AS DOUBLE) AS n, sum(y) AS s, sum(y*y) AS ss
  FROM train GROUP BY 1
),
c1 AS (
  SELECT dow,
         sum(n) OVER w AS nl, sum(s) OVER w AS sl, sum(ss) OVER w AS ssl,
         sum(n) OVER () AS nt, sum(s) OVER () AS st, sum(ss) OVER () AS sst
  FROM g1 WINDOW w AS (ORDER BY dow ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
b1 AS (
  SELECT dow AS thr, sl / nl AS lmean, (st - sl) / (nt - nl) AS rmean
  FROM c1 WHERE nl < nt
  ORDER BY (ssl - sl*sl/nl) + ((sst - ssl) - (st - sl)*(st - sl)/(nt - nl)), dow
  LIMIT 1
),
tr2 AS (
  SELECT t.dow,
         t.y - CASE WHEN t.dow <= b1.thr THEN b1.lmean ELSE b1.rmean END AS r
  FROM train t, b1
),
g2 AS (
  SELECT dow, CAST(count(*) AS DOUBLE) AS n, sum(r) AS s, sum(r*r) AS ss
  FROM tr2 GROUP BY 1
),
c2 AS (
  SELECT dow,
         sum(n) OVER w AS nl, sum(s) OVER w AS sl, sum(ss) OVER w AS ssl,
         sum(n) OVER () AS nt, sum(s) OVER () AS st, sum(ss) OVER () AS sst
  FROM g2 WINDOW w AS (ORDER BY dow ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
b2 AS (
  SELECT dow AS thr, sl / nl AS lmean, (st - sl) / (nt - nl) AS rmean
  FROM c2 WHERE nl < nt
  ORDER BY (ssl - sl*sl/nl) + ((sst - ssl) - (st - sl)*(st - sl)/(nt - nl)), dow
  LIMIT 1
),
scored AS (
  SELECT t.dow, t.y,
         CASE WHEN t.dow <= b1.thr THEN b1.lmean ELSE b1.rmean END
         + 0.5 * CASE WHEN t.dow <= b2.thr THEN b2.lmean ELSE b2.rmean END AS p
  FROM test t, b1, b2
),
grp AS (
  SELECT dow, p, CAST(count(*) AS BIGINT) AS n_test, sum(pow(y - p, 2)) AS sq
  FROM scored GROUP BY 1, 2
),
tot AS (SELECT sqrt(sum(sq) / sum(n_test)) AS rmse FROM grp)
SELECT CAST(dow AS INT) AS dow, round(p, 6) AS pred,
       n_test, round(rmse, 6) AS rmse_test
FROM grp, tot
"""


@register(
    "gbt_closed_form",
    survey_ids=("M3", "M4", "M5"),
    oracle=_GBT_ORACLE,
)
def gbt_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 VALUE verification: the real Spark ML GBTRegressor's numbers
    pinned to a DuckDB closed-form oracle to 6 dp (the
    linear_ridge_closed_form pattern applied to the boosted-tree
    analog of models.ipynb's XGBRegressor, reference
    notebooks/models.ipynb:127).

    Config chosen so the learner is exactly re-derivable in SQL:
    maxIter=2, maxDepth=1, one feature (day_of_week, 7 distinct
    values < maxBins=32 so every distinct value is its own split
    candidate — no quantile-sketch binning), squared loss. Closed
    form, verified empirically to full double precision on a probe
    fixture:

      * tree 1: the depth-1 stump minimizing SSE over the 6
        boundary candidates (variance-gain argmax == SSE argmin);
        leaves = mean(y) per side.
      * tree 2: same stump fit on the residuals. MLlib's
        SquaredError.gradient is -2*(y - pred), so the pseudo-label
        is TWICE the residual and the stage contribution is
        2 * stepSize * mean(residual) — with stepSize=0.25 the
        effective shrinkage is 0.5.

    Train/test is the same per-entity chronological 5/6 split as
    linear_ridge_closed_form (M4); the holdout RMSE pins M5's metric
    arithmetic on tree predictions. Output: one row per holdout
    day-of-week (prediction is a step function of dow) + the global
    RMSE, all rounded 6 dp. The argmin over split candidates compares
    raw SSE (Spark does not round) — safe because real price data
    separates candidate SSEs by many orders of magnitude more than
    the ~1e-10 cross-engine aggregation-order noise."""
    from pyspark.ml import Pipeline
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    from crypto_data_pipeline_spark.ml.regression import chronological_split

    feats = _history(spark, sf_dir).select(
        ENTITY,
        DATE,
        F.col(PRICE).alias("y"),
        ((F.dayofweek(DATE) + 5) % 7).cast("double").alias("dow"),
    )
    train, test = chronological_split(feats, DATE, entity=ENTITY)
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=["dow"], outputCol="features"),
            GBTRegressor(
                featuresCol="features", labelCol="y",
                maxIter=2, maxDepth=1, stepSize=0.25, seed=42,
            ),
        ]
    )
    model = pipe.fit(train)
    pred = model.transform(test)
    rmse = RegressionEvaluator(
        labelCol="y", predictionCol="prediction", metricName="rmse"
    ).evaluate(pred)
    return (
        pred.groupBy(F.col("dow").cast("int").alias("dow"))
        .agg(
            F.round(F.first("prediction"), 6).alias("pred"),
            F.count(F.lit(1)).alias("n_test"),
        )
        .withColumn("rmse_test", F.round(F.lit(float(rmse)), 6))
    )


# ---------------------------------------------------------------------------
# SCD-2 interval build (lakehouse history preservation)

_SCD2_ORACLE = f"""
WITH {HISTORY_CTE},
flagged AS (
  SELECT entity_id, fetch_date,
         CAST(floor(price / 50.0) AS INT) AS band,
         CASE WHEN row_number() OVER {W_ENTITY} = 1
                OR (lag(CAST(floor(price / 50.0) AS INT)) OVER {W_ENTITY})
                    IS DISTINCT FROM CAST(floor(price / 50.0) AS INT)
              THEN 1 ELSE 0 END AS opens
  FROM history
),
versioned AS (
  SELECT entity_id, fetch_date, band,
         CAST(sum(opens) OVER (PARTITION BY entity_id ORDER BY fetch_date
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
  FROM flagged
),
grouped AS (
  SELECT entity_id, version, min(band) AS band,
         min(fetch_date) AS valid_from, max(fetch_date) AS last_seen,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM versioned GROUP BY 1, 2
)
SELECT entity_id, version, band, valid_from,
       lead(valid_from) OVER (PARTITION BY entity_id ORDER BY version) AS valid_to,
       last_seen, n_rows,
       CAST(lead(valid_from) OVER (PARTITION BY entity_id ORDER BY version) IS NULL
            AS INT) AS is_current
FROM grouped
"""


@register(
    "scd2_price_bands",
    extra=True,
    survey_ids=("S7", "A8", "EXT-olap"),
    oracle=_SCD2_ORACLE,
)
def scd2_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 validity intervals over each entity's price BAND
    (floor(price/50) — constant-divisor floor is IEEE-identical across
    engines, unlike log-based banding). The inverse of the reference's
    overwrite-upsert (load_data.py:66-102): instead of keeping only
    the latest row, collapse the daily series into versioned
    valid_from/valid_to runs. One Exchange on entity_id; the
    (entity, version) groupBy and the lead() both ride that same
    partitioning (operators/scd.py)."""
    from crypto_data_pipeline_spark.operators.scd import scd2_intervals

    daily = _history(spark, sf_dir).withColumn(
        "band", F.floor(F.col(PRICE) / F.lit(50.0)).cast("int")
    )
    return scd2_intervals(
        daily.select(ENTITY, DATE, "band"),
        keys=[ENTITY], order_col=DATE, tracked=["band"],
    )


# ---------------------------------------------------------------------------
# skew diagnosis + per-group top-n


@register(
    "skew_key_shares",
    extra=True,
    survey_ids=("A6", "O2", "O3", "EXT-olap"),
    oracle="""
WITH counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows FROM events GROUP BY 1
), tot AS (SELECT sum(n_rows) AS t FROM counts)
SELECT user_id, n_rows, round(n_rows / CAST(t AS DOUBLE), 6) AS share
FROM counts, tot
ORDER BY n_rows DESC, user_id
LIMIT 10
""",
)
def skew_key_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-diagnosis histogram every 100 TB join plans from: the
    10 heaviest join keys and their share of the table. Decides
    between plain shuffle, AQE skew split, and sources/bucketed.py's
    salted_join. One scan: the grand total is a broadcast 1-row
    aggregate over the already-reduced per-key counts."""
    from crypto_data_pipeline_spark.sources.bucketed import key_skew_stats

    return key_skew_stats(load_table(spark, sf_dir, "events"), ["user_id"], top=10)


@register(
    "topn_events_per_type",
    extra=True,
    survey_ids=("O2", "O3", "A8", "EXT-olap"),
    oracle="""
SELECT event_type, rnk, event_id, value
FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rnk
  FROM events WHERE value IS NOT NULL
)
WHERE rnk <= 3
""",
)
def topn_events_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 rows per group by value — the per-group cousin of the
    global TakeOrdered (top_users_by_value). Scale path: Spark's
    WindowGroupLimit pushes the rank<=k limit BELOW the shuffle, so
    each map task forwards at most k rows per group instead of sorting
    whole partitions — plan-asserted in tests/test_plan_shapes.py."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return (
        ev.select(
            "event_type", "event_id", "value", F.row_number().over(w).alias("rnk")
        )
        .where(F.col("rnk") <= 3)
        .select("event_type", "rnk", "event_id", "value")
    )


# ---------------------------------------------------------------------------
# ordered multi-step funnel + anti join

_ORDERED_FUNNEL_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
s1 AS (
  SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
            OVER (PARTITION BY user_id ORDER BY us, event_id
                  ROWS UNBOUNDED PRECEDING) AS seen_view_us
  FROM ev
),
s2 AS (
  SELECT *, CASE WHEN event_type = 'click' AND seen_view_us IS NOT NULL
                 THEN us END AS qclick_us
  FROM s1
),
s3 AS (
  SELECT *, min(qclick_us)
            OVER (PARTITION BY user_id ORDER BY us, event_id
                  ROWS UNBOUNDED PRECEDING) AS seen_qclick_us
  FROM s2
),
s4 AS (
  SELECT *, CASE WHEN event_type = 'purchase' AND seen_qclick_us IS NOT NULL
                 THEN us END AS qpurchase_us
  FROM s3
)
SELECT user_id,
       coalesce(min(CASE WHEN event_type = 'view' THEN us END), -1) AS view_us,
       coalesce(min(qclick_us), -1) AS click_us,
       coalesce(min(qpurchase_us), -1) AS purchase_us,
       CASE WHEN min(qpurchase_us) IS NOT NULL THEN 3
            WHEN min(qclick_us) IS NOT NULL THEN 2
            WHEN min(CASE WHEN event_type = 'view' THEN us END) IS NOT NULL THEN 1
            ELSE 0 END AS funnel_depth
FROM s4 GROUP BY user_id
"""


@register(
    "funnel_ordered_steps",
    extra=True,
    survey_ids=("A2", "W3", "F4", "EXT-olap"),
    oracle=_ORDERED_FUNNEL_ORACLE,
)
def funnel_ordered_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ORDERED view→click→purchase funnel per user: a click
    only counts after the user's first view, a purchase only after the
    first counted click (session_funnel's per-session flags can't
    express the cross-step ordering). One Exchange on user_id: the two
    running-min windows and the final groupBy all share it. Every
    output is exact integer µs (null steps coalesced to -1 — the
    sentinel keeps sorted-tuple comparison total)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "click", "purchase"))
        .select(
            "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s1 = ev.withColumn(
        "seen_view_us",
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(w),
    )
    s2 = s1.withColumn(
        "qclick_us",
        F.when(
            (F.col("event_type") == "click") & F.col("seen_view_us").isNotNull(),
            F.col("us"),
        ),
    ).withColumn("seen_qclick_us", F.min("qclick_us").over(w))
    s3 = s2.withColumn(
        "qpurchase_us",
        F.when(
            (F.col("event_type") == "purchase") & F.col("seen_qclick_us").isNotNull(),
            F.col("us"),
        ),
    )
    first_view = F.min(F.when(F.col("event_type") == "view", F.col("us")))
    return s3.groupBy("user_id").agg(
        F.coalesce(first_view, F.lit(-1)).alias("view_us"),
        F.coalesce(F.min("qclick_us"), F.lit(-1)).alias("click_us"),
        F.coalesce(F.min("qpurchase_us"), F.lit(-1)).alias("purchase_us"),
        F.when(F.min("qpurchase_us").isNotNull(), 3)
        .when(F.min("qclick_us").isNotNull(), 2)
        .when(first_view.isNotNull(), 1)
        .otherwise(0)
        .alias("funnel_depth"),
    )


@register(
    "customers_no_urgent_orders",
    extra=True,
    survey_ids=("J2", "P5", "EXT-olap"),
    oracle="""
SELECT c_custkey, c_name, c_nationkey
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
)
def customers_no_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left ANTI join — the set-difference shape every
    decontamination / suppression-list pass uses (the dedup and
    contamination operators apply it internally; this pins the bare
    semantics against the SQL subquery form). The anti side is
    pre-filtered to urgent orders then reduced to distinct keys, so
    the broadcast carries keys only."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        # distinct BEFORE the broadcast: the build side ships one key
        # per urgent CUSTOMER, not one per urgent order
        .distinct()
    )
    return c.join(urgent, "c_custkey", "left_anti")


@register(
    "props_variant_stats",
    extra=True,
    survey_ids=("F3", "U4", "EXT-olap"),
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) - count(CAST(trunc(CAST(props->>'$.k' AS DOUBLE)) AS BIGINT)) AS BIGINT) AS n_missing,
       sum(CAST(trunc(CAST(props->>'$.k' AS DOUBLE)) AS BIGINT)) AS k_sum,
       min(CAST(trunc(CAST(props->>'$.k' AS DOUBLE)) AS BIGINT)) AS k_min,
       max(CAST(trunc(CAST(props->>'$.k' AS DOUBLE)) AS BIGINT)) AS k_max
FROM events
GROUP BY event_type
""",
)
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via Spark 4 VariantType: ``parse_json``
    decodes the props payload ONCE into a binary variant, and every
    ``variant_get`` path walks that binary form — unlike
    ``get_json_object`` (the F3 queries' classic path), which re-parses
    the string per extraction. At 100 TB with a dozen extracted paths,
    that's the difference between one decode and twelve. Exact integer
    aggregates keep the oracle comparison float-free; the sum is
    CAST-to-BIGINT on the DuckDB side (its integer SUM widens to
    HUGEINT)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.try_parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count("k")).alias("n_missing"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


_GAPFILL_ORACLE = f"""
WITH {HISTORY_CTE},
bounds AS (
  SELECT entity_id, min(fetch_date) AS d0, max(fetch_date) AS d1
  FROM history GROUP BY 1
),
cal AS (
  SELECT entity_id,
         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS fetch_date
  FROM bounds
),
j AS (
  SELECT c.entity_id, c.fetch_date, h.price
  FROM cal c LEFT JOIN history h USING (entity_id, fetch_date)
)
SELECT entity_id, fetch_date,
       last_value(price IGNORE NULLS)
         OVER (PARTITION BY entity_id ORDER BY fetch_date
               ROWS UNBOUNDED PRECEDING) AS price,
       CAST(price IS NULL AS INT) AS is_gap
FROM j
"""


@register(
    "resample_daily_ffill",
    extra=True,
    survey_ids=("W11", "F13", "EXT-olap"),
    oracle=_GAPFILL_ORACLE,
)
def resample_daily_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling resample: densify each entity's series to a full
    daily calendar (sequence+explode between its own min/max dates)
    and carry the last observation forward — pandas'
    ``asfreq('D').ffill()``, the canonical pre-step before any
    fixed-frequency window math on irregular series. Filled prices are
    exact COPIES of observed values (no arithmetic → no float noise).
    Scale shape: the calendar derives from the per-entity bounds
    aggregate (tiny), the join and the LOCF window both cluster on
    entity_id, and row growth is bounded by span-days per entity."""
    return ts.resample_daily_locf(_history(spark, sf_dir))


@register(
    "user_set_ops",
    extra=True,
    survey_ids=("§2.7", "A6", "EXT-olap"),
    oracle="""
SELECT 'both' AS set_op, user_id
FROM (SELECT user_id FROM events WHERE event_type = 'view'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase')
UNION ALL
SELECT 'view_only' AS set_op, user_id
FROM (SELECT user_id FROM events WHERE event_type = 'view'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'purchase')
""",
)
def user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set semantics (§2.7's DISTINCT cousins):
    viewers who also purchased vs viewers who never did. Spark plans
    both as distinct-then-left-semi/anti hash joins — same shuffle
    shape as the suppression-list anti join, so the 100 TB story is
    identical (keys-only exchanges)."""
    ev = load_table(spark, sf_dir, "events")
    viewers = ev.where(F.col("event_type") == "view").select("user_id")
    buyers = ev.where(F.col("event_type") == "purchase").select("user_id")
    both = viewers.intersect(buyers).select(F.lit("both").alias("set_op"), "user_id")
    only = viewers.subtract(buyers).select(
        F.lit("view_only").alias("set_op"), "user_id"
    )
    return both.unionByName(only)


@register(
    "price_rank_normalized",
    extra=True,
    survey_ids=("W11", "A12", "EXT-olap"),
    oracle=f"""
WITH {HISTORY_CTE}
SELECT entity_id, fetch_date,
       round(percent_rank() OVER {W_ENTITY}, 9) AS pr,
       round(cume_dist() OVER {W_ENTITY}, 9) AS cd
FROM history
""",
)
def price_rank_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based normalization per entity — percent_rank (the
    quantile-normalization primitive: outlier-robust where the z-score
    A12 path is not) and cume_dist, over the same one-Exchange entity
    windows every series query rides. Both are exact rational values;
    rounded 9dp on both sides only to absorb division-order noise."""
    h = _history(spark, sf_dir)
    w = Window.partitionBy(ENTITY).orderBy(DATE)
    return h.select(
        ENTITY,
        DATE,
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
    )
