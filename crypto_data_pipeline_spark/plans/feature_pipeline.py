"""End-to-end feature pipeline: the Spark re-expression of the
reference's notebook chain (EDA.ipynb → transform_data.ipynb), bronze
price history → the 34-column prediction feature table
(FIXTURES.md §3/§4).

The reference loops over coins in Python, building each coin's frame
separately (transform_data.ipynb cell 6); here ALL entities compute in
one lazy DAG — every per-coin loop collapses into a window over
``partitionBy(entity)``, so the whole 34-column build is ONE shuffle
of the fact table plus broadcast joins for the tiny dims (holiday
calendar, month-level risk labels).

Column-for-column parity with <coin>_prediction_data.csv, including
the reference's quirks (scaling fit BEFORE dropna — leakage replicated
faithfully; SURVEY §7 risk 4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from crypto_data_pipeline_spark.operators import calendar as cal
from crypto_data_pipeline_spark.operators import risk, timeseries as ts


def processed_table(history: DataFrame) -> DataFrame:
    """EDA stage → processed_crypto_data.csv shape (10 cols,
    FIXTURES.md §3): pct_change, year/month keys, risk level, rolling
    trend + population variance."""
    df = ts.with_pct_change(history)
    df = df.withColumn("year", F.year(ts.DATE).cast("int")).withColumn(
        "month", F.month(ts.DATE).cast("int")
    ).withColumn("year_month", F.date_format(ts.DATE, "yyyy-MM"))
    df = risk.with_risk_level(df)
    df = ts.with_rolling_trend(df)
    df = ts.with_rolling_variance(df)
    return df.select(
        ts.ENTITY, ts.PRICE, ts.DATE, "pct_change", "year", "month", "year_month",
        "risk_level", "rolling_7d_trend", "rolling_7d_variance",
    )


def prediction_table(history: DataFrame, spark: SparkSession, dropna: bool = True) -> DataFrame:
    """Transform stage → <coin>_prediction_data.csv shape (34 cols,
    FIXTURES.md §4). ``dropna=True`` replicates the final
    ``dropna()`` (transform_data.ipynb:576) — note scaling columns are
    computed over the FULL series first."""
    df = processed_table(history)
    df = ts.with_lag_features(df)
    df = ts.with_lead_target(df)
    df = ts.with_rolling_skew(df)
    df = cal.with_calendar_features(df)  # recomputes year_month identically
    df = cal.with_holiday_flags(df, spark)
    df = ts.with_return_features(df)
    df = ts.with_minmax_norm(df)
    df = ts.with_zscore(df)
    if dropna:
        feature_cols = [
            "pct_change", "rolling_7d_trend", "rolling_7d_variance",
            *[f"price_lag_{i}" for i in range(1, 8)],
            "next_day_price", "price_skew_7d", "return_abs", "return_rolling_mean_7d",
        ]
        df = df.na.drop(subset=feature_cols)
    return df
