"""Shape/semantics tests for the end-to-end feature pipeline
(plans/feature_pipeline.py) against FIXTURES.md §3/§4."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_data_pipeline_spark.plans.registry import load_with_extras

EXPECTED_PREDICTION_COLS = [
    # table-3 base (10)
    "entity_id", "price", "fetch_date", "pct_change", "year", "month",
    "year_month", "risk_level", "rolling_7d_trend", "rolling_7d_variance",
    # lag block + target + skew (9)
    *[f"price_lag_{i}" for i in range(1, 8)], "next_day_price", "price_skew_7d",
    # calendar (7)
    "day_of_week", "day_name", "is_weekend", "week_of_year",
    "day_of_month", "quarter", "day_of_year",
    # holidays (3), returns (2), scaling (2)
    "is_us_holiday", "is_china_holiday", "is_pre_us_holiday",
    "return_abs", "return_rolling_mean_7d",
    "price_normalized", "price_standardized",
]


@pytest.fixture(scope="module")
def pred(spark, sf_dir):
    return load_with_extras()["prediction_features"].fn(spark, sf_dir)


def test_prediction_table_schema(pred):
    """All 33 named feature columns of <coin>_prediction_data.csv
    (FIXTURES §4 counts 34 — the extra one is the unnamed pandas CSV
    index, which a DataFrame rightly has no analog for)."""
    assert sorted(pred.columns) == sorted(EXPECTED_PREDICTION_COLS)


def test_prediction_table_dropna_window(pred, spark, sf_dir):
    """transform_data.ipynb:576 drops any row with a NaN: lag-7 and
    rolling-7 features null out the first 7 rows per entity, lead-1
    nulls the last — so each entity contributes (n_days - 8) rows."""
    from crypto_data_pipeline_spark.operators import timeseries as ts
    from crypto_data_pipeline_spark.sources.tables import load_table

    hist = ts.daily_price_series(load_table(spark, sf_dir, "events"))
    days = hist.groupBy("entity_id").count()
    got = pred.groupBy("entity_id").count().withColumnRenamed("count", "got")
    joined = days.join(got, "entity_id", "left").na.fill(0, ["got"])
    bad = joined.where(F.col("got") != F.greatest(F.col("count") - 8, F.lit(0))).collect()
    assert not bad, f"per-entity row counts off: {bad[:5]}"


def test_no_rows_with_nulls_survive(pred):
    cond = None
    for c in pred.columns:
        nullc = F.col(c).isNull()
        cond = nullc if cond is None else (cond | nullc)
    assert pred.where(cond).count() == 0
