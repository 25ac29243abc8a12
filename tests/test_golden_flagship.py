"""Golden-output tests for the reference's two published queries
(SURVEY.md §5 item 2): hand-built coin_history-shaped fixtures with
hand-computed expected tables, mirroring the README result shapes
(/root/reference/README.md:203-243) — including the semantics quirks
the engine must replicate, not fix:

  * Query 2 groups price_increases by the recovery price
    (sql/analysis_queries.sql:69), so EVERY qualifying recovery row
    enters the final average — not just the first.
  * ROUND follows PostgreSQL NUMERIC half-away-from-zero: a monthly
    average landing exactly on .xx5 rounds UP.
  * Market caps format as x.xxT at/above 1e12, else x.xxB, NULL
    passthrough (sql/analysis_queries.sql:74-78).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from crypto_data_pipeline_spark.operators import islands, timeseries as ts


def _history(spark, rows):
    return spark.createDataFrame(
        [(c, dt.date(2025, 1, 1) + dt.timedelta(days=i), p) for c, i, p in rows],
        "entity_id string, fetch_date date, price double",
    )


def test_query2_golden_all_recovery_rows(spark):
    """bitcoin: 100, 90, 80, 70 (3 consecutive drops, low 70,
    end day3) then 95 and 85 — BOTH recover above 70, so the average
    gain is mean(35.714286, 21.428571) = 28.571...→ 28.57. A
    first-recovery-only 'fix' would give 35.71 and is wrong."""
    hist = _history(
        spark,
        [("bitcoin", i, p) for i, p in enumerate([100.0, 90.0, 80.0, 70.0, 95.0, 85.0])]
        # ethereum: drops of only 2 days → no island ≥ 3 → absent
        + [("ethereum", i, p) for i, p in enumerate([50.0, 45.0, 40.0, 60.0, 55.0])],
    )
    caps = spark.createDataFrame(
        [("bitcoin", 2.06e12), ("ethereum", 3.1402e11)],
        "entity_id string, market_cap double",
    ).select("entity_id", "market_cap", islands.format_market_cap("market_cap").alias("market_cap_formatted"))

    out = islands.recovery_report(hist, caps).collect()
    assert len(out) == 1
    row = out[0]
    assert row.entity_id == "bitcoin"
    assert row.avg_price_increase_pct == 28.57
    assert row.market_cap_formatted == "2.06T"


def test_query2_island_stages(spark):
    """The intermediate CTE stages on the same fixture: drop flags,
    island ids, and the ≥3 HAVING filter."""
    hist = _history(spark, [("btc", i, p) for i, p in enumerate([100.0, 90.0, 80.0, 70.0, 95.0, 85.0])])
    seqs = islands.drop_sequences(islands.daily_changes(hist))
    flags = [r.is_drop_day for r in seqs.orderBy("fetch_date").collect()]
    assert flags == [0, 1, 1, 1, 0, 1]

    drops = islands.consecutive_drops(seqs).collect()
    assert len(drops) == 1
    d = drops[0]
    assert d.consecutive_days == 3
    assert d.lowest_price == 70.0
    assert str(d.end_date) == "2025-01-04"

    incr = islands.price_increases(islands.consecutive_drops(seqs), hist)
    got = {(r.recovery_price): str(r.recovery_date) for r in incr.collect()}
    assert got == {95.0: "2025-01-05", 85.0: "2025-01-06"}


def test_query1_golden_monthly_avg_half_up(spark):
    """Monthly average with an exact .xx5 tie must round UP (PG NUMERIC
    half-away-from-zero): avg(98.42, 98.43) = 98.425 → 98.43."""
    hist = _history(
        spark,
        [("btc", 0, 98.42), ("btc", 1, 98.43), ("btc", 40, 50.0), ("ada", 0, 1.0349)],
    )
    got = {
        (r.entity_id, r.year, r.month): r.avg_price
        for r in ts.monthly_avg(hist).collect()
    }
    assert got == {
        ("btc", 2025, 1): 98.43,
        ("btc", 2025, 2): 50.0,
        ("ada", 2025, 1): 1.03,
    }


def test_market_cap_formatting_branches(spark):
    df = spark.createDataFrame(
        [(2.06e12,), (3.1402e11,), (1.0e12,), (None,)], "cap double"
    ).select(islands.format_market_cap("cap").alias("fmt"))
    assert [r.fmt for r in df.collect()] == ["2.06T", "314.02B", "1.0T", None]


def test_null_prices_excluded_like_reference(spark):
    """WHERE price_usd IS NOT NULL (analysis_queries.sql:10,34): null
    price days must not create phantom drops or enter averages."""
    hist = spark.createDataFrame(
        [
            ("btc", dt.date(2025, 1, 1), 100.0),
            ("btc", dt.date(2025, 1, 2), None),
            ("btc", dt.date(2025, 1, 3), 90.0),
        ],
        "entity_id string, fetch_date date, price double",
    )
    avg = ts.monthly_avg(hist).collect()[0]
    assert avg.avg_price == 95.0
    changes = islands.daily_changes(hist).orderBy("fetch_date").collect()
    assert [r.is_drop_day for r in changes] == [0, 1]  # null row gone; 90 vs lag 100
