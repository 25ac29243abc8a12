"""Pandas-parity property tests (SURVEY.md §5 item 3).

The reference computes every feature with pandas/numpy/scipy; each
Spark operator must reproduce those semantics bit-for-bit-ish
(rtol 1e-9) on seeded random walks — catching the ddof, skew-bias and
calendar-convention traps in SURVEY §7's risk register:

  * np.var / rolling.var are POPULATION variance only with ddof=0
  * pandas rolling(7).skew() is bias-corrected Fisher-Pearson G1
  * scipy.stats.zscore uses ddof=0
  * pandas dt.dayofweek is Monday=0, Spark dayofweek is Sunday=1
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from crypto_data_pipeline_spark.operators import calendar as cal
from crypto_data_pipeline_spark.operators import risk, timeseries as ts

RNG = np.random.default_rng(42)


def _walk(entity: str, start: dt.date, n: int, scale: float) -> pd.DataFrame:
    steps = RNG.normal(0, 0.03, n)
    # a few forced multi-day drops so the islands/risk paths light up
    steps[10:14] = -0.08
    steps[40:42] = -0.3
    prices = scale * np.exp(np.cumsum(steps))
    dates = [start + dt.timedelta(days=i) for i in range(n)]
    # drop a couple of dates → gaps, like missing fetch days
    keep = np.ones(n, dtype=bool)
    keep[[17, 53]] = False
    return pd.DataFrame(
        {"entity_id": entity, "fetch_date": np.array(dates)[keep], "price": prices[keep]}
    )


@pytest.fixture(scope="module")
def pdf() -> pd.DataFrame:
    frames = [
        _walk("btc", dt.date(2024, 12, 1), 90, 6e4),
        _walk("eth", dt.date(2024, 12, 1), 90, 2.5e3),
        _walk("ada", dt.date(2024, 12, 15), 70, 0.7),
    ]
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="module")
def sdf(spark, pdf):
    return spark.createDataFrame(pdf, "entity_id string, fetch_date date, price double")


def _collect(df, col):
    rows = df.select("entity_id", "fetch_date", col).collect()
    return {(r.entity_id, str(r.fetch_date)): r[2] for r in rows}


def _expect(pdf, series):
    return {
        (e, str(d)): (None if pd.isna(v) else float(v))
        for e, d, v in zip(pdf["entity_id"], pdf["fetch_date"], series)
    }


def _assert_close(got: dict, want: dict, rtol=1e-9):
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        if w is None:
            assert g is None, f"{k}: expected null, got {g}"
        else:
            assert g is not None and np.isclose(g, w, rtol=rtol, equal_nan=True), f"{k}: {g} != {w}"


def test_pct_change_parity(sdf, pdf):
    got = _collect(ts.with_pct_change(sdf), "pct_change")
    want = _expect(pdf, pdf.groupby("entity_id")["price"].pct_change() * 100)
    _assert_close(got, want)


def test_lag_lead_parity(sdf, pdf):
    got = _collect(ts.with_lead_target(ts.with_lag_features(sdf, n=3)), "next_day_price")
    want = _expect(pdf, pdf.groupby("entity_id")["price"].shift(-1))
    _assert_close(got, want)
    got3 = _collect(ts.with_lag_features(sdf, n=3), "price_lag_3")
    want3 = _expect(pdf, pdf.groupby("entity_id")["price"].shift(3))
    _assert_close(got3, want3)


def test_rolling_trend_parity(sdf, pdf):
    got = _collect(ts.with_rolling_trend(sdf), "rolling_7d_trend")
    want = _expect(pdf, (pdf["price"] / pdf.groupby("entity_id")["price"].shift(7) - 1) * 100)
    _assert_close(got, want)


def test_rolling_variance_population_parity(sdf, pdf):
    """np.var over trailing 8 rows = rolling(8).var(ddof=0) — SAMPLE
    variance (Spark's default `variance`) would be flat wrong."""
    got = _collect(ts.with_rolling_variance(sdf), "rolling_7d_variance")
    want = _expect(
        pdf, pdf.groupby("entity_id")["price"].transform(lambda s: s.rolling(8).var(ddof=0))
    )
    _assert_close(got, want)


def test_rolling_skew_bias_corrected_parity(sdf, pdf):
    """pandas rolling(7).skew() is the bias-corrected Fisher-Pearson G1;
    the operator derives it from raw windowed moments. Moment math in
    doubles loses ~half the mantissa to cancellation → rtol 1e-5."""
    got = _collect(ts.with_rolling_skew(sdf), "price_skew_7d")
    want = _expect(
        pdf, pdf.groupby("entity_id")["price"].transform(lambda s: s.rolling(7).skew())
    )
    _assert_close(got, want, rtol=1e-5)


def test_return_rolling_mean_parity(sdf, pdf):
    got = _collect(ts.with_return_features(ts.with_pct_change(sdf)), "return_rolling_mean_7d")
    ret = (pdf.groupby("entity_id")["price"].pct_change() * 100).abs()
    want = _expect(pdf, ret.groupby(pdf["entity_id"]).transform(lambda s: s.rolling(7).mean()))
    _assert_close(got, want)


def test_minmax_and_zscore_population_parity(sdf, pdf):
    got_mm = _collect(ts.with_minmax_norm(sdf), "price_normalized")
    g = pdf.groupby("entity_id")["price"]
    want_mm = _expect(pdf, (pdf["price"] - g.transform("min")) / (g.transform("max") - g.transform("min")))
    _assert_close(got_mm, want_mm)

    got_z = _collect(ts.with_zscore(sdf), "price_standardized")
    want_z = _expect(pdf, (pdf["price"] - g.transform("mean")) / g.transform(lambda s: s.std(ddof=0)))
    _assert_close(got_z, want_z)


def _pandas_risk(pdf: pd.DataFrame) -> dict:
    """Replicates EDA.ipynb:1192-1226 calculate_risk_level verbatim."""
    out = {}
    df = pdf.copy()
    df["pct_change"] = df.groupby("entity_id")["price"].pct_change() * 100
    df["year_month"] = pd.to_datetime(df["fetch_date"]).dt.strftime("%Y-%m")
    for (e, ym), grp in df.groupby(["entity_id", "year_month"]):
        d = grp["pct_change"].to_numpy() / 100
        level = "Low Risk"
        for i in range(len(d) - 1):
            compound = (1 + d[i]) * (1 + d[i + 1]) - 1
            if compound <= -0.5:
                level = "High Risk"
                break
            if compound <= -0.2:
                level = "Medium Risk"
        out[(e, ym)] = level
    return out


def test_risk_level_parity(sdf, pdf):
    prepared = cal.with_calendar_features(ts.with_pct_change(sdf))
    got = {
        (r.entity_id, r.year_month): r.risk_level
        for r in risk.risk_levels(prepared).collect()
    }
    assert got == _pandas_risk(pdf)


def test_risk_level_fallback_applyinpandas_parity(sdf, pdf):
    """The documented U1 fallback (literal groupby().apply through
    applyInPandas) must label every (entity, month) identically to
    both the codegen rewrite AND the pandas reference model."""
    prepared = cal.with_calendar_features(ts.with_pct_change(sdf))
    got = {
        (r.entity_id, r.year_month): r.risk_level
        for r in risk.risk_levels_pandas(prepared).collect()
    }
    assert got == _pandas_risk(pdf)


def test_calendar_features_parity(sdf, pdf):
    feats = cal.with_calendar_features(sdf)
    rows = {
        (r.entity_id, str(r.fetch_date)): r
        for r in feats.collect()
    }
    dts = pd.to_datetime(pdf["fetch_date"])
    iso_week = dts.dt.isocalendar().week
    names = dts.dt.dayofweek.map(dict(enumerate(cal.SPANISH_DAY_NAMES)))
    for i, (e, d) in enumerate(zip(pdf["entity_id"], pdf["fetch_date"])):
        r = rows[(e, str(d))]
        assert r.day_of_week == dts.dt.dayofweek.iloc[i]  # pandas Mon=0
        assert r.day_name == names.iloc[i]
        assert r.is_weekend == int(dts.dt.dayofweek.iloc[i] in (5, 6))
        assert r.week_of_year == int(iso_week.iloc[i])  # ISO week, year boundary incl.
        assert r.quarter == dts.dt.quarter.iloc[i]
        assert r.day_of_year == dts.dt.dayofyear.iloc[i]
        assert r.year_month == dts.dt.strftime("%Y-%m").iloc[i]


def test_holiday_flags_parity(spark, sdf, pdf):
    flagged = cal.with_holiday_flags(sdf, spark)
    rows = {(r.entity_id, str(r.fetch_date)): r for r in flagged.collect()}
    us = {dt.date.fromisoformat(s) for s in cal.US_HOLIDAYS}
    cn = {dt.date.fromisoformat(s) for s in cal.CN_HOLIDAYS}
    hit_some = 0
    for e, d in zip(pdf["entity_id"], pdf["fetch_date"]):
        r = rows[(e, str(d))]
        assert r.is_us_holiday == int(d in us)
        assert r.is_china_holiday == int(d in cn)
        assert r.is_pre_us_holiday == int(d + dt.timedelta(days=1) in us)
        hit_some += r.is_us_holiday + r.is_china_holiday
    assert hit_some > 0, "fixture must cover actual holidays (Dec 25, Jan 1...)"


def test_resample_ffill_parity(spark, sdf, pdf):
    """Gap-fill must reproduce pandas asfreq('D').ffill() per entity —
    same calendar, same carried values, gaps exactly where the walk
    fixture dropped dates."""
    got = {
        (r.entity_id, str(r.fetch_date)): (r.price, r.is_gap)
        for r in ts.resample_daily_locf(sdf).collect()
    }
    want = {}
    for ent, grp in pdf.groupby("entity_id"):
        g = (
            grp.set_index(pd.to_datetime(grp["fetch_date"]))["price"]
            .asfreq("D")
        )
        filled = g.ffill()
        for d, v in filled.items():
            want[(ent, str(d.date()))] = (float(v), int(pd.isna(g[d])))
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][1] == want[k][1], k
        assert abs(got[k][0] - want[k][0]) <= 1e-9 * max(1.0, abs(want[k][0])), k


def test_ewma_bounded_adjust_parity(sdf, pdf):
    """with_ewma == the literal bounded adjust=True formula: weighted
    sum over the trailing W rows with weights (1-a)^age / same sum of
    weights — checked per (entity, date) against a pandas rolling
    apply."""
    alpha, window = 0.3, 10

    def bounded_ewma(s: pd.Series) -> float:
        v = s.to_numpy()
        wgt = (1 - alpha) ** np.arange(len(v) - 1, -1, -1)
        return float((v * wgt).sum() / wgt.sum())

    want = {}
    for e, g in pdf.groupby("entity_id"):
        g = g.sort_values("fetch_date")
        r = g["price"].rolling(window, min_periods=1).apply(bounded_ewma, raw=False)
        for d, val in zip(g["fetch_date"], r):
            want[(e, str(d))] = round(val, 6)
    got = {
        (r.entity_id, str(r.fetch_date)): r.ewma_price
        for r in ts.with_ewma(sdf, value="price", alpha=alpha, window=window).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])


def test_ewma_null_values_renormalize(spark):
    """A NULL observation must drop from numerator AND denominator —
    not poison the whole trailing window."""
    df = spark.createDataFrame(
        [("x", dt.date(2024, 1, d), p) for d, p in
         [(1, 10.0), (2, None), (3, 30.0)]],
        "entity_id string, fetch_date date, price double",
    )
    got = {
        str(r.fetch_date): r.ewma_price
        for r in ts.with_ewma(df, value="price", alpha=0.3, window=10).collect()
    }
    a = 0.3
    w1, w0 = 1.0, (1 - a)  # newest, one-older weights
    assert got["2024-01-01"] == round(10.0, 6)
    # day 2: only the (older) day-1 value contributes -> plain 10.0
    assert got["2024-01-02"] == round(10.0, 6)
    # day 3: values 10 (weight (1-a)^2) and 30 (weight 1); null slot absent
    w2 = (1 - a) ** 2
    assert got["2024-01-03"] == round((10.0 * w2 + 30.0 * w1) / (w2 + w1), 6)
