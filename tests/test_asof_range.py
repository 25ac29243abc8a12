"""Edge-case tests for the temporal joins (operators/asof.py) that the
sf tables don't exercise: exact-timestamp ties, strictly-before mode,
legitimately-null right values (the struct-payload guarantee), empty
right side, and bucket-boundary hits in the range join.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.operators.asof import asof_join, range_join_agg

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10.0)), (2, "u", _ts(20.0)), (3, "v", _ts(5.0))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(10.0), 100.0), ("u", _ts(15.0), None), ("w", _ts(1.0), 7.0)],
        "k string, rts timestamp, v double",
    )
    return left, right


def test_asof_backward_with_exact_tie(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", right_cols=["v"])
    rows = {r.id: (r.rts, r.v) for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] == (_ts(10.0), 100.0)  # equal ts matches when allow_exact
    # id=2's nearest prior right row has a NULL value — the struct
    # payload must return that null, not skip back to the t=10 row.
    assert rows[2] == (_ts(15.0), None)
    assert rows[3] == (None, None)  # no right rows for key v


def test_asof_strictly_before(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_cols=["v"], allow_exact=False,
    )
    rows = {r.id: r.rts for r in out.collect()}
    assert rows[1] is None  # t=10 right row is no longer eligible
    assert rows[2] == _ts(15.0)


def test_asof_empty_right(spark):
    left, _ = _frames(spark)
    right = spark.createDataFrame([], "k string, rts timestamp, v double")
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", right_cols=["v"])
    assert out.count() == 3
    assert all(r.v is None for r in out.collect())


def test_range_join_boundaries_and_zero_match(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(100.0)), (2, "z", _ts(100.0))], "id long, k string, ts timestamp"
    )
    # Right rows at exactly -60s, 0s (inclusive bounds), and one just
    # outside on each side; width == 60s so the two probes straddle a
    # bucket edge.
    right = spark.createDataFrame(
        [("u", _ts(40.0), 1.0), ("u", _ts(100.0), 2.0),
         ("u", _ts(39.999999), 4.0), ("u", _ts(100.000001), 8.0)],
        "k string, ts timestamp, v double",
    )
    out = range_join_agg(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        lower_s=-60.0, upper_s=0.0,
        aggs=[F.count("v_r").alias("n"), F.coalesce(F.sum("v_r"), F.lit(0.0)).alias("s")],
    )
    rows = {r.id: (r.n, r.s) for r in out.collect()}
    assert rows[1] == (2, 3.0)  # inclusive both ends, outsiders excluded
    assert rows[2] == (0, 0.0)  # unmatched left row survives with 0


def test_range_join_no_double_count_same_bucket(spark):
    # Interval narrower than the data spacing, probes collapse to one
    # bucket (array_distinct) — each right row counted at most once.
    left = spark.createDataFrame([(1, "u", _ts(30.0))], "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("u", _ts(25.0), 1.0), ("u", _ts(25.0), 1.0)], "k string, ts timestamp, v double"
    )
    out = range_join_agg(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        lower_s=-10.0, upper_s=0.0,
        aggs=[F.count("v_r").alias("n")],
    )
    assert out.collect()[0].n == 2  # both duplicates, once each
