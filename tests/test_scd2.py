"""SCD-2 interval build (operators/scd.py): interval semantics on
hand-written histories, null-safe change detection, and the
one-Exchange plan claim."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.operators.scd import scd2_intervals


def _d(day: int) -> dt.date:
    return dt.date(2024, 1, day)


def test_intervals_collapse_runs(spark):
    rows = [
        ("a", _d(1), "x"),
        ("a", _d(2), "x"),
        ("a", _d(3), "y"),
        ("a", _d(4), "x"),
        ("b", _d(1), "z"),
    ]
    df = spark.createDataFrame(rows, ["k", "snap", "attr"])
    out = scd2_intervals(df, ["k"], "snap", ["attr"])
    got = {(r.k, r.version): r for r in out.collect()}
    assert len(got) == 4
    a1 = got[("a", 1)]
    assert (a1.attr, a1.valid_from, a1.valid_to, a1.n_rows, a1.is_current) == (
        "x", _d(1), _d(3), 2, 0,
    )
    a3 = got[("a", 3)]
    assert (a3.attr, a3.valid_from, a3.valid_to, a3.is_current) == ("x", _d(4), None, 1)
    assert got[("b", 1)].is_current == 1


def test_null_safe_change_detection(spark):
    """NULL→NULL is not a change; NULL→value and value→NULL are.
    A first row with a NULL tracked value still opens version 1."""
    rows = [
        ("a", _d(1), None),
        ("a", _d(2), None),
        ("a", _d(3), "v"),
        ("a", _d(4), None),
    ]
    df = spark.createDataFrame(rows, ["k", "snap", "attr"])
    out = scd2_intervals(df, ["k"], "snap", ["attr"]).orderBy("version").collect()
    assert [(r.version, r.attr, r.n_rows) for r in out] == [
        (1, None, 2), (2, "v", 1), (3, None, 1),
    ]


def test_any_tracked_column_opens_a_version(spark):
    rows = [
        ("a", _d(1), "x", 1),
        ("a", _d(2), "x", 2),  # second col changes
        ("a", _d(3), "y", 2),  # first col changes
        ("a", _d(4), "y", 2),
    ]
    df = spark.createDataFrame(rows, ["k", "snap", "c1", "c2"])
    out = scd2_intervals(df, ["k"], "snap", ["c1", "c2"])
    assert out.count() == 3


def test_single_exchange_plan(spark):
    """The groupBy on (key, version) and the lead() over versions must
    both reuse the key partitioning: exactly one shuffle Exchange in
    the whole interval build."""
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("k"),
        F.col("id").alias("snap"),
        (F.col("id") % 3).alias("attr"),
    )
    out = scd2_intervals(df, ["k"], "snap", ["attr"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
