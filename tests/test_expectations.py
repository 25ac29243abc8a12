"""Expectations engine: every rule kind must count its violations
exactly (not merely pass/fail), nulls must follow the documented
semantics (range/set/regex rules skip nulls; not_null catches them),
and enforce() must raise with the failing rules named."""

from __future__ import annotations

import pytest

from crypto_data_pipeline_spark.operators import expectations as ex


ROWS = [
    # id, price, status, code, fk
    (1, 10.0, "ok", "A-1", 100),
    (2, -5.0, "ok", "B-2", 100),     # price out of range
    (3, None, "bad?", "C3", 200),    # status not in set, code regex miss
    (3, 20.0, None, "D-4", 999),     # dup id, null status, fk miss
    (None, 5.0, "ok", "E-5", None),  # null id; null fk is NOT a violation
]


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        ROWS, "id long, price double, status string, code string, fk long"
    )


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame([(100,), (200,)], "k long")


def test_each_rule_counts_violations_exactly(spark, frame, dim):
    report = ex.check(
        frame,
        [
            ex.not_null("id"),
            ex.in_range("price", 0.0, 100.0),
            ex.in_set("status", ("ok",)),
            ex.matches("code", r"^[A-Z]-\d$"),
            ex.unique("id"),
            ex.foreign_key("fk", dim, "k"),
        ],
    )
    got = {r.expectation: (r.n_checked, r.n_violations, r.passed) for r in report.collect()}
    assert got["not_null(id)"] == (5, 1, False)
    assert got["in_range(price,0.0,100.0)"] == (5, 1, False)   # null price skipped
    assert got["in_set(status)"] == (5, 1, False)              # null status skipped
    assert got["matches(code)"] == (5, 1, False)
    assert got["unique(id)"] == (5, 1, False)                  # one duplicated id
    # fk: 4 non-null values checked, one (999) missing from the dim
    assert got["foreign_key(fk)"] == (4, 1, False)


def test_clean_table_passes_everything(spark, dim):
    clean = spark.createDataFrame(
        [(1, 1.0, "ok", "A-1", 100), (2, 2.0, "ok", "B-2", 200)],
        "id long, price double, status string, code string, fk long",
    )
    report = ex.check(
        clean,
        [ex.not_null("id"), ex.in_range("price", 0.0, 10.0), ex.unique("id"),
         ex.foreign_key("fk", dim, "k")],
    )
    assert all(r.passed for r in report.collect())


def test_enforce_raises_naming_failed_rules(spark, frame, dim):
    with pytest.raises(ValueError, match=r"not_null\(id\)=1"):
        ex.enforce(frame, [ex.not_null("id"), ex.in_range("price", 0.0, 100.0)])
    # and does NOT raise on a satisfied contract
    ex.enforce(frame, [ex.in_range("price", -100.0, 100.0)])


def test_single_scan_for_row_level_battery(spark, frame):
    """The whole row-level battery (incl. unique) must plan as ONE
    aggregation over one scan — no per-rule scans."""
    report = ex.check(
        frame,
        [ex.not_null("id"), ex.in_range("price", 0.0, 100.0), ex.unique("id")],
    )
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 2


def test_split_by_expectations_routes_violating_rows(spark, frame):
    clean, bad = ex.split_by_expectations(
        frame,
        [ex.not_null("id"), ex.in_range("price", 0.0, 100.0), ex.in_set("status", ("ok",))],
    )
    # violating: id null (row 5), price -5 (row 2), status 'bad?' (row 3);
    # row 4's null status is NOT a violation of in_set (null-skipping)
    bad_ids = sorted((r.id if r.id is not None else -1) for r in bad.collect())
    assert bad_ids == [-1, 2, 3]
    assert clean.count() == 2
    with pytest.raises(ValueError, match="row-level"):
        ex.split_by_expectations(frame, [ex.unique("id")])


def test_unique_ignores_null_keys(spark):
    """Standard-SQL UNIQUE: multiple NULL keys are not duplicates of
    each other; only non-null repeats violate."""
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (None,), (None,), (None,)], "id long"
    )
    [r] = ex.check(df, [ex.unique("id")]).collect()
    assert (r.n_violations, r.passed) == (1, False)
    clean = spark.createDataFrame([(1,), (None,), (None,)], "id long")
    [r2] = ex.check(clean, [ex.unique("id")]).collect()
    assert (r2.n_violations, r2.passed) == (0, True)
