"""Global plan hygiene: EVERY registered query's physical plan is
screened for the anti-patterns that kill plans at 100 TB, not just the
handful with dedicated shape tests. A new query (or a refactor of a
shared helper) that introduces a cartesian product or a row-at-a-time
Python UDF fails here on the day it lands.

Allowances are explicit and named, and live in
crypto_data_pipeline_spark/plan_contracts.py (round 11) so that
tools/plan_audit.py reports the SAME verdicts the suite enforces:
broadcast nested-loop joins are legal only where the query DECLARES a
broadcast-small-side design (1-row bounds frames, contractually-small
query batches, the exactness baselines); Arrow-batched Python is legal
only in the operators built on mapInPandas/applyInPandas; driver
collects only in functions whose row count is config-bounded.
"""

from __future__ import annotations

import pytest

from crypto_data_pipeline_spark.observability import global_window_nodes
from crypto_data_pipeline_spark.plan_contracts import (
    ARROW_OK,
    BNLJ_OK,
    DECLARED_DRIVER_SCALARS,
    GLOBAL_WINDOW_OK,
    MARGINAL_CONTRACT_OK,
)
from crypto_data_pipeline_spark.plans.registry import load_with_extras

SPECS = load_with_extras()

# driver-registry plans are screened in the default tier; extra-query
# plans keep the same screens in the slow tier (round 14)
@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, id=n, marks=[pytest.mark.slow] if SPECS[n].extra else [])
        for n in SPECS
    ],
)
def test_plan_is_clean(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()

    assert "CartesianProduct" not in plan, f"{name}: true cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in GLOBAL_WINDOW_OK:
        gw = global_window_nodes(df)
        assert not gw, (
            f"{name}: zero-partition Window {gw} — every input row flows "
            "through ONE task; partition the window, or derive the global "
            "decision as a broadcastable cutoff (operators/dsir.py:"
            "dsir_kth_weight), or declare the global rank in "
            "GLOBAL_WINDOW_OK with why it is the contract"
        )
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: undeclared nested-loop join — if the broadcast side "
            "is contractually tiny, add the query to BNLJ_OK with a comment"
        )
    if name not in ARROW_OK:
        python_nodes = (
            "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
            "AggregateInPandas", "WindowInPandas", "PythonMapInArrow",
            "FlatMapCoGroupsInPandas",
        )
        hit = [n for n in python_nodes if n in plan]
        assert not hit, f"{name}: undeclared Python stage {hit}"


def test_driver_collect_surface_is_declared():
    """Every collect/toPandas site in the package flows through a
    function on DECLARED_DRIVER_SCALARS. A new operator that collects
    corpus-proportional rows fails here by name until its author
    states the bound — or removes the collect."""
    import os

    from crypto_data_pipeline_spark import observability

    pkg = os.path.dirname(observability.__file__)
    sites = observability.driver_collect_sites(pkg)
    assert sites, "sweep found no sites — the detector itself broke"
    undeclared = sorted(
        f"{key} ({kind} at {rel}:{ln})"
        for rel, ln, key, kind in sites
        if key not in DECLARED_DRIVER_SCALARS
    )
    assert not undeclared, (
        "undeclared driver collect sites — state the row-count bound in "
        f"DECLARED_DRIVER_SCALARS or remove the collect: {undeclared}"
    )
    # and the list carries no dead entries that would mask a future move
    live = {key for _rel, _ln, key, _kind in sites}
    stale = sorted(set(DECLARED_DRIVER_SCALARS) - live)
    assert not stale, f"DECLARED_DRIVER_SCALARS entries with no live site: {stale}"


def test_driver_collect_screen_detects_the_antipattern(tmp_path):
    """The sweep itself is live: a deliberately unbounded df.collect()
    in a fresh source tree is found and attributed to its enclosing
    function; an allowlisted name passes — so the screen cannot be
    blunted into a false negative by a refactor of the walker."""
    from crypto_data_pipeline_spark.observability import driver_collect_sites

    (tmp_path / "bad.py").write_text(
        "from pyspark.sql import functions as F\n"
        "def leaky_query(spark, sf_dir):\n"
        "    df = spark.read.parquet(sf_dir)\n"
        "    return [r for r in df.collect()]\n"  # corpus-proportional!
        "\n"
        "def sneaky_query(spark, sf_dir):\n"
        "    return spark.read.parquet(sf_dir).take(10**9)\n"  # fetch dodge
        "\n"
        "def clean_query(spark, sf_dir):\n"
        "    n = spark.read.parquet(sf_dir).count()\n"
        "    return F.first('x'), n\n"  # F.first is the AGGREGATE, not a fetch
    )
    sites = driver_collect_sites(str(tmp_path))
    assert [(s[2], s[3]) for s in sites] == [
        ("bad.py:leaky_query", "collect"),
        ("bad.py:sneaky_query", "take"),
    ]


def test_affine_hash_sites_are_marginal_and_declared():
    """The marginal-vs-joint hash rule as a screen, not a docstring
    (round 12; the class shipped four real bugs in three rounds —
    MinHash mask, HLL, Gumbel, A-ES). Every affine hash_bucket /
    sql_hash_bucket site must (a) carry NO co-occurring ordering /
    extreme-value construct — those must avalanche, no declaration
    accepted — and (b) be declared in MARGINAL_CONTRACT_OK with its
    per-key-marginal justification."""
    import os

    from crypto_data_pipeline_spark import observability

    pkg = os.path.dirname(observability.__file__)
    sites = observability.joint_hash_sites(pkg)
    assert sites, "sweep found no affine-hash sites — the detector broke"

    joint = sorted(
        f"{key} uses {list(constructs)} at {rel}:{ln}"
        for rel, ln, key, constructs in sites
        if constructs
    )
    assert not joint, (
        "extreme-value/ordering construct over the AFFINE lattice hash — "
        "this is the HLL/Gumbel/A-ES bug class; switch to avalanche_bucket "
        f"(and its SQL twin, in lockstep): {joint}"
    )
    undeclared = sorted(
        f"{key} ({rel}:{ln})"
        for rel, ln, key, _c in sites
        if key not in MARGINAL_CONTRACT_OK
    )
    assert not undeclared, (
        "affine hash sites without a marginal-contract declaration — state "
        "the per-key-marginal justification in MARGINAL_CONTRACT_OK, or use "
        f"avalanche_bucket: {undeclared}"
    )
    live = {key for _rel, _ln, key, _c in sites}
    stale = sorted(set(MARGINAL_CONTRACT_OK) - live)
    assert not stale, f"MARGINAL_CONTRACT_OK entries with no live site: {stale}"


def test_joint_hash_screen_detects_the_antipattern(tmp_path):
    """The screen itself is live: a planted affine-argmax function and
    a planted affine-ordering oracle f-string are both flagged with
    their constructs named; a pure threshold marginal is a site with
    no constructs — so a refactor of the walker cannot blunt the
    screen into a false negative."""
    from crypto_data_pipeline_spark.observability import joint_hash_sites

    (tmp_path / "planted.py").write_text(
        "from pyspark.sql import Window, functions as F\n"
        "from crypto_data_pipeline_spark.operators.sampling import (\n"
        "    hash_bucket, sql_hash_bucket)\n"
        "\n"
        "def affine_argmax(df):\n"  # the r11 Gumbel shape: rank over affine
        "    w = Window.partitionBy('g').orderBy(hash_bucket(F.col('id')))\n"
        "    return df.withColumn('rn', F.row_number().over(w))\n"
        "\n"
        "def affine_sql_order():\n"  # the pre-r12 _order_ctes shape
        "    return f'''SELECT id, row_number() OVER (ORDER BY\n"
        "      {sql_hash_bucket('id', salt=1)}) AS pos FROM t'''\n"
        "\n"
        "def clean_threshold(df):\n"
        "    return df.where(hash_bucket(F.col('id')) < 1000)\n"
    )
    by_key = {key: constructs for _r, _l, key, constructs in
              joint_hash_sites(str(tmp_path))}
    assert set(by_key) == {
        "planted.py:affine_argmax",
        "planted.py:affine_sql_order",
        "planted.py:clean_threshold",
    }, by_key
    assert "orderBy" in by_key["planted.py:affine_argmax"]
    assert "row_number" in by_key["planted.py:affine_argmax"]
    assert by_key["planted.py:affine_sql_order"] == ("sql-ordering-string",)
    assert by_key["planted.py:clean_threshold"] == ()


def test_global_window_screen_detects_the_antipattern(spark):
    """The screen itself is live: a deliberately global row_number is
    flagged (with the node named), a properly partitioned window is
    not — so a future refactor cannot blunt the detector and pass the
    suite on a false negative."""
    from pyspark.sql import Window, functions as F

    df = spark.range(100)
    bad = df.withColumn("r", F.row_number().over(Window.orderBy("id")))
    hits = global_window_nodes(bad)
    assert hits and hits[0].startswith("WindowExec"), hits

    good = df.withColumn(
        "r", F.row_number().over(Window.partitionBy(F.col("id") % 7).orderBy("id"))
    )
    assert global_window_nodes(good) == []
