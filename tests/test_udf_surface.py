"""§2.10 surface parity: each Arrow-vectorized UDF form (scalar /
grouped-agg) must compute exactly what its preferred SQL rewrite
computes — on real table data, nulls and ties included."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.functions.udfs import format_market_cap_udf, weighted_mean
from crypto_data_pipeline_spark.operators.islands import format_market_cap
from crypto_data_pipeline_spark.sources.tables import load_table


def test_scalar_udf_matches_sql_formatter(spark, sf_dir):
    """The market-cap formatter over the real props-derived caps (both
    T and B branches hit by the x5e10 scaling) plus explicit edge
    values: exact string equality with the SQL CASE."""
    ev = load_table(spark, sf_dir, "events")
    caps = ev.select(
        (F.get_json_object("props", "$.k").cast("double") * F.lit(5e10)).alias("cap")
    )
    edge = spark.createDataFrame(
        [(None,), (0.0,), (999_994_999_999.0,), (1e12,), (1.2345e12,)], "cap double"
    )
    both = caps.unionByName(edge).select(
        format_market_cap("cap").alias("sql_fmt"),
        format_market_cap_udf()("cap").alias("udf_fmt"),
    )
    diff = both.where(
        ~F.col("sql_fmt").eqNullSafe(F.col("udf_fmt"))
    ).limit(5).collect()
    assert diff == [], f"formatter divergence: {diff}"


def test_grouped_agg_udf_matches_sql_rewrite(spark, sf_dir):
    """weighted_mean(value, weight) per event_type == sum(v*w)/sum(w),
    with nulls in v dropping from both sides."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").alias("v"),
        (F.col("event_id") % 10 + 1).cast("double").alias("w"),
    )
    got = ev.groupBy("event_type").agg(weighted_mean()("v", "w").alias("wm"))
    want = ev.groupBy("event_type").agg(
        (
            F.sum(F.when(F.col("v").isNotNull(), F.col("v") * F.col("w")))
            / F.sum(F.when(F.col("v").isNotNull(), F.col("w")))
        ).alias("wm")
    )
    g = {r.event_type: r.wm for r in got.collect()}
    e = {r.event_type: r.wm for r in want.collect()}
    assert set(g) == set(e)
    for k in e:
        if e[k] is None:
            assert g[k] is None
        else:
            assert abs(g[k] - e[k]) < 1e-9 * max(1.0, abs(e[k])), (k, g[k], e[k])


def test_grouped_agg_udf_all_null_group_is_null(spark):
    df = spark.createDataFrame(
        [("a", None, 1.0), ("a", None, 2.0), ("b", 4.0, 2.0)],
        "g string, v double, w double",
    )
    out = {r.g: r.wm for r in df.groupBy("g").agg(weighted_mean()("v", "w").alias("wm")).collect()}
    assert out["a"] is None and abs(out["b"] - 4.0) < 1e-12
