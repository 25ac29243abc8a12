"""Mergeable-sketch rollups: the 100 TB distinct-count pattern is
'sketch once per partition-grain, merge upward, never rescan raw'.
Spark's Datasketches HLL functions (hll_sketch_agg / hll_union_agg /
hll_sketch_estimate) make the daily→monthly rollup a pure merge; these
tests pin that the merge path agrees with sketching the raw data
directly, and that both track the exact answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.sources.tables import load_table


def test_hll_daily_sketches_merge_to_monthly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("month", "ts").alias("month"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    daily = ev.groupBy("month", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    direct = ev.groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_est"),
        F.count_distinct("user_id").alias("exact"),
    )
    rows = merged.join(direct, "month").collect()
    assert rows
    for r in rows:
        # merging the daily register sets must agree with sketching the
        # month's raw rows (register max-merge loses nothing)...
        assert abs(r.merged_est - r.direct_est) <= 0.02 * max(r.direct_est, 1)
        # ...and both must track the exact distinct count
        assert abs(r.merged_est - r.exact) <= 0.05 * max(r.exact, 1)


def test_hll_rollup_never_rescans_raw(spark, sf_dir):
    """The monthly merge over PRE-AGGREGATED daily sketches must plan
    as sketch-merge aggregation over the daily frame — at 100 TB the
    daily sketches are a materialized table and the monthly rollup
    reads kilobytes. Pinned by the merge plan containing a partial
    union aggregate, not a raw-column sketch build."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("month", "ts").alias("month"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    daily = ev.groupBy("month", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    daily.cache()
    try:
        daily.count()
        merged = daily.groupBy("month").agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        )
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "hll_union_agg" in plan
        assert "InMemoryTableScan" in plan  # reads the daily sketches, not raw
    finally:
        daily.unpersist()


def test_approx_top_k_recovers_exact_heavy_hitters(spark, sf_dir):
    """approx_top_k is the sketch path of key_skew_stats: with the
    tracked-item capacity above the true cardinality the counts are
    exact, so the sketch's top keys must equal the exact groupBy's."""
    ev = load_table(spark, sf_dir, "events")
    sk = spark.sql(
        "SELECT approx_top_k(user_id, 5, 100000) AS tk FROM {ev}", ev=ev
    ).first()["tk"]
    got = {(r["item"], r["count"]) for r in sk}
    exact = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "user_id")
    ).collect()
    floor = min(c for _, c in got)
    want = {(r["user_id"], r["n"]) for r in exact if r["n"] >= floor}
    # every sketched (item, count) pair must be a true exact pair
    assert got <= want
    assert len(got) == 5
