"""Runtime plan metrics: the executed-plan reader must report real
shuffle volume, count only executed (non-reused) Exchanges, and
return zeros for a shuffle-free plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.observability import plan_runtime_metrics
from crypto_data_pipeline_spark.sources.tables import load_table


def test_shuffle_bytes_reported_for_groupby(spark):
    df = (
        spark.range(100000)
        .withColumn("k", F.col("id") % 100)
        .groupBy("k")
        .count()
    )
    df.collect()
    m = plan_runtime_metrics(df)
    assert m["n_exchanges"] == 1
    assert m["shuffle_bytes_written"] > 0
    assert m["shuffle_records_written"] >= 100  # partial aggregates per task
    assert m["scan_output_rows"] == 0  # Range source, not a file scan


def test_shuffle_free_scan_reports_zero(spark, sf_dir):
    df = load_table(spark, sf_dir, "events").select("event_id", "value").where(
        F.col("value") > 0
    )
    df.collect()
    m = plan_runtime_metrics(df)
    assert m["n_exchanges"] == 0
    assert m["shuffle_bytes_written"] == 0
    assert m["scan_output_rows"] > 0  # parquet scan leaves report rows


def test_reused_exchange_counted_once(spark):
    """Self-join on an aggregated frame: AQE reuses the exchange; the
    reader must not double-count its bytes or its Exchange node."""
    agg = (
        spark.range(50000)
        .withColumn("k", F.col("id") % 50)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    joined = agg.alias("a").join(agg.alias("b"), "k")
    joined.collect()
    m = plan_runtime_metrics(joined)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert m["shuffle_records_written"] > 0
    if "ReusedExchange" in plan:
        # both join sides fed by ONE physical shuffle: the reuse node
        # must not inflate the executed-Exchange count
        assert m["n_exchanges"] == 1
    else:
        assert m["n_exchanges"] >= 1
