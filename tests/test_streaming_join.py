"""Stream-stream interval join: the watermarked streaming join over
the real events table must emit exactly the batch twin's pairs (all
data arrives in one micro-batch, so no pair is watermark-dropped)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.sources.tables import load_events_stream, load_table
from crypto_data_pipeline_spark.streaming.joins import click_purchase_pairs
import pytest


def _collect_pairs(df) -> set[tuple]:
    return {
        (r.event_id, r.user_id, r.purchase_us, r.click_us, r.click_value)
        for r in df.collect()
    }


@pytest.mark.slow
def test_stream_join_matches_batch_twin(spark, sf_dir, tmp_path):
    stream = load_events_stream(spark, sf_dir)
    out = str(tmp_path / "out")
    q = (
        click_purchase_pairs(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = _collect_pairs(spark.read.parquet(out))
    expected = _collect_pairs(click_purchase_pairs(load_table(spark, sf_dir, "events")))
    assert got == expected
    assert expected  # the synthetic stream has qualifying pairs


@pytest.mark.slow
def test_stream_left_outer_join_releases_unmatched(spark, sf_dir, tmp_path):
    """Left-outer stream-stream join: click-less purchases are emitted
    with null click columns once the watermark proves no match can
    arrive. A far-future 'clock' purchase in a second micro-batch
    drives the watermark past every batch-0 purchase, so the streaming
    result (minus the clock's own still-held row) equals the batch
    twin exactly."""
    import glob
    import os
    import shutil

    events = load_table(spark, sf_dir, "events")
    stage0 = str(tmp_path / "stage0")
    events.coalesce(1).write.parquet(stage0)
    max_ts = events.agg(F.max("ts")).first()[0]
    src = str(tmp_path / "src")
    os.makedirs(src)
    f0 = shutil.copy(glob.glob(stage0 + "/part-*.parquet")[0], src + "/batch0.parquet")
    now = os.path.getmtime(f0)
    # two clock batches: watermark updates at end-of-batch and state
    # evicts in the NEXT batch, so clock1 advances the watermark past
    # every real purchase and clock2 triggers the eviction pass that
    # emits their outer rows
    for i, days in enumerate((10, 20), start=1):
        # the global watermark is the MIN across both branch watermarks,
        # so each clock batch must tick BOTH event types — a purchase
        # alone would leave the click branch's watermark at batch 0
        clock = spark.createDataFrame(
            [(-2 * i, max_ts, -1, "purchase", 0.0, "{}"),
             (-2 * i - 1, max_ts, -1, "click", 0.0, "{}")],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {days} DAYS"))
        stage = str(tmp_path / f"stage{i}")
        clock.select(*events.columns).coalesce(1).write.parquet(stage)
        fi = shutil.copy(glob.glob(stage + "/part-*.parquet")[0], src + f"/batch{i}.parquet")
        os.utime(fi, (now + 60 * i, now + 60 * i))  # strictly later per batch

    schema = spark.read.parquet(stage0).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "out")
    q = (
        click_purchase_pairs(stream, how="left_outer")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = _collect_pairs(spark.read.parquet(out).where(F.col("user_id") != -1))
    expected = _collect_pairs(click_purchase_pairs(events, how="left_outer"))
    assert got == expected
    assert any(r[3] is None for r in expected)  # outer rows exist


@pytest.mark.slow
def test_stream_join_plan_is_stateful_symmetric_hash(spark, sf_dir, tmp_path):
    """The EXECUTED streaming plan must be the watermark-evicting
    symmetric hash join (StreamingSymmetricHashJoinExec), not a
    nested-loop/unbounded-state join — state stays O(lookback), the
    100 TB/day requirement. Asserting the physical operator (not just
    'watermark' in the analyzed plan) catches a regression that drops
    the equi-key predicate: that still watermarks but degrades to
    unbounded state."""
    stream = load_events_stream(spark, sf_dir)
    q = (
        click_purchase_pairs(stream)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
        # explainInternal returns the executed plan of the last batch
        physical = q._jsq.explainInternal(False)
    finally:
        q.stop()
    assert "StreamingSymmetricHashJoin" in physical, physical
    assert "BroadcastNestedLoopJoin" not in physical, physical
