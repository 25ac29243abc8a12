"""Stream-stream interval join: the watermarked streaming join over
the real events table must emit exactly the batch twin's pairs (all
data arrives in one micro-batch, so no pair is watermark-dropped)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.sources.tables import load_events_stream, load_table
from crypto_data_pipeline_spark.streaming.joins import click_purchase_pairs


def _collect_pairs(df) -> set[tuple]:
    return {
        (r.event_id, r.user_id, r.purchase_us, r.click_us, r.click_value)
        for r in df.collect()
    }


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


def test_stream_join_plan_is_stateful_symmetric_hash(spark, sf_dir):
    """The streaming plan must be the watermark-evicting symmetric hash
    join (StreamingSymmetricHashJoin), not a nested loop — state stays
    O(lookback), the 100 TB/day requirement."""
    stream = load_events_stream(spark, sf_dir)
    plan = click_purchase_pairs(stream)._jdf.queryExecution().analyzed().toString()
    assert "watermark" in plan.lower()
