"""ORC source/sink: bit-exact round-trip and — the scale point —
partition-directory pruning plus predicate pushdown visible in the
physical plan, exactly as the parquet path already proves."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.sources import orc_io
from crypto_data_pipeline_spark.sources.tables import load_table


def test_orc_roundtrip_is_bit_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    path = tempfile.mkdtemp(prefix="orc_exact_")
    orc_io.write_orc(ev, path)
    back = orc_io.read_orc(
        spark, path, "event_id long, user_id long, value double, event_type string"
    )
    assert back.count() == ev.count()
    # exceptAll in both directions == multiset equality, doubles included
    assert back.exceptAll(ev).count() == 0
    assert ev.exceptAll(back).count() == 0


def test_orc_partition_pruning_and_pushdown(spark, sf_dir):
    """A filter on the partition key must show up as PartitionFilters
    (whole directories skipped before any IO) and a data-column filter
    as PushedFilters (stripe-level min/max skipping) in the ORC scan."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    path = tempfile.mkdtemp(prefix="orc_prune_")
    orc_io.write_orc(ev, path, partition_by=["event_type"])
    back = orc_io.read_orc(spark, path)
    q = back.where((F.col("event_type") == "click") & (F.col("value") > 50.0)).select(
        "event_id", "value"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "OrcScan" in plan or "orc" in plan.lower()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    pushed = plan.split("PushedFilters", 1)
    assert len(pushed) == 2 and "value" in pushed[1][:200], plan[:2000]
    # and the pruned read returns exactly the filtered rows
    expected = ev.where((F.col("event_type") == "click") & (F.col("value") > 50.0)).count()
    assert q.count() == expected
