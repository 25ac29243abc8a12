"""Small-file compaction: file-count math, value preservation, and
range-clustering for footer pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.sources.compaction import (
    compact_parquet,
    parquet_dir_stats,
)
from crypto_data_pipeline_spark.sources.tables import load_table


def test_compaction_reduces_file_count_and_preserves_rows(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    ev = load_table(spark, sf_dir, "events")
    # simulate incremental ingest: 64 tiny files
    ev.repartition(64).write.parquet(src)
    n_in, total = parquet_dir_stats(spark, src)
    assert n_in == 64

    # target = roughly half the input -> expect exactly 2 output files
    got = compact_parquet(spark, src, out, target_file_bytes=(total + 1) // 2)
    n_out, _ = parquet_dir_stats(spark, out)
    assert n_out == 2
    assert got.count() == ev.count()
    # value-preserving: per-type counts and value sums survive the rewrite
    def sig(df):
        return sorted(
            map(
                tuple,
                df.groupBy("event_type")
                .agg(F.count(F.lit(1)), F.round(F.sum("value"), 6))
                .collect(),
            )
        )

    assert sig(got) == sig(ev)


def test_compaction_range_clustering_enables_file_pruning(spark, sf_dir, tmp_path):
    """sort_by range-partitions the output so each file covers a
    disjoint key range — the min/max footer stats then let a key-range
    scan skip files entirely. Assert disjointness via per-file min/max."""
    src = str(tmp_path / "frag")
    out = str(tmp_path / "sorted")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ev.repartition(16).write.parquet(src)
    _, total = parquet_dir_stats(spark, src)

    compact_parquet(
        spark, src, out, target_file_bytes=(total + 3) // 4, sort_by=["user_id"]
    )
    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("user_id").alias("lo"), F.max("user_id").alias("hi"))
        .collect()
    )
    assert len(per_file) >= 2
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next, spans
