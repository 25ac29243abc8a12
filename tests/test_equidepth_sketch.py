"""The sketch-based equi-depth path promised by value_ntile_deciles'
scale note: approx_percentile boundaries + width_bucket assignment
must land within tolerance of the exact global-sort NTILE buckets —
one aggregation pass and a stateless map, no single-partition sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.sources.tables import load_table


def test_sketch_deciles_approximate_exact_ntile(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    n = ev.count()

    cuts = ev.agg(
        F.expr(
            "approx_percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9), 10000)"
        ).alias("c")
    ).first()["c"]
    assert list(cuts) == sorted(cuts)

    # stateless assignment against the broadcast boundary list
    bucket = F.lit(1)
    for i, c in enumerate(cuts, start=1):
        bucket = bucket + (F.col("value") > F.lit(float(c))).cast("int")
    counts = {
        r.b: r.n
        for r in ev.select(bucket.alias("b")).groupBy("b").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == set(range(1, 11))
    # equi-depth within sketch tolerance: every bucket near n/10
    for b, c in counts.items():
        assert abs(c - n / 10) <= 0.2 * n / 10 + 5, f"bucket {b}: {c} vs {n/10}"
