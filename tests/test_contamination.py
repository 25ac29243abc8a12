"""Benchmark-contamination screening: hit detection and the filter
twin agree, clean docs survive, and the report is consistent."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.operators import contamination
from crypto_data_pipeline_spark.sources.tables import load_table


def _split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where((F.col("doc_id") % 97) == 0)
    corpus = docs.where((F.col("doc_id") % 97) != 0)
    return docs, bench, corpus


def test_hits_are_consistent_and_bounded(spark, sf_dir):
    _, bench, corpus = _split(spark, sf_dir)
    hits = contamination.contamination_hits(corpus, bench).collect()
    assert len(hits) > 0  # synthetic docs share template phrases
    for r in hits:
        assert 1 <= r.n_hits <= r.n_grams
        assert abs(r.contamination_ratio - round(r.n_hits / r.n_grams, 6)) < 1e-9


def test_decontaminate_removes_exactly_the_hit_docs(spark, sf_dir):
    _, bench, corpus = _split(spark, sf_dir)
    dirty = {
        r.doc_id for r in contamination.contamination_hits(corpus, bench).collect()
    }
    clean = {r.doc_id for r in contamination.decontaminate(corpus, bench).collect()}
    all_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert clean == all_ids - dirty
    assert clean  # not everything is contaminated


def test_streaming_decontamination_matches_batch(spark, sf_dir, tmp_path):
    """The per-row streaming decontamination twin keeps exactly the
    batch operator's survivors on a batch frame, and the SAME plan
    under readStream (stateless Arrow filter) emits the same rows."""
    _, bench, corpus = _split(spark, sf_dir)
    batch_clean = {r.doc_id for r in contamination.decontaminate(corpus, bench).collect()}
    row_clean = {
        r.doc_id for r in contamination.decontaminate_stream(corpus, bench).collect()
    }
    assert row_clean == batch_clean

    src = str(tmp_path / "src")
    corpus.write.parquet(src)
    stream = spark.readStream.schema(corpus.schema).parquet(src)
    out = str(tmp_path / "out")
    q = (
        contamination.decontaminate_stream(stream, bench)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert streamed == batch_clean


def test_self_contamination_is_total(spark, sf_dir):
    docs, _, _ = _split(spark, sf_dir)
    sample = docs.limit(20)
    hits = contamination.contamination_hits(sample, sample)
    # every doc collides with itself on every n-gram → ratio 1.0
    full = hits.where(F.col("contamination_ratio") == 1.0).count()
    assert full == sample.count()


def test_semantic_contamination_empty_benchmark_is_total(spark):
    """An empty benchmark set yields ZERO rows (the oracle's CROSS
    JOIN semantics) — never corpus rows with tri-state NULL flags."""
    from crypto_data_pipeline_spark.operators.contamination import semantic_contamination

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, vec array<double>"
    )
    bench = spark.createDataFrame([], "vec_id long, vec array<double>")
    out = semantic_contamination(corpus, bench, id_col="vec_id", vec_col="vec")
    assert out.count() == 0
