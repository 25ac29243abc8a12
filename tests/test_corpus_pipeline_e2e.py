"""End-to-end training-corpus pipeline: the operator surfaces compose
(column contracts line up) and every stage strictly narrows or
restructures the corpus the way a real 100 TB preprocessing DAG would:

    quality filter → benchmark decontamination → cross-source exact
    dedup → near-dup clustering survivors → train/val/test split →
    token-budget packing
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.operators import contamination, dedup, sampling, text
from crypto_data_pipeline_spark.operators.graph import connected_components
from crypto_data_pipeline_spark.sources.tables import load_table


def test_full_corpus_pipeline_composes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality filter
    scored = text.with_quality_filter(text.with_text_stats(docs))
    kept = scored.where(F.col("keep") == 1).select("doc_id", "text", "lang", "source")
    n1 = kept.count()
    assert 0 < n1 < n0

    # 2. decontaminate against a held-out benchmark slice
    bench = docs.where((F.col("doc_id") % 97) == 0)
    clean = contamination.decontaminate(
        kept.where((F.col("doc_id") % 97) != 0), bench
    )
    n2 = clean.count()
    assert 0 < n2 <= n1

    # 3. exact dedup with source-priority survivorship
    uniq = dedup.exact_dedup_prioritized(
        clean,
        order_by=[F.expr("CAST(substring(source, 4) AS INT)"), F.col("doc_id")],
    )
    n3 = uniq.count()
    assert 0 < n3 <= n2

    # 4. near-dup clustering: keep one representative per cluster
    pairs = dedup.minhash_dedup_pairs(uniq, threshold=0.5)
    comps = connected_components(pairs, src="id_a", dst="id_b")
    drop = comps.where(F.col("v") != F.col("component")).select(
        F.col("v").alias("doc_id")
    )
    reps = uniq.join(drop, "doc_id", "left_anti")
    n4 = reps.count()
    assert 0 < n4 <= n3

    # 5. leakage-free split
    split = reps.withColumn(
        "split",
        sampling.split_column(
            F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}, salt=11
        ),
    )
    by_split = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(by_split) <= {"train", "val", "test"} and by_split.get("train", 0) > 0

    # 6. pack the training split into token-budget batches per source
    train = split.where(F.col("split") == "train").withColumn(
        "toks", F.size(text.tokens("text")).cast("long")
    )
    packed = sampling.pack_sequences(
        train, order_key="doc_id", token_col="toks", budget=2048, stratum="source"
    )
    stats = packed.groupBy("source", "pack_id").agg(F.sum("toks").alias("pack_tokens"))
    # a pack overflows by at most its final document
    max_doc = train.agg(F.max("toks")).first()[0]
    assert stats.where(F.col("pack_tokens") > 2048 + max_doc).count() == 0
    assert packed.count() == train.count()
