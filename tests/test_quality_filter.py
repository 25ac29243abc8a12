"""Composite quality filter: crafted documents hit exactly the rules
they violate, and fail_reasons preserves declaration order."""

from __future__ import annotations

from crypto_data_pipeline_spark.operators import text


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.with_quality_filter(text.with_text_stats(df))
    return {r.doc_id: (r.keep, r.fail_reasons) for r in out.collect()}


def test_rules_fire_individually(spark):
    # varied words so the repetition rule stays quiet on the good doc
    good = (
        "the cat and a dog ran to my park in one morning while two birds "
        "sang of old songs as the sun rose over a quiet hill and children "
        "walked to school past the red barn near this river bend today"
    )
    rows = [
        (1, good),
        (2, "the cat and dog"),  # too_short (has stopwords, fine otherwise)
        (3, ("extraordinarily " * 30 + "the a of to in is and " * 2).strip()),  # long words
        (4, good.replace(" ", "!!! ")),  # punct_heavy
        (5, "zebra quartz jumps over lazy foxes near rivers " * 5),  # no_stopwords + repeats
    ]
    got = _run(spark, rows)
    assert got[1] == (1, "")
    assert got[2][1].startswith("too_short")
    assert "word_len_out" in got[3][1]
    assert "punct_heavy" in got[4][1]
    assert got[5] == (0, "no_stopwords,repetitive")


def test_fail_reasons_in_declaration_order(spark):
    # short AND stopword-free → both rules, declaration order
    got = _run(spark, [(1, "zebra quartz fox")])
    assert got[1] == (0, "too_short,no_stopwords")


def test_quality_filter_runs_stateless_on_a_stream(spark, sf_dir, tmp_path):
    """The whole scalar battery (stats + repetition + filter) is pure
    projection, so the SAME plan runs under readStream with no state
    store or watermark — streaming output equals the batch frame
    row-for-row."""
    from crypto_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    schema = docs.schema
    stream = spark.readStream.schema(schema).parquet(f"{sf_dir}/documents.[p]arquet")

    def battery(df):
        return text.with_quality_filter(text.with_text_stats(df)).select(
            "doc_id", "fail_reasons", "keep"
        )

    out = str(tmp_path / "out")
    q = (
        battery(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    expected = {tuple(r) for r in battery(docs).collect()}
    assert got == expected and got


def test_repetition_stats_total_on_short_docs(spark):
    """Regression: the staged gram column is evaluated for EVERY row,
    so sub-2-word docs (1 word, empty, whitespace) must not hit the
    invalid slice(toks, 0, 2) — they report dup_2gram_ratio 0.0."""
    from crypto_data_pipeline_spark.operators.text import with_repetition_stats

    df = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "   "), (4, "two words two words")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.dup_word_ratio, r.dup_2gram_ratio)
           for r in with_repetition_stats(df).collect()}
    assert got[1] == (0.0, 0.0)
    assert got[2] == (0.0, 0.0)
    assert got[3] == (0.0, 0.0)
    # "two words two words": 4 words 2 distinct -> 0.5; 3 grams 2 distinct
    assert got[4] == (0.5, round(1 - 2 / 3, 6))
