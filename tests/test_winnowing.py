"""Winnowing sketches: the MOSS substring guarantee holds, pair
detection finds partial copies Jaccard misses, and containment dedup
drops the contained copy only."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.operators import dedup


BODY = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "magpies argue about the precise ownership of a shiny button "
    "found beneath the old oak tree last tuesday morning"
)


def test_shared_substring_yields_shared_fingerprint(spark):
    # doc 2 embeds a long substring of doc 1 inside unrelated text →
    # the winnowing guarantee (shared substring >= k+w-1 chars) forces
    # at least one common fingerprint
    docs = spark.createDataFrame(
        [
            (1, BODY),
            (2, "completely different preamble " + BODY[20:90] + " and a different ending"),
            (3, "zebra quartz unrelated content with nothing in common at all here"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b): r.shared for r in dedup.winnowing_pairs(docs, min_shared=1).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert not any(3 in p for p in pairs)


def test_winnowing_guarantee_property(spark):
    """Property (Schleimer et al. theorem): ANY two docs sharing a
    substring of length ≥ k + window - 1 = 11 normalized chars share
    at least one winnowing fingerprint. Exercised over a batch of
    seeded random word soups with planted common substrings."""
    import random

    rng = random.Random(42)
    words = ["alpha", "bravo", "cedar", "delta", "ember", "frost", "gamma", "haze"]

    def soup(n):
        return " ".join(rng.choice(words) for _ in range(n))

    rows = []
    for i in range(20):
        shared = soup(6)  # ≥ 11 chars once normalized
        rows.append((2 * i, soup(15) + " " + shared + " " + soup(15)))
        rows.append((2 * i + 1, soup(12) + " " + shared + " " + soup(12)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.winnowing_pairs(docs, min_shared=1, max_bucket=1000).collect()
    }
    for i in range(20):
        assert (2 * i, 2 * i + 1) in pairs, f"planted pair {i} missed"


def test_containment_dedup_drops_the_contained_copy(spark):
    docs = spark.createDataFrame(
        [
            (1, BODY + " plus a long unique continuation that the fragment does not have"),
            (2, BODY),  # contained in 1
            (3, "an entirely distinct document about submarine telegraphy and cable ships"),
        ],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in dedup.containment_dedup(docs, threshold=0.6).collect()}
    assert kept == {1, 3}
