"""At-rest index staleness guard (round 14, VERDICT r12 next #6
carry-over): every index/store sidecar records the corpus fingerprint
it was built from, loads re-check it, and the session caches treat a
changed corpus as a miss instead of serving stale results."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from crypto_data_pipeline_spark.observability import source_fingerprint
from crypto_data_pipeline_spark.operators import similarity


def _write_corpus(spark, path: str, n: int = 24, dim: int = 8, shift: float = 0.0):
    rows = [
        (i, [float((i * 7 + j * 3) % 5) + shift + 0.1 for j in range(dim)])
        for i in range(n)
    ]
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def test_source_fingerprint_tracks_file_changes(spark, tmp_path):
    p = str(tmp_path / "corpus")
    _write_corpus(spark, p)
    fp1 = source_fingerprint(spark.read.parquet(p))
    assert fp1 is not None and fp1["n_files"] >= 1 and fp1["sha256"]
    # identical re-read -> identical fingerprint
    assert source_fingerprint(spark.read.parquet(p)) == fp1
    time.sleep(0.05)  # ensure mtime_ns moves even on coarse filesystems
    _write_corpus(spark, p, shift=1.0)
    fp2 = source_fingerprint(spark.read.parquet(p))
    assert fp2 != fp1
    # non-file-backed frames have no at-rest identity
    assert source_fingerprint(spark.range(3)) is None


def test_ivf_read_raises_on_stale_fingerprint(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    _write_corpus(spark, corpus)
    embs = spark.read.parquet(corpus)
    fp = source_fingerprint(embs)
    index = similarity.build_fixed_ivf_index(embs, list(range(16)))
    at_rest = str(tmp_path / "ivf")
    similarity.write_ivf_index(
        index, at_rest, check_config=False, source_fingerprint=fp
    )
    index.assigned.unpersist()
    # matching fingerprint loads; missing expectation loads (opt-in check)
    assert similarity.read_ivf_index(spark, at_rest, expect_fingerprint=fp)
    assert similarity.read_ivf_index(spark, at_rest)
    time.sleep(0.05)
    _write_corpus(spark, corpus, shift=2.0)
    fp_new = source_fingerprint(spark.read.parquet(corpus))
    with pytest.raises(ValueError, match="STALE"):
        similarity.read_ivf_index(spark, at_rest, expect_fingerprint=fp_new)


def test_lsh_read_raises_on_stale_fingerprint(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    _write_corpus(spark, corpus)
    embs = spark.read.parquet(corpus)
    fp = source_fingerprint(embs)
    index = similarity.build_lsh_keys(embs)
    at_rest = str(tmp_path / "lsh")
    similarity.write_lsh_index(
        index, at_rest, check_config=False, source_fingerprint=fp
    )
    assert similarity.read_lsh_index(spark, at_rest, expect_fingerprint=fp)
    time.sleep(0.05)
    _write_corpus(spark, corpus, shift=2.0)
    fp_new = source_fingerprint(spark.read.parquet(corpus))
    with pytest.raises(ValueError, match="STALE"):
        similarity.read_lsh_index(spark, at_rest, expect_fingerprint=fp_new)


def test_cache_get_fresh_invalidates_on_corpus_change(spark, tmp_path):
    """The session-cache half: a cached entry whose recorded source
    fingerprint no longer matches the live corpus reads as a MISS."""
    from crypto_data_pipeline_spark.plans.extension_queries import (
        _cache_get_fresh,
        _record_cache_source,
    )

    corpus = str(tmp_path / "corpus")
    _write_corpus(spark, corpus)
    df = spark.read.parquet(corpus)
    cache: dict = {}
    key = ("app", corpus)
    cache[key] = "the-index"
    _record_cache_source(cache, key, df)
    assert _cache_get_fresh(cache, key, spark.read.parquet(corpus)) == "the-index"
    time.sleep(0.05)
    _write_corpus(spark, corpus, shift=3.0)
    assert _cache_get_fresh(cache, key, spark.read.parquet(corpus)) is None
    # entries built from non-file-backed sources skip the check
    gen_key = ("app", "generated")
    cache[gen_key] = "gen-index"
    _record_cache_source(cache, gen_key, spark.range(5))
    assert _cache_get_fresh(cache, gen_key, spark.range(5)) == "gen-index"
