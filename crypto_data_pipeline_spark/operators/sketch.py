"""Count-min sketch over the corpus token stream.

Cormode & Muthukrishnan 2005 ("An improved data stream summary: the
count-min sketch and its applications"): a depth x width grid of
counters; each item increments one counter per row under an
independent hash; a point query reads the MINIMUM of its d counters —
always an overestimate, with error eps*N at depth ln(1/delta).

Distributed shape: the sketch build is ONE aggregation over the token
stream keyed on (row, bucket) — at most depth*width distinct keys, so
map-side partial aggregation collapses each task's contribution to a
few hundred rows and the shuffle carries kilobytes regardless of
corpus size. The fitted sketch is a broadcastable mini-table; probes
join against it broadcast-side. This is the sketch a 100 TB pipeline
uses for approximate term frequencies where the exact vocabulary
aggregation (vocab_coverage) is too hot to maintain online.

Hashes are the repo's portable polynomial family (dedup.py): the
char-fold term hash feeds (a_j*h + b_j) mod P mod width rows, exact
integer arithmetic both engines execute bit-identically — so the
whole lossy sketch, estimates included, hash-checks against a DuckDB
oracle instead of settling for a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from crypto_data_pipeline_spark.operators.dedup import (
    PORTABLE_MOD,
    _poly_fold,
    portable_minhash_params,
)
from crypto_data_pipeline_spark.operators.text import tokens


def term_hash(col: Column) -> Column:
    """Polynomial char hash (h*131 + codepoint) mod 2^31-1 — the same
    family the portable minhash twin proves engine-portable."""
    return _poly_fold(F.transform(F.split(col, ""), F.ascii))


def _bucket_array(h: Column, params: list[tuple[int, int]], width: int) -> Column:
    return F.array(
        *[((h * F.lit(a) + F.lit(b)) % PORTABLE_MOD % width) for a, b in params]
    )


def cms_build(
    docs: DataFrame,
    depth: int = 3,
    width: int = 64,
    seed: int = 11,
    text: str = "text",
) -> DataFrame:
    """(j, bucket, c): the sketch grid as a depth*width-row frame."""
    params = portable_minhash_params(depth, seed)
    stream = docs.select(F.explode(tokens(text)).alias("t")).where(F.col("t") != "")
    hashed = stream.select(term_hash(F.col("t")).alias("h"))
    return (
        hashed.select(F.posexplode(_bucket_array(F.col("h"), params, width)).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cms_point_estimates(
    spark: SparkSession,
    docs: DataFrame,
    probe_terms: list[str],
    depth: int = 3,
    width: int = 64,
    seed: int = 11,
    text: str = "text",
) -> DataFrame:
    """Point-query the sketch for `probe_terms` and report the estimate
    next to the exact count: (term, exact_freq, cms_estimate,
    overcount). overcount >= 0 always — the CM guarantee."""
    params = portable_minhash_params(depth, seed)
    cells = cms_build(docs, depth, width, seed, text)

    probes = spark.createDataFrame([(t,) for t in probe_terms], "term string")
    pb = probes.select(
        "term",
        F.posexplode(_bucket_array(term_hash(F.col("term")), params, width)).alias(
            "j", "bucket"
        ),
    )
    est = (
        pb.join(F.broadcast(cells), ["j", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0).cast("long"))).alias("cms_estimate"))
    )
    exact = (
        docs.select(F.explode(tokens(text)).alias("t"))
        .where(F.col("t").isin(*probe_terms))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_freq"))
        .withColumnRenamed("t", "term")
    )
    zero = F.lit(0).cast("long")
    return (
        est.join(F.broadcast(exact), "term", "left")
        .select(
            "term",
            F.coalesce("exact_freq", zero).alias("exact_freq"),
            "cms_estimate",
            (F.col("cms_estimate") - F.coalesce("exact_freq", zero)).alias("overcount"),
        )
    )
