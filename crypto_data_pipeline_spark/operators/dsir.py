"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS) re-expressed Spark-first.

The selection move every LLM corpus build needs once a high-quality
target exists (a reference corpus, a curated domain): estimate
importance weights p_target(x)/p_source(x) in a HASHED n-gram feature
space — cheap enough to score petabytes — then resample the raw corpus
toward the target distribution.

Scale shape, by construction:
- The feature space is ``n_buckets`` hashed unigram+bigram buckets —
  the model is bounded by CONFIG like the BPE merge table, NOT by
  vocabulary (the round-8 lesson: Heaps-law structures need pruning
  knobs; a hash-bucketed model needs none).
- Fitting is one groupBy per corpus over (bucket) — n_buckets cells of
  partial aggregation, map-side combinable, never a pairwise anything.
- Scoring is one join of per-doc features against the n_buckets-row
  log-ratio model — broadcastable at any corpus size because the model
  size is a parameter — then a doc-keyed sum.
- Selection ranks the (id, weight) frame only — scalar columns, never
  the document payloads; at extreme scale the same decision runs as a
  quantile cutoff on the weight column instead of a total order.

Portability: buckets come from the same polynomial character hash
(h·131 + codepoint) mod 2^31-1 the portable MinHash tier proves
engine-identical (operators/dedup.py:277), so the ENTIRE pipeline —
features, fit, weights, selection — hash-checks against a DuckDB twin.
Weights are order-insensitive to 1e-13 (sums of ≤ hundreds of O(1) log
ratios), rounded 6 dp on both engines (the quality_unigram_logprob
device).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from crypto_data_pipeline_spark.operators.dedup import PORTABLE_MOD, _poly_fold
from crypto_data_pipeline_spark.operators.text import tokens


def _gram_hash(g: Column) -> Column:
    """Portable polynomial hash of one n-gram string."""
    return _poly_fold(F.transform(F.split(g, ""), F.ascii))


def dsir_features(
    df: DataFrame, id_col: str = "doc_id", text: str = "text", n_buckets: int = 4096
) -> DataFrame:
    """(id, bucket, cnt): hashed word-unigram + word-bigram counts.
    Two staging projections (tokens, then grams) so neither array
    re-evaluates inside a downstream lambda; the explode carries only
    (id, bucket) — grams never shuffle as strings."""
    staged = df.select(F.col(id_col).alias("id"), tokens(text).alias("_tk"))
    bigrams = F.when(
        F.size("_tk") >= 2,
        F.expr("transform(sequence(1, size(_tk) - 1), i -> concat(element_at(_tk, i), ' ', element_at(_tk, i + 1)))"),
    ).otherwise(F.array().cast("array<string>"))
    grams = staged.select("id", F.explode(F.concat(F.col("_tk"), bigrams)).alias("_g"))
    return (
        grams.select("id", (_gram_hash(F.col("_g")) % n_buckets).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_bucket_logratio(
    target_feats: DataFrame, source_feats: DataFrame, n_buckets: int = 4096
) -> DataFrame:
    """(bucket, log_ratio): add-one-smoothed log(p_target/p_source) per
    hash bucket, for ALL n_buckets buckets — the model's domain is the
    full hash range, not just the buckets the fit corpora happened to
    occupy, so a SERVE-time document (streaming, a later corpus) whose
    n-grams hash to unseen buckets scores the pure smoothing ratio
    log((S+B)/(T+B)) instead of silently losing those features to an
    unmatched join. Exactly n_buckets rows by construction — the
    bounded-by-CONFIG property is structural, not data-dependent. Both
    marginals are n_buckets-bounded aggregates; the totals ride 1-row
    frames through cross joins (no collect — the plan stays one lazy
    unit and the model frame can be persisted or landed at rest by the
    caller)."""
    spark = source_feats.sparkSession
    t = target_feats.groupBy("bucket").agg(F.sum("cnt").alias("c_t"))
    s = source_feats.groupBy("bucket").agg(F.sum("cnt").alias("c_s"))
    t_tot = t.agg(F.coalesce(F.sum("c_t"), F.lit(0)).alias("T"))
    s_tot = s.agg(F.coalesce(F.sum("c_s"), F.lit(0)).alias("S"))
    joined = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(t, "bucket", "left")
        .join(s, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("c_t", F.lit(0)).alias("c_t"),
            F.coalesce("c_s", F.lit(0)).alias("c_s"),
        )
        .crossJoin(t_tot)
        .crossJoin(s_tot)
    )
    lr = (
        F.log((F.col("c_t") + 1).cast("double") / (F.col("T") + n_buckets))
        - F.log((F.col("c_s") + 1).cast("double") / (F.col("S") + n_buckets))
    )
    return joined.select("bucket", lr.alias("log_ratio"))


def dsir_importance_weights(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n_buckets: int = 4096,
    feats: DataFrame | None = None,
) -> DataFrame:
    """(id_col, n_features, weight): per-doc log importance weight =
    Σ cnt·log_ratio over the doc's hashed n-grams, rounded 6 dp.
    The model join broadcasts by size (n_buckets rows — parameter-
    bounded, never hinted); docs with no features (empty text) come
    back with weight 0 and n_features 0 via the left join, not
    silently dropped. Pass precomputed ``feats`` (dsir_features output,
    typically the same frame the fit consumed — persist it) to avoid
    re-tokenizing the corpus."""
    if feats is None:
        feats = dsir_features(docs, id_col=id_col, text=text, n_buckets=n_buckets)
    scored = (
        feats.join(model, "bucket")
        .groupBy("id")
        .agg(
            F.sum("cnt").alias("n_features"),
            F.round(F.sum(F.col("cnt") * F.col("log_ratio")), 6).alias("weight"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(scored.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_features", F.lit(0).cast("long")).alias("n_features"),
            F.coalesce("weight", F.lit(0.0)).alias("weight"),
        )
    )


def dsir_resample(
    weighted: DataFrame, keep_fraction: float = 0.25, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic selection: rank by weight desc (doc id tiebreak),
    keep the top ``keep_fraction`` of the corpus. The paper resamples
    with Gumbel noise to preserve diversity; the deterministic top-k
    variant is the hash-checkable twin (and the one a reproducible
    pipeline run actually wants — seeded Gumbel keys would bolt on via
    one extra xxhash64 column without changing the plan shape).
    Single global rank over (weight, id) — a scalar sort of doc ids
    and weights, never of document payloads; at corpus scale the same
    selection runs as a quantile cutoff (percentile_approx on weight)
    instead of a total order. The corpus count rides the same global
    window (no driver-side action; the plan stays one lazy unit)."""
    w = Window.orderBy(F.col("weight").desc(), F.col(id_col))
    n = F.count(F.lit(1)).over(Window.partitionBy())
    return (
        weighted.withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn("kept", (F.col("rank") <= F.ceil(n * keep_fraction)).cast("boolean"))
    )


def dsir_resample_gumbel(
    weighted: DataFrame,
    keep_fraction: float = 0.25,
    id_col: str = "doc_id",
    salt: int = 17,
) -> DataFrame:
    """Gumbel-top-k importance resampling — the PAPER's selection
    semantics (sampling WITHOUT replacement proportional to exp(weight)
    is exactly top-k on weight + Gumbel(0,1) noise; Xie et al. §3),
    made reproducible: the per-doc uniform comes from the portable
    sampling hash (operators/sampling.py:hash_bucket — exact int64
    arithmetic both engines share), so a given (corpus, salt) always
    selects the same set and a NEW salt draws an independent sample.
    u = (bucket + 0.5)/MOD keeps the uniform strictly inside (0, 1) —
    -ln(-ln(u)) is finite for every doc. ``key`` is rounded 6 dp like
    the weight (single ln calls on identical doubles; cross-engine ulp
    noise cannot move the 6th decimal except on measure-zero
    boundaries). dsir_resample is the argmax twin (no noise): use it
    for the single best subset, this for diversity-preserving draws
    (epoch-reshufflable by salt, the training_order device)."""
    from crypto_data_pipeline_spark.operators.sampling import MOD, hash_bucket

    u = (hash_bucket(F.col(id_col), salt=salt) + 0.5) / F.lit(float(MOD))
    key = F.round(F.col("weight") - F.log(-F.log(u)), 6)
    w = Window.orderBy(F.col("key").desc(), F.col(id_col))
    n = F.count(F.lit(1)).over(Window.partitionBy())
    return (
        weighted.withColumn("key", key)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn("kept", (F.col("rank") <= F.ceil(n * keep_fraction)).cast("boolean"))
    )


def dsir_weight_cutoff(
    weighted: DataFrame, keep_fraction: float = 0.25, id_col: str = "doc_id"
) -> DataFrame:
    """1-row (cutoff double) frame: the k-th highest weight (k =
    ceil(n·keep_fraction)) over a reference corpus — the FROZEN
    selection boundary for online serving, the DSIR analog of the LM's
    frozen perplexity boundaries. A frozen threshold makes a streamed
    document's keep decision independent of whatever shares its
    micro-batch; the trade vs the batch top-k is documented on
    dsir_score_frozen (ties at the cutoff are all kept)."""
    ranked = dsir_resample(weighted, keep_fraction, id_col=id_col)
    return ranked.where(F.col("kept")).agg(F.min("weight").alias("cutoff"))


def dsir_score_frozen(
    docs: DataFrame,
    model: DataFrame,
    cutoff: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """(id_col, n_features, weight, kept): scoring against a FROZEN
    model + cutoff — the serve-online half of the DSIR train/serve
    split. kept = weight >= cutoff, a pure per-document predicate, so
    the output row for a doc is identical whether it arrives alone, in
    any micro-batch, or in the full batch — the property the streaming
    twin's stream==batch test pins. Differs from dsir_resample's exact
    top-k in one documented way: docs TIED at the cutoff weight are
    all kept (a threshold cannot split a tie; the batch top-k breaks
    ties by doc id). The cutoff travels as a 1-row frame (explicitly
    broadcast — it is a scalar by contract, not by estimation)."""
    weighted = dsir_importance_weights(
        docs, model, id_col=id_col, text=text, n_buckets=n_buckets
    )
    return weighted.crossJoin(F.broadcast(cutoff)).select(
        id_col,
        "n_features",
        "weight",
        (F.col("weight") >= F.col("cutoff")).cast("boolean").alias("kept"),
    )
