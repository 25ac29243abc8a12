"""N-gram language-model perplexity filter — the CCNet quality pillar.

CCNet (Wenzek et al. 2020) curates Common Crawl with three gates:
language-ID, dedup, and a per-language LM whose perplexity splits each
language's corpus into head/middle/tail buckets (train on the head,
drop or downweight the tail). The reference repo has no curation
surface (crypto analytics); this supplies the third pillar next to the
engine's existing lang-id (`ml/classify.py`) and dedup tiers.

Spark-first design — deliberately NOT a KenLM shell-out: an add-one
bigram model is nothing but counting, so train is ONE grouping-sets
aggregation over the exploded bigram stream and the fitted model is a
pair of broadcastable DataFrames, which keeps the whole path inside
whole-stage codegen and value-checkable against an ANSI-SQL oracle —
the same trade the NB classifier documents. (KenLM's modified
Kneser-Ney would score better absolutely; bucket ASSIGNMENT — the
thing the pipeline consumes — needs only a monotone per-language
ranking, which add-one cross-entropy provides deterministically.)

Model: per language, P(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V_lang),
with V_lang = |distinct continuation tokens| (the add-one denominator;
an unseen context scores 1/V_lang). Doc score = exp(mean negative log
prob over the doc's adjacent-token bigrams), 6-dp rounded with the
repo's tie-up nudge. Docs with fewer than 2 tokens have no bigrams and
land in the sentinel 'unscored' bucket (ppl = -1.0) instead of a NULL
the differential gate cannot sort.

Distributed shape at 100 TB:
- Train: one corpus explode, one grouping-sets shuffle keyed on
  (lang, w1, w2) — map-side partial aggregation collapses each task to
  model-sized rows; grid/context/vocab levels ride the SAME pass
  (grouping sets), not three aggregations. The grid is NOT fixed-size:
  distinct bigrams grow with corpus vocabulary (Heaps' law — a real
  web crawl's unpruned bigram grid is tens of GB), so train exposes a
  ``min_count`` pruning knob, the same move every production n-gram
  model makes (Google's public 1T-token n-gram corpus ships count>=40).
  Pruned bigrams fall through to the add-one smoothing path that
  already handles unseen pairs; context counts and vocabulary sizes
  are derived from the FULL grid before pruning, so the probability
  denominators stay exact.
- Score: one corpus explode, the model joined in; the join STRATEGY is
  AQE's call, not a hint — the |langs|-row vocab frame is explicitly
  broadcast, but grid/ctx carry no hint, so a pruned megabyte-scale
  model broadcasts (measured, localCheckpoint gives AQE real sizes)
  while an over-threshold model falls back to a shuffled join instead
  of OOMing the driver. Then one doc-key aggregation and one
  per-language ntile window over doc-sized rows. The corpus is never
  shuffled except by its own keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from crypto_data_pipeline_spark.operators.text import tokens

_BUCKETS = {1: "head", 2: "middle", 3: "tail"}


def _unscored_docs(
    docs: DataFrame,
    ctx: DataFrame,
    lang: str,
    text: str,
    doc_id: str,
    trained: DataFrame | None = None,
) -> DataFrame:
    """Docs that CANNOT score, as sentinel rows: fewer than 2 tokens
    (``coalesce(size, -1)`` — under ANSI, size(NULL text) is NULL, not
    the -1 legacy mode returns; found in round-7 review), a NULL
    language, or a language absent from the fitted model (broadcast
    anti-join against the |langs|-row frame). Exactly the complement
    of the scorable set, so the union in the callers is disjoint and
    complete.

    ``trained`` (round 13): a |langs|-row frame with a ``lang`` column
    naming the model's languages. The scorers already aggregate ctx
    down to exactly such a frame (vocab / totals); passing it here
    makes this trained-language set the SAME subtree, so the plan pays
    one ctx aggregation (reused exchange) instead of two per serve.
    Default (None) derives it from ctx as before."""
    if trained is not None:
        trained = trained.select(
            F.col("lang").alias("_tl"), F.lit(1).alias("_trained")
        )
    else:
        trained = ctx.select(
            F.col("lang").alias("_tl"), F.lit(1).alias("_trained")
        ).distinct()
    short = F.coalesce(F.size(tokens(text)), F.lit(-1)) < 2
    return (
        docs.join(F.broadcast(trained), F.col(lang) == F.col("_tl"), "left")
        .where(short | F.col("_trained").isNull())
        .select(
            doc_id,
            F.col(lang).alias("lang"),
            F.lit(0).cast("long").alias("n_bigrams"),
            F.lit(-1.0).alias("ppl"),
            F.lit("unscored").alias("bucket"),
        )
    )


def _bigrams(df: DataFrame, text: str) -> DataFrame:
    """Adjacent-token bigram rows (w1, w2) appended to ``df``'s other
    columns via one explode — no self-join, no positional window."""
    return (
        df.withColumn("_t", tokens(text))
        .withColumn(
            "_bg",
            F.expr(
                "zip_with(slice(_t, 1, size(_t) - 1), slice(_t, 2, size(_t) - 1),"
                " (a, b) -> struct(a AS w1, b AS w2))"
            ),
        )
        .withColumn("_p", F.explode("_bg"))
        .select(*df.columns, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )


def bigram_lm_train(
    docs: DataFrame,
    lang: str = "lang",
    text: str = "text",
    materialize: bool = True,
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Fit one add-one bigram LM per language. Returns
    ``grid (lang, w1, w2, c12)`` and ``ctx (lang, w1, c1, vsize)`` —
    both model-sized; ``vsize`` (the language's distinct-continuation
    count) is carried denormalized on every ctx row so scoring needs
    no third join.

    ``min_count`` prunes the model — the knob that keeps the shipped
    frames bounded on corpora whose vocabulary grows with size
    (Heaps' law; an unpruned web-crawl bigram grid is tens of GB).
    Rule: grid keeps rows with ``c12 >= min_count``; ctx keeps rows
    with ``c1 >= min_count`` (since c12 <= c1, a dropped context's
    bigrams were all dropped too); ``vsize`` stays EXACT from the full
    training counts. A pruned (or unseen) bigram then scores
    ``(coalesce(c12,0)+1) / (coalesce(c1,0)+V)`` — the same smoothing
    path either way, so pruning composes with scoring without a
    special case, and the scored probability is a deterministic
    function of (min_count, corpus). ``min_count=1`` (default) is
    exact back-compat: no row is dropped. A language whose EVERY
    context count falls under the threshold leaves the model entirely
    (no surviving ctx row carries its vsize); its documents then take
    the untrained-language path — dropped by the scoring join, filed
    as 'unscored' by ``perplexity_buckets``.

    The corpus-sized bigram stream is shuffled ONCE (the grid count);
    context counts and vocabulary sizes then come from a grouping-sets
    pass over the MODEL-SIZED grid — c(w1) = Σ_w2 c(w1,w2) and
    V = |distinct w2| hold exactly, so the derivation costs grid-sized
    rows, not another (let alone an Expanded 3×) pass over the raw
    stream.

    ``materialize`` (default) eagerly local-checkpoints both model
    frames — fitting is an ACTION, the same train/serve split
    `ml/classify.py:nb_train` documents. Without it, every broadcast
    of grid/ctx in the scoring plan re-derives the corpus-sized
    training scan (measured at the K=1000 probe: the 5 M-doc train
    pass re-ran inside the score job)."""
    bg = _bigrams(docs.select(F.col(lang).alias("lang"), text), text).select(
        "lang", "w1", "w2"
    )
    grid = bg.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    stats = (
        grid.groupingSets([["lang", "w1"], ["lang"]], "lang", "w1")
        .agg(
            F.sum("c12").alias("_c"),
            F.countDistinct("w2").alias("_nd"),
            F.grouping("w1").alias("_g1"),
        )
    )
    vocab = stats.where(F.col("_g1") == 1).select(
        "lang", F.col("_nd").alias("vsize")
    )
    ctx = (
        stats.where(F.col("_g1") == 0)
        .select("lang", "w1", F.col("_c").alias("c1"))
        .join(F.broadcast(vocab), "lang")
    )
    if min_count > 1:
        grid = grid.where(F.col("c12") >= min_count)
        ctx = ctx.where(F.col("c1") >= min_count)
    if materialize:
        grid = grid.localCheckpoint(eager=True)
        ctx = ctx.localCheckpoint(eager=True)
    return grid, ctx


def bigram_lm_perplexity(
    docs: DataFrame,
    grid: DataFrame,
    ctx: DataFrame,
    lang: str = "lang",
    text: str = "text",
    doc_id: str = "doc_id",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Score every document with its language's LM:
    ``(doc_id, lang, n_bigrams, ppl)``. Unseen context -> c1 = 0
    (probability 1/V): vsize comes from a per-LANGUAGE lookup (the
    distinct (lang, vsize) rows of ctx), not from the left-joined ctx
    row — an unseen (lang, w1) misses that join, and riding vsize on
    it alone would NULL the log prob instead of smoothing it (found in
    round-7 review, verified by execution). Docs of a language the
    model never saw drop out here (inner vocab join, mirroring the
    oracle's ``JOIN voc USING (lang)``); ``perplexity_buckets`` files
    them as 'unscored'.

    Join strategy: only the |langs|-row vocab frame carries a
    broadcast hint. grid and ctx are corpus-VOCABULARY-proportional
    (Heaps' law — they grow with the corpus unless pruned), so their
    joins are left to AQE: a pruned model measures small and
    broadcasts; an over-threshold model falls back to a shuffled hash
    join instead of OOMing the driver the way an unconditional
    ``F.broadcast`` hint would (round-8 fix; the same medicine as the
    islands/risk/pg_compat hint removals).

    ``vocab`` (round 13): pass the (lang, vsize) frame when the caller
    also needs the trained-language set — sharing one frame lets the
    plan reuse a single ctx aggregation across both consumers."""
    if vocab is None:
        vocab = ctx.select("lang", "vsize").distinct()
    scored = (
        _bigrams(docs.select(doc_id, F.col(lang).alias("lang"), text), text)
        .join(F.broadcast(vocab), "lang")
        .join(ctx.drop("vsize"), ["lang", "w1"], "left")
        .join(grid, ["lang", "w1", "w2"], "left")
        .withColumn(
            "_logp",
            F.log(
                (F.coalesce("c12", F.lit(0)) + F.lit(1.0))
                / (F.coalesce("c1", F.lit(0)) + F.col("vsize"))
            ),
        )
    )
    return scored.groupBy(doc_id, "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.exp(-F.avg("_logp")) + F.lit(1e-9), 6).alias("ppl"),
    )


KN_DISCOUNT = 0.75  # the standard absolute-discount constant


def bigram_lm_kn_train(
    docs: DataFrame,
    lang: str = "lang",
    text: str = "text",
    materialize: bool = True,
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fit one interpolated Kneser-Ney bigram LM per language — the
    smoothing family CCNet's actual KenLM models use (Kneser & Ney
    1995; Chen & Goodman 1999), next to the add-one model
    (`bigram_lm_train`) whose monotone ranking the bucket queries
    gate. KN's insight: the backoff weight of a continuation should be
    its CONTEXT DIVERSITY (how many distinct left-neighbors it
    follows), not its raw frequency — 'Francisco' is frequent but
    follows only 'San', so it deserves little unseen-context mass.

    Returns three model-sized frames:
      ``grid (lang, w1, w2, c12)``          — bigram counts
      ``ctx  (lang, w1, c1, n1p_w1, n1p_all, vsize)`` — context
          totals + distinct-continuation counts, with the per-language
          totals (distinct bigram count, vocabulary size) denormalized
          on every row so scoring needs no fourth join
      ``cont (lang, w2, n1p_w2)``           — |{w1 : c(w1,w2) > 0}|

    Probability (D = 0.75):
      seen context:  P(w2|w1) = max(c12 - D, 0)/c1
                               + (D * n1p_w1 / c1) * Pcont(w2)
      unseen context: P(w2|w1) = Pcont(w2)
      Pcont(w2) = (n1p_w2 + 1) / (n1p_all + V)  — add-one smoothed so
          a wholly-unseen continuation keeps positive mass (pure KN
          leaves it zero, which a log cannot take; the documented
          deviation, exact on both engines).

    Everything is an integer-count ratio, so the model is
    DuckDB-oracle-checkable like the add-one one. Train cost: ONE
    corpus-sized shuffle (the grid count); ctx/cont/totals all derive
    from the model-sized grid (a grouping-sets pass reusing the
    grid-row count as the distinct-continuation count — grid rows are
    unique per (lang,w1,w2) — plus one grid-sized aggregation for
    cont). ``min_count`` prunes ROWS from all three shipped frames —
    grid rows with ``c12 < min_count``, ctx rows with
    ``c1 < min_count``, cont rows with ``n1p_w2 < min_count`` (cont is
    vocabulary-proportional too: one row per (lang, w2)). Values on
    SURVIVING rows and the per-language totals (n1p_all, vsize) stay
    exact from the full counts; a pruned row falls through scoring's
    existing ``coalesce(…, 0)`` path, so the scored probability is a
    deterministic function of (min_count, corpus) — the same contract
    as `bigram_lm_train`, pinned against a Python reference by
    tests/test_lm.py::test_kn_min_count_pruning_matches_python_reference."""
    bg = _bigrams(docs.select(F.col(lang).alias("lang"), text), text).select(
        "lang", "w1", "w2"
    )
    grid = bg.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    stats = (
        grid.groupingSets([["lang", "w1"], ["lang"]], "lang", "w1")
        .agg(
            F.sum("c12").alias("_c"),
            F.count(F.lit(1)).alias("_rows"),
            F.countDistinct("w2").alias("_nd"),
            F.grouping("w1").alias("_g1"),
        )
    )
    totals = stats.where(F.col("_g1") == 1).select(
        "lang",
        F.col("_rows").alias("n1p_all"),
        F.col("_nd").alias("vsize"),
    )
    ctx = (
        stats.where(F.col("_g1") == 0)
        .select(
            "lang", "w1", F.col("_c").alias("c1"), F.col("_rows").alias("n1p_w1")
        )
        .join(F.broadcast(totals), "lang")
    )
    cont = grid.groupBy("lang", "w2").agg(F.count(F.lit(1)).alias("n1p_w2"))
    if min_count > 1:
        grid = grid.where(F.col("c12") >= min_count)
        ctx = ctx.where(F.col("c1") >= min_count)
        cont = cont.where(F.col("n1p_w2") >= min_count)
    if materialize:
        grid = grid.localCheckpoint(eager=True)
        ctx = ctx.localCheckpoint(eager=True)
        cont = cont.localCheckpoint(eager=True)
    return grid, ctx, cont


def bigram_lm_kn_perplexity(
    docs: DataFrame,
    grid: DataFrame,
    ctx: DataFrame,
    cont: DataFrame,
    lang: str = "lang",
    text: str = "text",
    doc_id: str = "doc_id",
    totals: DataFrame | None = None,
) -> DataFrame:
    """Score every document with its language's KN model:
    ``(doc_id, lang, n_bigrams, ppl)``, same output contract as the
    add-one scorer. Join strategy mirrors it too: only the |langs|-row
    totals frame is hint-broadcast; grid/ctx/cont are
    vocabulary-proportional, so their joins are the planner's call
    (broadcast when measured small — serve from parquet at rest for
    accurate statistics — shuffled past the threshold). ``totals`` —
    same single-ctx-aggregation sharing hook as the add-one scorer's
    ``vocab`` (round 13)."""
    if totals is None:
        totals = ctx.select("lang", "n1p_all", "vsize").distinct()
    d = F.lit(KN_DISCOUNT)
    pcont = (F.coalesce("n1p_w2", F.lit(0)) + F.lit(1.0)) / (
        F.col("n1p_all") + F.col("vsize")
    )
    p_seen = (
        F.greatest(F.coalesce("c12", F.lit(0)) - d, F.lit(0.0)) / F.col("c1")
        + d * F.col("n1p_w1") / F.col("c1") * pcont
    )
    scored = (
        _bigrams(docs.select(doc_id, F.col(lang).alias("lang"), text), text)
        .join(F.broadcast(totals), "lang")
        .join(ctx.select("lang", "w1", "c1", "n1p_w1"), ["lang", "w1"], "left")
        .join(grid, ["lang", "w1", "w2"], "left")
        .join(cont, ["lang", "w2"], "left")
        .withColumn(
            "_logp",
            F.log(F.when(F.col("c1").isNotNull(), p_seen).otherwise(pcont)),
        )
    )
    return scored.groupBy(doc_id, "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.exp(-F.avg("_logp")) + F.lit(1e-9), 6).alias("ppl"),
    )


def kn_perplexity_buckets(
    docs: DataFrame,
    lang: str = "lang",
    text: str = "text",
    doc_id: str = "doc_id",
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """The CCNet split under KN smoothing: same
    head/middle/tail-per-language ntile with the (ppl, doc_id)
    tie-break and the 'unscored' sentinel as `perplexity_buckets` —
    only the probability model differs. The two bucket queries
    disagree exactly where the smoothing families rank differently
    (KN demotes frequent-but-predictable continuations), which is why
    both ship: the add-one form is the gate-checked default, this is
    the KenLM-faithful alternative."""
    grid, ctx, cont = model if model is not None else bigram_lm_kn_train(
        docs, lang=lang, text=text
    )
    # one ctx aggregation shared by the scorer's totals AND the
    # unscored complement's trained set (round 13 — the two distincts
    # were separate subtrees, costing two ctx scans per serve)
    totals = ctx.select("lang", "n1p_all", "vsize").distinct()
    ppl = bigram_lm_kn_perplexity(
        docs, grid, ctx, cont, lang=lang, text=text, doc_id=doc_id, totals=totals
    )
    w = Window.partitionBy("lang").orderBy(F.col("ppl").asc(), F.col(doc_id).asc())
    scored = ppl.withColumn(
        "bucket",
        F.element_at(
            F.create_map(
                *[x for k, v in _BUCKETS.items() for x in (F.lit(k), F.lit(v))]
            ),
            F.ntile(3).over(w),
        ),
    )
    return scored.unionByName(
        _unscored_docs(docs, ctx, lang, text, doc_id, trained=totals)
    )


def save_lm_model(
    path: str,
    grid: DataFrame,
    ctx: DataFrame,
    bounds: DataFrame | None = None,
    cont: DataFrame | None = None,
) -> None:
    """Land the fitted model AT REST — parquet dirs under ``path``
    (``grid/``, ``ctx/``, optional ``bounds/``). Two reasons a 100 TB
    deployment wants this rather than keeping the fit in-session:
    (a) train-once/serve-many across sessions and clusters (the same
    move the IVF index makes with its cell-partitioned dirs); (b) the
    join planner. A localCheckpointed model carries lineage-derived
    size estimates that can be wildly wrong (the round-8 vocab probe
    measured a KB-scale ctx estimated in the TB range), and the
    planner's safe answer to uncertainty is a shuffled join — a
    parquet scan carries ACCURATE statistics, so a pruned
    megabyte-scale model read from rest broadcasts instead
    (tests/test_lm.py::test_model_at_rest_roundtrip_and_broadcast).

    ``cont`` is the Kneser-Ney model's third frame
    (`bigram_lm_kn_train`): pass it and the KN triple lands/serves at
    rest with the same measured-statistics benefit — without it the KN
    serve joins ride checkpoint-lineage estimates, which the round-8
    vocab probe showed planners rightly distrust."""
    grid.write.mode("overwrite").parquet(f"{path}/grid")
    ctx.write.mode("overwrite").parquet(f"{path}/ctx")
    if bounds is not None:
        bounds.write.mode("overwrite").parquet(f"{path}/bounds")
    if cont is not None:
        cont.write.mode("overwrite").parquet(f"{path}/cont")


def load_lm_model(
    spark, path: str, with_bounds: bool = False, with_cont: bool = False
) -> tuple[DataFrame, ...]:
    """Reload a model landed by `save_lm_model`: ``(grid, ctx)``,
    extended by ``cont`` (KN triple order: grid, ctx, cont) and/or a
    trailing ``bounds``. Frames come back as plain parquet scans —
    statistics-accurate, column-prunable, ready to hand to
    `bigram_lm_perplexity` / `bigram_lm_kn_perplexity` /
    `perplexity_buckets_frozen` / `streaming.ingest.stream_lm_score`."""
    out = [spark.read.parquet(f"{path}/grid"), spark.read.parquet(f"{path}/ctx")]
    if with_cont:
        out.append(spark.read.parquet(f"{path}/cont"))
    if with_bounds:
        out.append(spark.read.parquet(f"{path}/bounds"))
    return tuple(out)


def perplexity_buckets(
    docs: DataFrame,
    lang: str = "lang",
    text: str = "text",
    doc_id: str = "doc_id",
    model: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """The CCNet split: train per-language LMs on the corpus, score
    every doc, and ntile each language's ppl ranking into
    head/middle/tail thirds (ties broken by doc_id, so the buckets are
    deterministic on both engines). Docs too short to score bucket as
    'unscored' with the -1.0 sentinel. Returns
    ``(doc_id, lang, n_bigrams, ppl, bucket)``. Pass a pre-fitted
    ``model`` (the ``bigram_lm_train`` pair) to serve from it."""
    grid, ctx = model if model is not None else bigram_lm_train(
        docs, lang=lang, text=text
    )
    # one ctx aggregation shared by the scorer's vocab AND the
    # unscored complement's trained set (round 13 — the two distincts
    # were separate subtrees, costing two ctx scans per serve)
    vocab = ctx.select("lang", "vsize").distinct()
    ppl = bigram_lm_perplexity(
        docs, grid, ctx, lang=lang, text=text, doc_id=doc_id, vocab=vocab
    )
    w = Window.partitionBy("lang").orderBy(F.col("ppl").asc(), F.col(doc_id).asc())
    scored = ppl.withColumn(
        "bucket",
        F.element_at(
            F.create_map(
                *[x for k, v in _BUCKETS.items() for x in (F.lit(k), F.lit(v))]
            ),
            F.ntile(3).over(w),
        ),
    )
    # unscorable docs are identifiable ON THE SCAN plus one broadcast
    # anti-join (short / NULL-text / untrained-language), so no join
    # back against the scored output is needed — a trained-language
    # doc with >= 2 tokens always emits >= 1 bigram and always scores
    return scored.unionByName(
        _unscored_docs(docs, ctx, lang, text, doc_id, trained=vocab)
    )


def _bucket_by_bounds(ppl: DataFrame, bounds: DataFrame) -> DataFrame:
    """Assign head/middle/tail by comparing each scored row against
    the |langs|x2 boundary table ``(lang, _b array<double>)`` — a
    broadcast join + scan-side CASE, no sort anywhere. Shared by the
    zero-global-sort batch variant and the streaming serve (which
    ships the SAME frozen table to every micro-batch)."""
    return (
        ppl.join(F.broadcast(bounds), "lang")
        .withColumn(
            "bucket",
            F.when(F.col("ppl") <= F.col("_b")[0], "head")
            .when(F.col("ppl") <= F.col("_b")[1], "middle")
            .otherwise("tail"),
        )
        .drop("_b")
    )


def _boundaries(
    docs: DataFrame,
    fit,
    score,
    lang: str,
    text: str,
    doc_id: str,
    model: tuple[DataFrame, ...] | None,
    accuracy: int,
) -> DataFrame:
    """Family-generic boundary freeze: fit (or take) a model, score the
    corpus, reduce to per-language tercile boundaries. The smoothing
    family enters only through (fit, score) — the serving contract
    (one approx_percentile pass, |langs|x2 output) is defined ONCE so
    the add-one and KN twins cannot drift."""
    frames = model if model is not None else fit(docs, lang=lang, text=text)
    ppl = score(docs, *frames, lang=lang, text=text, doc_id=doc_id)
    return ppl.groupBy("lang").agg(
        F.percentile_approx("ppl", [1.0 / 3.0, 2.0 / 3.0], accuracy).alias("_b")
    )


def _frozen_buckets(
    docs: DataFrame,
    bounds: DataFrame,
    fit,
    score,
    lang: str,
    text: str,
    doc_id: str,
    model: tuple[DataFrame, ...] | None,
) -> DataFrame:
    """Family-generic frozen-boundary serve. Holds the THREE serving
    subtleties in one place for both smoothing families: (a) the
    'trained' set shrinks to languages both the model AND the bounds
    know (ctx semi-joined to bounds — a trained-but-unbounded
    language's docs file as 'unscored', never vanish; round-8
    self-review), (b) bucket assignment is the broadcast |langs|x2
    boundary comparison, (c) unscorables union in from the scan-side
    complement. The model's ctx frame is positional slot 2 in every
    family (add-one pair, KN triple)."""
    frames = model if model is not None else fit(docs, lang=lang, text=text)
    grid, ctx, *rest = frames
    servable_ctx = ctx.join(
        F.broadcast(bounds.select("lang").distinct()), "lang", "left_semi"
    )
    ppl = score(
        docs, grid, servable_ctx, *rest, lang=lang, text=text, doc_id=doc_id
    )
    scored = _bucket_by_bounds(ppl, bounds).select(
        doc_id, "lang", "n_bigrams", "ppl", "bucket"
    )
    return scored.unionByName(
        _unscored_docs(docs, servable_ctx, lang, text, doc_id)
    )


def perplexity_boundaries(
    docs: DataFrame,
    lang: str = "lang",
    text: str = "text",
    doc_id: str = "doc_id",
    model: tuple[DataFrame, DataFrame] | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """The FROZEN serving artifact: per-language tercile boundaries
    ``(lang, _b array<double>)`` from one approx_percentile pass over
    the scored corpus. A serving tier fits the model once, freezes
    these boundaries alongside it, and then scores unbounded streams
    against both without ever re-sorting anything. Compute them on the
    SAME corpus the model was trained on: every trained language has
    at least one scorable training doc, so the boundary table covers
    every language the model can score (the inner join in
    `_bucket_by_bounds` is then total over scorable docs)."""
    return _boundaries(
        docs, bigram_lm_train, bigram_lm_perplexity,
        lang, text, doc_id, model, accuracy,
    )


def perplexity_buckets_frozen(
    docs: DataFrame,
    bounds: DataFrame,
    lang: str = "lang",
    text: str = "text",
    doc_id: str = "doc_id",
    model: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Score ``docs`` against a pre-fitted model and assign buckets
    from a FROZEN boundary table (`perplexity_boundaries`) — the batch
    twin of the streaming serve, and the form whose output is
    independent of what else is in the batch (no ntile over
    co-arriving docs), which is what makes stream output == batch
    output under any delivery split. Unscorable docs land in the
    'unscored' sentinel exactly like `perplexity_buckets`.

    The serving artifact is (model AND bounds) together: a language
    present in the model but ABSENT from the boundary table cannot be
    bucketed by this filter, so its documents file as 'unscored' too —
    never silently dropped (round-8 self-review finding: the first cut
    inner-joined bounds after the trained-language complement was
    computed from ctx alone, so a trained-but-unbounded language's
    docs vanished from the output). Implemented by shrinking the
    'trained' set to the languages both frames know: ctx semi-joined
    to bounds (`_frozen_buckets`, shared with the KN twin)."""
    return _frozen_buckets(
        docs, bounds, bigram_lm_train, bigram_lm_perplexity,
        lang, text, doc_id, model,
    )


def kn_perplexity_boundaries(
    docs: DataFrame,
    lang: str = "lang",
    text: str = "text",
    doc_id: str = "doc_id",
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """`perplexity_boundaries` for the Kneser-Ney model: the frozen
    per-language tercile boundary table ``(lang, _b array<double>)``
    computed from the KN scorer instead of the add-one one. Same
    serving contract — fit the triple once, freeze these alongside it
    (`save_lm_model(..., cont=, bounds=)`), and score unbounded
    streams against both without re-sorting anything."""
    return _boundaries(
        docs, bigram_lm_kn_train, bigram_lm_kn_perplexity,
        lang, text, doc_id, model, accuracy,
    )


def kn_perplexity_buckets_frozen(
    docs: DataFrame,
    bounds: DataFrame,
    lang: str = "lang",
    text: str = "text",
    doc_id: str = "doc_id",
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """`perplexity_buckets_frozen` for the Kneser-Ney triple: score
    against a pre-fitted (grid, ctx, cont) model, assign buckets from
    a FROZEN `kn_perplexity_boundaries` table, file unscorable docs —
    including a trained-but-unbounded language's (the serving artifact
    is model AND bounds together) — as 'unscored'. Output independent
    of batch composition, so the streaming serve equals this batch
    twin under any delivery split (`_frozen_buckets`, shared with the
    add-one twin)."""
    return _frozen_buckets(
        docs, bounds, bigram_lm_kn_train, bigram_lm_kn_perplexity,
        lang, text, doc_id, model,
    )


def rho_excess_scores(
    docs: DataFrame,
    base_model: tuple[DataFrame, DataFrame],
    ref_model: tuple[DataFrame, DataFrame, DataFrame],
    lang: str = "lang",
    text: str = "text",
    doc_id: str = "doc_id",
) -> DataFrame:
    """(doc_id, ppl_base, ppl_ref, excess): the RHO learnability score
    — excess = round(ln(ppl_base) − ln(ppl_ref), 6), the per-token
    log-loss delta between the weak add-one base LM and the strong
    Kneser-Ney reference. One definition feeds BOTH the batch
    selection query and the frozen serve twin, so the score cannot
    drift between them. Only docs scorable by both models appear (the
    two scorers share the ≥2-token / known-language domain when fitted
    on the same corpus); callers file the rest under the LM tier's
    sentinels."""
    base = bigram_lm_perplexity(
        docs, *base_model, lang=lang, text=text, doc_id=doc_id
    )
    ref = bigram_lm_kn_perplexity(
        docs, *ref_model, lang=lang, text=text, doc_id=doc_id
    )
    return (
        base.select(doc_id, F.col("ppl").alias("ppl_base"))
        .join(ref.select(doc_id, F.col("ppl").alias("ppl_ref")), doc_id)
        .withColumn("excess", F.round(F.log("ppl_base") - F.log("ppl_ref"), 6))
    )


def rho_excess_select_frozen(
    docs: DataFrame,
    base_model: tuple[DataFrame, DataFrame],
    ref_model: tuple[DataFrame, DataFrame, DataFrame],
    cutoff: DataFrame,
    lang: str = "lang",
    text: str = "text",
    doc_id: str = "doc_id",
) -> DataFrame:
    """(doc_id, lang, ppl_base, ppl_ref, excess, kept): RHO-loss
    learnability selection against FROZEN artifacts — the serve-online
    half of the excess-perplexity train/serve split, the same pattern
    as `perplexity_buckets_frozen` (frozen model + frozen boundary)
    and `dsir_score_frozen` (frozen model + frozen cutoff).

    excess = round(ln(ppl_base) − ln(ppl_ref), 6) — the per-token
    log-loss delta between the weak base LM (add-one pair) and the
    strong reference LM (Kneser-Ney triple); kept = excess >= cutoff,
    a pure per-document predicate given the frozen (base_model,
    ref_model, cutoff), so a document's row is identical whether it
    arrives alone, in any micro-batch, or in the full batch — the
    property the streaming twin's stream==batch test pins. Ties at the
    cutoff are all kept (the dsir_score_frozen trade). Docs scorable
    by neither LM (<2 tokens, NULL text, or a language the models
    never saw) carry the LM tier's sentinels: ppl −1.0, excess 0.0,
    kept false. The cutoff travels as an explicitly-broadcast 1-row
    frame (a scalar by contract — derive it with
    `dsir_kth_weight(scored, frac, weight_col="excess")` over the
    reference corpus's excess frame, never a global rank)."""
    scored = rho_excess_scores(
        docs, base_model, ref_model, lang=lang, text=text, doc_id=doc_id
    )
    return (
        docs.select(doc_id, F.col(lang).alias("lang"))
        .join(scored, doc_id, "left")
        .crossJoin(F.broadcast(cutoff))
        .select(
            doc_id,
            "lang",
            F.coalesce("ppl_base", F.lit(-1.0)).alias("ppl_base"),
            F.coalesce("ppl_ref", F.lit(-1.0)).alias("ppl_ref"),
            F.coalesce("excess", F.lit(0.0)).alias("excess"),
            F.coalesce(
                (F.col("excess") >= F.col("cutoff")), F.lit(False)
            ).alias("kept"),
        )
    )


def perplexity_buckets_approx(
    docs: DataFrame,
    lang: str = "lang",
    text: str = "text",
    doc_id: str = "doc_id",
    model: tuple[DataFrame, DataFrame] | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """The ZERO-GLOBAL-SORT form of `perplexity_buckets` for corpora
    where even a per-language doc-sized sort is unwelcome: tercile
    BOUNDARIES come from one `approx_percentile` aggregation (a
    mergeable per-partition sketch — no ordering shuffle at all), and
    bucket assignment is a scan-side comparison against the broadcast
    |langs|x2 boundary table. Same output schema. Trade-off: boundary
    docs may land one bucket off the exact tercile split (bounded by
    the sketch's 1/accuracy rank error), and the sketch is
    Spark-internal, so this variant has no cross-engine oracle — the
    exact ntile form stays the gate-checked default and the agreement
    between the two is pinned by test instead
    (tests/test_lm.py::test_approx_buckets_agree_with_exact)."""
    grid, ctx = model if model is not None else bigram_lm_train(
        docs, lang=lang, text=text
    )
    ppl = bigram_lm_perplexity(docs, grid, ctx, lang=lang, text=text, doc_id=doc_id)
    bounds = ppl.groupBy("lang").agg(
        F.percentile_approx("ppl", [1.0 / 3.0, 2.0 / 3.0], accuracy).alias("_b")
    )
    scored = _bucket_by_bounds(ppl, bounds)
    return scored.select(doc_id, "lang", "n_bigrams", "ppl", "bucket").unionByName(
        _unscored_docs(docs, ctx, lang, text, doc_id)
    )
