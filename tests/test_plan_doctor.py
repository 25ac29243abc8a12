"""Global plan hygiene: EVERY registered query's physical plan is
screened for the anti-patterns that kill plans at 100 TB, not just the
handful with dedicated shape tests. A new query (or a refactor of a
shared helper) that introduces a cartesian product or a row-at-a-time
Python UDF fails here on the day it lands.

Allowances are explicit and named: broadcast nested-loop joins are
legal only where the query DECLARES a broadcast-small-side design
(1-row bounds frames, contractually-small query batches, the
exactness baselines); Arrow-batched Python is legal only in the
operators built on mapInPandas/applyInPandas.
"""

from __future__ import annotations

import pytest

from crypto_data_pipeline_spark.observability import global_window_nodes
from crypto_data_pipeline_spark.plans.registry import load_with_extras

SPECS = load_with_extras()

# Queries whose plans legitimately contain a ZERO-PARTITION Window —
# the anti-pattern that funnels every input row through ONE task
# (round-9 finding: the DSIR gate query shipped one). Every allowance
# is a query whose CONTRACT is a global rank over a bounded or
# driver-SF frame, each with a scale-safe sibling:
GLOBAL_WINDOW_OK = {
    "value_ntile_deciles",    # global decile assignment IS the contract;
                              # value_percentiles is the sketch twin
    "zipf_rank_frequency",    # global frequency rank over the (pruned)
                              # vocab frame — rank IS the Zipf x-axis
    "vocab_coverage",         # cumulative-coverage curve needs the same
                              # vocab total order (min_count-pruned frame)
    "dsir_resample_exact",    # the DECLARED exact-top-k oracle twin of
                              # the quantile path (operators/dsir.py)
    "dsir_resample_gumbel",   # same duty for the Gumbel draw
}

# Queries whose plans legitimately contain a BroadcastNestedLoopJoin:
# every entry ships a broadcast side that is contractually tiny.
BNLJ_OK = {
    "embedding_topk_bruteforce",   # 10 query vectors broadcast over the corpus
    "embedding_topk_crossjoin",    # exactness baseline, same broadcast side
    "embedding_topk_quantized",    # quantized twin of the same shape
    "embedding_similar_pairs",     # label-blocked pairs, broadcast block stats
    "embedding_ann_ivf",           # nprobe cell ids broadcast to the index scan
    "embedding_ann_ivf_fixed",
    "embedding_ann_lsh",           # query-bucket list broadcast
    "embedding_ann_lsh_multiprobe",  # same broadcast, (1+q)x the keys
    "embedding_bucket_dedup",
    "embedding_quantize_int8",     # 1-row global bounds frame
    "zorder_cluster_keys",         # 1-row quantizer bounds frame
    "skew_key_shares",             # 1-row grand-total frame
    "tfidf_top_terms",             # 1-row corpus doc-count frame
    "boilerplate_ratio",           # 1-row fingerprint-total frame
    "value_histogram",             # 1-row min/max bounds frame
    "quality_unigram_logprob",     # 1-row vocab-total + tercile-bounds frames
    "bm25_retrieval",              # 1-row (N, avgdl) corpus-totals frame
    "mix_temperature_sampling",    # 1-row census-totals frame
    "pack_token_budget",
    "dsir_importance_resample",    # two 1-row corpus-totals frames (T, S)
    "dsir_resample_exact",         # same fit path, same totals frames
    "dsir_resample_gumbel",        # same fit path, same totals frames
    "dsir_resample_gumbel_quantile",  # same fit path, same totals frames
    "dedup_minhash_portable",      # broadcast candidate-id prune
    "dedup_staged_pipeline",       # same portable-minhash candidate prune
    "corpus_curation_pipeline",    # minhash prune + census-totals frames
    "contamination_ngram",
    "contamination_semantic",      # 1-row collect_list benchmark frame
    "chi_square_independence",     # 1-row grand-total frame
    "psi_value_drift",             # 1-row halves-total frame
    "nb_lang_classifier",          # classes-row prior frame (5 rows) + 1-row vocab/total frames
    "vocab_coverage",              # 1-row corpus-token-total frame
    "embedding_pq_topk",           # 10 query distance-tables (m×k doubles each) broadcast
    "embedding_knn_classify",      # 20 query vectors broadcast (brute-force top-k stage)
    "embedding_mmr_topk",          # 10 query vectors broadcast (candidate top-k stage)
    "heavy_hitter_tokens",         # 1-row stream-total frame (threshold test)
    "embedding_rp_topk",           # 10 projected query vectors broadcast
}

# Arrow-batched Python (mapInPandas / applyInPandas / pandas UDF) is a
# declared design choice in these paths only.
ARROW_OK = {
    "multimodal_pipeline", "multimodal_ingest", "multimodal_features",
    "multimodal_frames",
    "sessionize_stateful",         # applyInPandasWithState twin
    "embedding_topk_bruteforce",   # partition-local Arrow top-k
    "embedding_topk_quantized",
    "model_comparison", "model_comparison_sanity",  # Spark ML internals
    "linear_ridge_closed_form",
    "doc_chunks_udtf",             # ArrowEvalPythonUDTF — the §2.10 table-function surface
    "embedding_mmr_topk",          # greedy MMR chain: applyInPandas over pool-sized groups
    "embedding_pq_codes",          # vectorized numpy PQ encode (mapInPandas)
    "embedding_pq_topk",           # same encode feeding the ADC scan
    "embedding_ann_ivfpq",         # same encode over the IVF-assigned corpus
    "embedding_ann_ivf_fixed",     # vectorized numpy cell assignment (mapInPandas)
    "cluster_balanced_sample",     # same fixed-quantizer assignment
    "semantic_dedup",              # same fixed-quantizer assignment
    "heavy_hitter_tokens",         # bounded-memory Misra-Gries prune (mapInPandas)
    "embedding_rp_topk",           # vectorized numpy JL matmul (mapInPandas)
}


@pytest.mark.parametrize("name", list(SPECS), ids=list(SPECS))
def test_plan_is_clean(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()

    assert "CartesianProduct" not in plan, f"{name}: true cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in GLOBAL_WINDOW_OK:
        gw = global_window_nodes(df)
        assert not gw, (
            f"{name}: zero-partition Window {gw} — every input row flows "
            "through ONE task; partition the window, or derive the global "
            "decision as a broadcastable cutoff (operators/dsir.py:"
            "dsir_kth_weight), or declare the global rank in "
            "GLOBAL_WINDOW_OK with why it is the contract"
        )
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: undeclared nested-loop join — if the broadcast side "
            "is contractually tiny, add the query to BNLJ_OK with a comment"
        )
    if name not in ARROW_OK:
        python_nodes = (
            "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
            "AggregateInPandas", "WindowInPandas", "PythonMapInArrow",
            "FlatMapCoGroupsInPandas",
        )
        hit = [n for n in python_nodes if n in plan]
        assert not hit, f"{name}: undeclared Python stage {hit}"


def test_global_window_screen_detects_the_antipattern(spark):
    """The screen itself is live: a deliberately global row_number is
    flagged (with the node named), a properly partitioned window is
    not — so a future refactor cannot blunt the detector and pass the
    suite on a false negative."""
    from pyspark.sql import Window, functions as F

    df = spark.range(100)
    bad = df.withColumn("r", F.row_number().over(Window.orderBy("id")))
    hits = global_window_nodes(bad)
    assert hits and hits[0].startswith("WindowExec"), hits

    good = df.withColumn(
        "r", F.row_number().over(Window.partitionBy(F.col("id") % 7).orderBy("id"))
    )
    assert global_window_nodes(good) == []
