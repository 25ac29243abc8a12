"""Composed corpus_curation_pipeline at corpus scale (VERDICT r10
next #6): the stages were individually probed (MinHash at 20M docs,
DSIR at 100M rows, LM serve at K=1000), but the COMPOSITION — the
thing a real corpus build runs — had never been measured above sf0.1
(5k docs). This probe runs the pipeline's OWN code path
(plans.extension_queries.curation_stages / curation_decision_record —
extracted in round 11 precisely so the probe cannot drift from the
registered query) over the planted-structure synthetic corpus of
tools/dedup_scale_probe.py (near-dup twins, a hot template family,
unique tails) extended with a hash-assigned 5-language column.

Measured per N, stage by stage:

- COLD stage materializations: quality battery (q), exact-dedup
  survivor set (exk), near-dup dominated set (LSH banding + verify) —
  each timed at first action, with its executed-plan shuffle bytes;
- decision-record assembly over the warm stages: the steady-state
  regime bench.py times, plus its shuffle bytes;
- survivor counts at every stage (q_keep / ex_keep / nd_keep /
  final) — the data-dependent numbers that make the walls comparable
  across N.

Super-linear growth 2M -> 20M in any stage is the failure signal; the
design predicts ~linear (one scan + one md5 groupBy + banded LSH with
hot-bucket cap + census broadcast + shard-partitioned ranks).

Usage:  python tools/curation_scale_probe.py [N ...]  (default 200000)
Prints one JSON line per N.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crypto_data_pipeline_spark import get_spark
from crypto_data_pipeline_spark.observability import plan_runtime_metrics
from crypto_data_pipeline_spark.plans.extension_queries import (
    curation_decision_record,
    curation_stages,
)
from tools.dedup_scale_probe import synth_docs


def synth_corpus(spark, n: int):
    """dedup_scale_probe's planted-structure docs, adapted so the
    quality battery has a realistic pass rate instead of rejecting the
    corpus wholesale: digits transliterate to letters (alpha_ratio and
    mean_word_len rules) and a fixed 6-stopword preamble satisfies the
    stopword-ratio rule — both transforms are per-token-deterministic,
    so every planted equality (near-dup twins, hot template family)
    survives verbatim. Adds: an exact-duplicate family (ids >= n are
    copies of ids ≡ 2 mod 200, 0.5% of the corpus) so the exact-dedup
    stage has real drops to make, and a hash-assigned 5-language split
    so the temperature mix sees a real census."""
    raw = synth_docs(spark, n)
    dups = raw.where("doc_id % 200 = 2").select(
        (F.col("doc_id") + n).alias("doc_id"), "text"
    )
    langs = F.array(*[F.lit(x) for x in ("en", "es", "de", "fr", "pt")])
    passing = F.concat(
        F.lit("the of and to in on "),
        F.translate("text", "0123456789", "abcdefghij"),
    )
    # a JUNK family (ids ≡ 5 mod 300, ~0.33%) that fails the battery
    # (too_short + punct_heavy) so the quality stage has real drops
    junk = F.lit("xx !!! ??? !!! ??? xx")
    return (
        raw.unionByName(dups)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 300 == 5, junk).otherwise(passing).alias("text"),
            langs[F.pmod(F.xxhash64("doc_id"), F.lit(5)).cast("int")].alias("lang"),
        )
    )


def _timed_count(df) -> tuple[float, int, int]:
    # execute the frame's OWN QueryExecution (df.count() plans a
    # separate aggregated one with zeroed metrics) — materializes the
    # persist AND fills the metrics this probe reports
    t0 = time.perf_counter()
    n = df._jdf.queryExecution().toRdd().count()
    wall = time.perf_counter() - t0
    try:
        # include_cached: the stage frames are persisted, so their
        # build shuffles live inside the cached relation's plan
        shuffle = plan_runtime_metrics(df, include_cached=True)["shuffle_bytes_written"]
    except Exception:
        shuffle = -1
    return round(wall, 2), int(n), shuffle


def probe_n(spark, n: int) -> dict:
    # bound cached-block size: spark.range's 32 partitions put 625k
    # rows (~300 MB deserialized) in ONE block at 20M docs, and
    # re-inflating blocks that size GC-thrashed a 16g heap to OOM
    # (first 20M attempt, round 11). ~100k rows/partition keeps every
    # cached block tens of MB. Run 20M with SPARK_GRAFT_DRIVER_MEM=64g
    # — the pipeline holds ~3 text copies (docs, q, exk) at once,
    # which is cluster-normal but single-JVM-heavy.
    docs = synth_corpus(spark, n).repartition(max(32, n // 100_000)).persist()
    docs.count()  # materialize; generation is not what we time

    q, ex, exk, dominated, sigs = curation_stages(docs)
    t_q, n_q, sb_q = _timed_count(q)
    n_qk = q.where(F.col("q_keep") == 1).count()
    t_ex, n_exk, sb_ex = _timed_count(exk)

    # Near-dup stage ATTRIBUTION (round 12; VERDICT r11 next #6): the
    # LSH stage dominated the composed pipeline (3,118 s of the 20M
    # run in round 11) but nothing said where it went. The pipeline
    # now persists the signature stage itself (curation_stages —
    # measured 318.5s for the old recompute-per-branch DAG vs
    # 65.3 + 4.9 + 11.9 = 82.1s split at 2M docs), so the probe times
    # the operator's own three factored stages: signature compute
    # (sigs — per-doc shingle + 16 affine mins, no shuffle), the band
    # shuffle + pair explosion over the CACHED signatures, and
    # exact-Jaccard verification (dominated's residual wall over the
    # cached signatures, minus the candidate stage).
    from crypto_data_pipeline_spark.operators.dedup import (
        portable_lsh_candidate_pairs,
    )

    t_sig, n_sig, _sb = _timed_count(sigs)
    cand = portable_lsh_candidate_pairs(sigs)
    t_cand, n_cand, sb_cand = _timed_count(cand)
    t_nd, n_dom, sb_nd = _timed_count(dominated)
    nd_breakdown = {
        "signatures_sec": t_sig,
        "band_shuffle_pairs_sec": t_cand,
        "verify_sec": round(max(0.0, t_nd - t_cand), 2),
        "candidate_pairs": n_cand,
        "band_shuffle_bytes": sb_cand,
    }
    t_nd = round(t_sig + t_nd, 2)  # stage total = sig + band+verify
    # sigs' only consumer (dominated) is now materialized — release
    # it before timing the record assembly, exactly as the registered
    # query does (corpus_curation_pipeline): at 20M the ~12 GB cached
    # signature frame otherwise evicts the stage caches the assembly
    # scans (measured 110s resident vs the released figure recorded
    # in docs/SCALE_PROBE.md round 12)
    sigs.unpersist()

    record = curation_decision_record((q, ex, exk, dominated, sigs))
    # steady-state assembly over warm stages — execute the record's
    # own QueryExecution without collecting rows (bench-identical)
    t0 = time.perf_counter()
    record._jdf.queryExecution().toRdd().count()
    t_rec = round(time.perf_counter() - t0, 2)
    sb_rec = plan_runtime_metrics(record)["shuffle_bytes_written"]
    finals = record.agg(
        F.sum("q_keep").alias("q"),
        F.sum("ex_keep").alias("ex"),
        F.sum("nd_keep").alias("nd"),
        F.sum("mix_keep").alias("mix"),
    ).collect()[0]

    for frame in (q, exk, dominated, sigs, docs):
        frame.unpersist()
    return {
        "n_docs": n,
        "stage_wall_sec": {
            "quality": t_q, "exact_dedup": t_ex,
            "near_dup_lsh": t_nd, "record_assembly": t_rec,
        },
        "stage_shuffle_bytes": {
            "quality": sb_q, "exact_dedup": sb_ex,
            "near_dup_lsh": sb_nd, "record_assembly": sb_rec,
        },
        "near_dup_breakdown": nd_breakdown,
        "survivors": {
            "input": n, "q_keep": n_qk, "ex_keep": n_exk,
            "nd_dominated": n_dom,
            "mix_keep": int(finals["mix"]),
        },
    }


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [200_000]
    spark = get_spark("curation-scale-probe")
    for n in ns:
        print(json.dumps(probe_n(spark, n)), flush=True)


if __name__ == "__main__":
    main()
