"""ANN recall/cost frontier probe — speed numbers alone can't rank
approximate indexes.

`bench.py` records recall@5 for the registered ANN queries at one
setting each; this probe sweeps the QUERY-TIME knobs and records, for
every (index, setting) point, the two numbers that actually define an
ANN operating point:

- recall@5 vs the exact brute-force twin (same 10 fixed queries), and
- candidates scored per query — the true unit of probe cost at scale:
  at 100 TB every candidate is a row read from a pruned partition and
  a dot product, so "recall per candidate" is the frontier a deployer
  tunes along, not wall-clock on a 32-thread box.

Swept settings:
- LSH probes_per_table 0..3 (0 = classic single-probe; >0 = Lv et al.
  2007 multi-probe, flipping the lowest-|margin| sign bits) over the
  SAME at-rest index (5 bits x 10 tables) — the whole point of
  multi-probe is that the frontier moves without re-indexing.
- IVF nprobe 1/2/4/8 over the shipped 16-centroid KMeans index, PLUS
  (round 11) the BUILD knob: n_centroids 16/41/64 (41 = the config
  guard's recommendation for the 16-cell demo geometry) at nprobe
  1/2/4 — every IVF row carries the `ivf_config_check` estimator's
  expected candidate fraction beside the measured one, so the guard
  that gates production builds is validated against ground truth.

Candidate sets are rebuilt with the operators' OWN expression builders
(similarity._table_buckets / multiprobe_query_keys — which derives the
flipped keys via _multiprobe_keys_from_dots — and _cell_scores), so the
probe counts the exact candidate sets the operators join, not a
reimplementation's. Fully deterministic: fixed hyperplanes, fixed
KMeans seed, fixed queries — same corpus -> same line on any run.

Usage:  python tools/ann_probe.py [sf_dir ...]
        (default: /root/testdata/sf{0.001,0.01,0.1})
Prints one JSON line per (sf_dir, index, setting).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crypto_data_pipeline_spark import get_spark
from crypto_data_pipeline_spark.operators import similarity as S

K = 5
N_QUERIES = 10


def _topk_sets(df) -> dict[int, set[int]]:
    got: dict[int, set[int]] = {}
    for r in df.select("query_id", "vec_id").collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    return got


def _recall(got: dict[int, set[int]], truth: dict[int, set[int]]) -> float:
    total = sum(len(v) for v in truth.values())
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    return round(hits / total, 4)


def probe_sf(spark, sf_dir: str) -> list[dict]:
    embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_corpus = embs.count()
    queries = embs.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = _topk_sets(S.brute_force_topk(embs, queries, k=K))

    rows: list[dict] = []

    def emit(index: str, setting: str, recall: float, n_cand: int) -> None:
        rows.append(
            {
                "sf_dir": sf_dir,
                "n_corpus": n_corpus,
                "index": index,
                "setting": setting,
                "recall_at_5": recall,
                "cands_per_query": round(n_cand / N_QUERIES, 1),
                "cand_fraction": round(n_cand / (N_QUERIES * (n_corpus - 1)), 4),
            }
        )

    # exactness baseline: scores every corpus vector once per query
    emit("brute", "full-scan", 1.0, N_QUERIES * (n_corpus - 1))

    lsh = S.build_lsh_keys(embs)
    for npr in (0, 1, 2, 3):
        if npr == 0:
            qk = queries.select(
                "query_id",
                F.explode(
                    S._table_buckets("embedding", lsh.dim, lsh.bits, lsh.tables, lsh.seed)
                ).alias("tb"),
            ).select("query_id", "tb.t", "tb.b")
        else:
            qk = S.multiprobe_query_keys(
                queries, "query_id", "embedding",
                lsh.dim, lsh.bits, lsh.tables, lsh.seed, npr,
            )
        n_cand = (
            lsh.keys.join(F.broadcast(qk), ["t", "b"])
            .where(F.col("query_id") != F.col(lsh.id_col))
            .select("query_id", lsh.id_col)
            .distinct()
            .count()
        )
        got = _topk_sets(
            S.lsh_topk(embs, queries, k=K, corpus_keys=lsh, probes_per_table=npr)
        )
        emit("lsh", f"probes_per_table={npr}", _recall(got, truth), n_cand)
    lsh.keys.unpersist()

    # IVF frontier over BOTH knobs (round 11): nprobe (query-time) at
    # the shipped 16-cell build, plus the BUILD knob n_centroids at a
    # recall-comparable nprobe — the axis the new ivf_config_check
    # recommends along. Each row also records the guard's build-time
    # candidate-fraction estimate next to the measured fraction, so
    # the estimator that gates production builds is validated against
    # ground truth on every probe run. Round 12 adds the RECOMMENDED
    # operating point — n_centroids = round(sqrt(N)), the geometry the
    # guard's own warning quotes and the bench embedding_ann_ivf row
    # now serves — with nprobe swept through the recall knee and the
    # serving chooser's pick (largest nprobe under the guard
    # threshold) marked on its row.
    rec_cells = max(16, round(n_corpus ** 0.5))
    for n_centroids in sorted({16, rec_cells, 64}):
        ivf = S.build_ivf_index(embs, n_centroids=n_centroids)
        q_n = S._unit_normed(queries, "query_id", "embedding").withColumnRenamed("_v", "_qv")
        nprobes = (1, 2, 4, 8) if n_centroids == 16 else (1, 2, 3, 4, 6, 8)
        chosen = (
            S.ivf_serving_nprobe(ivf)["nprobe"] if n_centroids == rec_cells
            else None
        )
        if chosen is not None:
            # the chooser can legally pick a depth outside the default
            # sweep (e.g. 5 or 7); include it so the serving_pick marker
            # always lands on a probed row (round-12 ADVICE)
            nprobes = tuple(sorted(set(nprobes) | {chosen}))
        for nprobe in nprobes:
            scored_centers = S._cell_scores(F.col("_qv"), S._centers_expr(ivf.centers))
            probes = F.slice(F.array_sort(scored_centers), 1, nprobe)
            q_probed = q_n.select(
                "query_id", F.explode(F.transform(probes, lambda p: p["_cell"])).alias("_cell")
            )
            n_cand = (
                ivf.assigned.join(F.broadcast(q_probed), "_cell")
                .where(F.col("query_id") != F.col(ivf.id_col))
                .count()
            )
            got = _topk_sets(
                S.ivf_topk(embs, queries, k=K, nprobe=nprobe, index=ivf,
                           n_centroids=n_centroids)
            )
            # the SHIPPED guard, not a re-derivation: its verdict IS
            # the recorded one, so a future warn_above change cannot
            # desynchronize the probe from the gate it validates
            # (round 12, ADVICE). Its warning on degenerate geometries
            # is the guard speaking — left audible in probe stderr.
            check = S.ivf_config_check(ivf, nprobe)
            emit(
                "ivf",
                f"n_centroids={n_centroids},nprobe={nprobe}",
                _recall(got, truth),
                n_cand,
            )
            rows[-1]["guard_est_fraction"] = check["expected_candidate_fraction"]
            rows[-1]["guard_verdict"] = check["verdict"]
            if n_centroids == rec_cells:
                rows[-1]["recommended_geometry"] = True
                rows[-1]["serving_pick"] = nprobe == chosen
        ivf.assigned.unpersist()

    return rows


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("ann-probe")
    for sf_dir in sf_dirs:
        for row in probe_sf(spark, sf_dir):
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
