"""ANN tier at corpus scale — the axis the sf fixtures cannot reach.

The testdata embeddings top out at 2,000 vectors; every ANN recall and
latency number so far is fixture-scale. This probe synthesizes a
CLUSTERED corpus of N vectors (deterministic, Spark-expression-only
generation — no Python in the data path, no RNG library) and measures
the LSH tier end to end at N up to millions:

- corpus: dim-64 vectors around ``n_clusters`` deterministic unit
  centers (the `similarity._hyperplanes` LCG family — reused so the
  centers are bit-stable) plus per-coordinate noise from xxhash64
  draws. Planted clusters make recall MEANINGFUL at scale (a clone
  replica would make every neighbor a duplicate) and give the corpus
  the geometry production embeddings actually have — which the tiny
  near-random fixture lacks.
- index build: build_lsh_keys + write_lsh_index to parquet
  (partitioned by table — the at-rest serving layout), timed.
- probes FROM REST (read_lsh_index, the serving configuration):
  single-probe and 2-flip multi-probe, timed (median of 3) with
  recall@5 and candidates-per-query vs the exact brute-force twin.
- two hash families: the fixture default (5 bits x 10 tables) and a
  sharper one scaled to the corpus (10 bits x 8 tables) — the
  "production raises bits with log2(corpus)" claim, measured instead
  of asserted.
- IVF for comparison: KMeans build (timed) + nprobe=4 probe.

Fully deterministic data; timings are the usual local[32] caveat.

Usage:  python tools/ann_scale_probe.py [N ...]   (default: 200000)
Prints one JSON line per (N, index, setting).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from crypto_data_pipeline_spark import get_spark
from crypto_data_pipeline_spark.operators import similarity as S

DIM = 64
N_CLUSTERS = 64
# noise sized so clusters are REAL: the noise vector's expected norm is
# NOISE*sqrt(DIM/3) ~= 0.69 against unit centers, giving within-cluster
# cosine ~= 1/(1+0.48) ~= 0.68 — strongly clustered, the geometry the
# production-embedding claim in lsh_topk's docstring is about (0.35
# made noise DOMINATE the center: within-cluster cosine 0.28, i.e. the
# fixture's weak clustering reproduced at scale, measured and rejected)
NOISE = 0.15
K = 5
N_QUERIES = 10


def synth_corpus(spark, n: int) -> DataFrame:
    """N clustered vectors: vec = center[xxhash64(id) % C] + NOISE*u,
    u per-coordinate uniform in [-1, 1) from xxhash64(id, coord).
    Everything is a deterministic JVM-side expression — the corpus
    materializes at scan speed, no driver involvement past the plan."""
    centers = S._hyperplanes(DIM, N_CLUSTERS, seed=9)
    lit = "array(" + ", ".join(
        "array(" + ", ".join(f"{x!r}D" for x in c) + ")" for c in centers
    ) + ")"
    vec = (
        "transform(sequence(1, {d}), i -> "
        "element_at(element_at({lit}, cast(pmod(xxhash64(id), {c}) + 1 as int)), i) "
        "+ {noise}D * (pmod(xxhash64(id, i), 1000003) / 1000003.0 * 2.0 - 1.0))"
    ).format(d=DIM, lit=lit, c=N_CLUSTERS, noise=NOISE)
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(vec).alias("embedding"),
    )


def _topk_sets(df) -> dict[int, set[int]]:
    got: dict[int, set[int]] = {}
    for r in df.select("query_id", "vec_id").collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    return got


def _timed_median3(make_df) -> tuple[float, object]:
    """Median of 3 full executions via the noop sink (the bench.py
    convention); returns (seconds, last DataFrame)."""
    runs = []
    df = None
    for _ in range(3):
        t0 = time.perf_counter()
        df = make_df()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return round(sorted(runs)[1], 3), df


def probe_n(spark, n: int) -> list[dict]:
    corpus = synth_corpus(spark, n).persist()
    corpus.count()  # materialize once; generation is not what we time
    queries = corpus.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    rows: list[dict] = []

    def emit(index: str, setting: str, **kw) -> None:
        rows.append({"n_corpus": n, "index": index, "setting": setting, **kw})

    # exact baseline: the Arrow partition-local top-k (the scalable
    # exact formulation) — its latency is what ANN must beat
    t_brute, _ = _timed_median3(
        lambda: S.brute_force_topk_arrow(corpus, queries, k=K)
    )
    truth = _topk_sets(S.brute_force_topk_arrow(corpus, queries, k=K))
    total = sum(len(v) for v in truth.values())
    emit("brute", "arrow-full-scan", seconds=t_brute, recall_at_5=1.0)

    for bits, tables in ((5, 10), (10, 8)):
        fam = f"{bits}bx{tables}t"
        t0 = time.perf_counter()
        idx = S.build_lsh_keys(corpus, dim=DIM, bits=bits, tables=tables)
        n_keys = idx.keys.count()
        t_build = round(time.perf_counter() - t0, 3)
        at_rest = tempfile.mkdtemp(prefix=f"ann_scale_{fam}_")
        try:
            t0 = time.perf_counter()
            S.write_lsh_index(idx, at_rest)
            t_write = round(time.perf_counter() - t0, 3)
            idx.keys.unpersist()
            served = S.read_lsh_index(spark, at_rest)
            for npr in (0, 2):
                t_probe, _ = _timed_median3(
                    lambda npr=npr: S.lsh_topk(
                        corpus, queries, k=K, dim=DIM, bits=bits, tables=tables,
                        corpus_keys=served, probes_per_table=npr,
                    )
                )
                got = _topk_sets(
                    S.lsh_topk(
                        corpus, queries, k=K, dim=DIM, bits=bits, tables=tables,
                        corpus_keys=served, probes_per_table=npr,
                    )
                )
                hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
                if npr == 0:
                    qk = queries.select(
                        "query_id",
                        F.explode(
                            S._table_buckets("embedding", DIM, bits, tables, 42)
                        ).alias("tb"),
                    ).select("query_id", "tb.t", "tb.b")
                else:
                    qk = S.multiprobe_query_keys(
                        queries, "query_id", "embedding", DIM, bits, tables, 42, npr
                    )
                n_cand = (
                    served.keys.join(F.broadcast(qk), ["t", "b"])
                    .where(F.col("query_id") != F.col("vec_id"))
                    .select("query_id", "vec_id")
                    .distinct()
                    .count()
                )
                emit(
                    "lsh", f"{fam} probes={npr}",
                    build_seconds=t_build, write_seconds=t_write,
                    index_rows=n_keys, probe_seconds=t_probe,
                    recall_at_5=round(hits / total, 4),
                    cands_per_query=round(n_cand / N_QUERIES, 1),
                    cand_fraction=round(n_cand / (N_QUERIES * (n - 1)), 4),
                )
        finally:
            shutil.rmtree(at_rest, ignore_errors=True)

    t0 = time.perf_counter()
    ivf = S.build_ivf_index(corpus)
    ivf.assigned.count()
    t_build = round(time.perf_counter() - t0, 3)
    t_probe, _ = _timed_median3(
        lambda: S.ivf_topk(corpus, queries, k=K, nprobe=4, index=ivf)
    )
    got = _topk_sets(S.ivf_topk(corpus, queries, k=K, nprobe=4, index=ivf))
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    emit(
        "ivf", "16c nprobe=4",
        build_seconds=t_build, probe_seconds=t_probe,
        recall_at_5=round(hits / total, 4),
    )
    ivf.assigned.unpersist()

    # Round 12 (VERDICT r11 next #3 follow-through): the GUARD-OK
    # operating point on clustered data. On this corpus the right
    # cell count is the cluster count (k = N_CLUSTERS = 64 — the
    # knee of the quantizer, far below sqrt(N) at 2M), with nprobe
    # from the shipped serving chooser (largest depth under the
    # guard threshold). This is the row that completes the frontier
    # story: the weakly-clustered sf fixture caps IVF at ~0.4 recall
    # under verdict-ok pruning, while clustered data — IVF's actual
    # regime — holds high recall at an ok verdict.
    t0 = time.perf_counter()
    ivf64 = S.build_ivf_index(corpus, n_centroids=N_CLUSTERS)
    ivf64.assigned.count()
    t_build = round(time.perf_counter() - t0, 3)
    serve = S.ivf_serving_nprobe(ivf64)
    npick = serve["nprobe"]
    t_probe, _ = _timed_median3(
        lambda: S.ivf_topk(corpus, queries, k=K, nprobe=npick,
                           n_centroids=N_CLUSTERS, index=ivf64)
    )
    got = _topk_sets(
        S.ivf_topk(corpus, queries, k=K, nprobe=npick,
                   n_centroids=N_CLUSTERS, index=ivf64)
    )
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    emit(
        "ivf", f"64c nprobe={npick} (serving pick)",
        build_seconds=t_build, probe_seconds=t_probe,
        recall_at_5=round(hits / total, 4),
        guard_fraction=serve["fraction_curve"][npick - 1],
        guard_verdict="ok" if serve["fraction_curve"][npick - 1]
                      <= serve["warn_above"] else "warn",
    )
    ivf64.assigned.unpersist()
    corpus.unpersist()
    return rows


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [200_000]
    spark = get_spark("ann-scale-probe")
    for n in ns:
        for row in probe_n(spark, n):
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
