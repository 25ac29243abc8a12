"""DSIR selection at corpus scale — the stage the round-9 verdict
called out (single-partition global window) versus the round-10
histogram-cutoff rewrite, measured head to head.

Synthesizes an (doc_id, weight) frame of N rows (JVM expressions only:
weights are xxhash64-derived doubles in [-50, 50), rounded 6 dp like
dsir_importance_weights' contract) and measures:

- `dsir_kth_weight` (the quantile path's cutoff): wall seconds and the
  analytic round count ceil(log_n_bins(range·1e6)) — each round is one
  map-side-combinable aggregate over all partitions; the driver sees
  only <= n_bins histogram rows per round.
- EXACTNESS at every N without a global sort: the k-th largest weight
  c is the unique value with count(weight >= c) >= k and
  count(weight > c) < k — both sides checked as distributed counts.
  (At 2M the probe additionally cross-checks against a driver-side
  sorted collect.)
- `dsir_resample` (the old window path) wall seconds at the same N —
  the single-task sort the rewrite removed; its growth curve is the
  point. Skipped above ``window_cap`` rows to keep the probe bounded.
- plan evidence: the quantile selection's executed plan carries zero
  zero-partition Window nodes (observability.global_window_nodes),
  the window path's carries them by construction.

Usage:  python tools/dsir_selection_probe.py [N ...]
        (default: 2000000 20000000)
Prints one JSON line per (N, path).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from crypto_data_pipeline_spark import get_spark
from crypto_data_pipeline_spark.observability import global_window_nodes
from crypto_data_pipeline_spark.operators import dsir

KEEP = 0.25
WINDOW_CAP = 20_000_000  # the window path is timed up to here


def synth_weighted(spark, n: int) -> DataFrame:
    """(doc_id, weight): deterministic 6dp weights in [-50, 50).
    Double literals need the D suffix — a bare 1000000.0 is a DECIMAL
    literal in Spark SQL, which would silently give the whole column
    decimal type (the real weight contract is double)."""
    w = "round(pmod(xxhash64(id, 7), 100000000) / 1000000.0D - 50.0D, 6)"
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.expr(w).alias("weight")
    )


def probe_n(spark, n: int) -> list[dict]:
    weighted = synth_weighted(spark, n).persist()
    weighted.count()  # materialize; generation is not what we time
    k = math.ceil(n * KEEP)
    rows: list[dict] = []

    t0 = time.perf_counter()
    cutoff = dsir.dsir_kth_weight(weighted, KEEP)
    t_cut = round(time.perf_counter() - t0, 3)

    # exactness as two distributed counts — the defining property of
    # the k-th largest, checkable at ANY N without a sort
    ge = weighted.where(F.col("weight") >= cutoff).count()
    gt = weighted.where(F.col("weight") > cutoff).count()
    exact = bool(ge >= k and gt < k)
    if n <= 2_000_000:  # belt and braces: sorted-collect ground truth
        ws = sorted((r.weight for r in weighted.select("weight").collect()),
                    reverse=True)
        exact = exact and (cutoff == ws[k - 1])

    sel = dsir.dsir_resample_quantile(weighted, KEEP)
    t0 = time.perf_counter()
    sel.write.format("noop").mode("overwrite").save()
    t_sel = round(time.perf_counter() - t0, 3)
    rng = (
        weighted.agg(
            (F.max(F.round(F.col("weight") * 1e6, 0))
             - F.min(F.round(F.col("weight") * 1e6, 0))).alias("r")
        ).collect()[0].r
    )
    rows.append({
        "n_rows": n, "path": "quantile_cutoff",
        "cutoff_seconds": t_cut, "select_seconds": t_sel,
        "histogram_rounds": max(0, math.ceil(math.log(max(rng, 1), 4096))),
        "kth_exact": exact,
        "global_windows_in_plan": len(global_window_nodes(sel)),
    })

    if n <= WINDOW_CAP:
        ranked = dsir.dsir_resample(weighted, KEEP)
        t0 = time.perf_counter()
        ranked.write.format("noop").mode("overwrite").save()
        t_win = round(time.perf_counter() - t0, 3)
        rows.append({
            "n_rows": n, "path": "global_window",
            "select_seconds": t_win,
            "global_windows_in_plan": len(global_window_nodes(ranked)),
        })
    weighted.unpersist()
    return rows


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [2_000_000, 20_000_000]
    spark = get_spark("dsir-selection-probe")
    for n in ns:
        for row in probe_n(spark, n):
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
