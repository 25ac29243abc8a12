"""Time named registry queries against a probe dir (cold + steady).

Companion to scale_probe.py: runs each named query once COLD (first
execution against this sf_dir in the session — per-dir caches empty,
so ANN index builds / curation stage builds are inside the
measurement) and then 3 more times, reporting the median as the
steady-state number. Codegen is pre-warmed at sf0.001 exactly like
bench.py so cold ≠ Janino compile time.

CAVEAT: "cold" is per-QUERY first execution in this session. Queries
that SHARE a per-(session, sf_dir) cache (the fixed-IVF family:
embedding_ann_ivf_fixed / semantic_dedup / cluster_balanced_sample)
are genuinely cold only for the first family member listed — order
the arguments so shared-cache families don't mislead, or run them in
separate invocations. The distinct caches (KMeans IVF, LSH, curation
stages, fixed-IVF) are independent of each other.

Usage:  python tools/scale_probe_run.py <sf_dir> <query> [query ...]
Prints one JSON line: {"sf_dir": ..., "cold": {...}, "steady": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_data_pipeline_spark import get_spark
from crypto_data_pipeline_spark.plans.registry import load_with_extras


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    sf_dir, names = sys.argv[1], sys.argv[2:]
    specs = load_with_extras()
    unknown = [n for n in names if n not in specs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark("scale-probe-run")

    warm_sf = "/root/testdata/sf0.001"
    for n in names:
        specs[n].fn(spark, warm_sf).write.format("noop").mode("overwrite").save()

    cold: dict[str, float] = {}
    steady: dict[str, float] = {}
    for n in names:
        t0 = time.perf_counter()
        specs[n].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[n] = round(time.perf_counter() - t0, 3)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            specs[n].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        steady[n] = round(sorted(runs)[1], 3)
    print(json.dumps({"sf_dir": sf_dir, "cold": cold, "steady": steady}))


if __name__ == "__main__":
    main()
