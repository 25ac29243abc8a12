"""Build a ~10x replica of an sf test directory so the headline suite
gets an order-of-magnitude scaling datapoint (the environment ships no
sf1 testdata — see docs/SCALE_PROBE.md).

Facts (events, documents, embeddings, orders+lineitem) are replicated
K times with primary/foreign keys shifted per copy so referential
structure survives; dimension tables (region, nation, customer,
supplier, part) are copied unchanged — facts outgrow dims at real
scale, and every fact FK into a dim stays valid. Text/vector payloads
are replicated verbatim: a 10x-duplicated corpus is the REALISTIC hard
case for the dedup pipelines (web crawls run ~50% duplicate), so the
probe stresses exactly the paths whose 100 TB story matters most.

Usage:  python tools/scale_probe.py [K] [out_dir] [fact ...]
        (defaults: K=10, out_dir=/tmp/scale_probe/sf1.0, all facts)
        Naming specific facts replicates ONLY those; every other
        table is copied unreplicated so any query still runs. This is
        the sf100-class mode: K=1000 on documents+embeddings alone
        (the tables the ANN/curation probes scan) costs ~1.4 GB where
        a full K=1000 replica would need ~17 GB of lineitem no probe
        reads.
Then:   SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from crypto_data_pipeline_spark import get_spark

SRC = os.environ.get("SPARK_GRAFT_PROBE_SRC", "/root/testdata/sf0.1")

DIMS = ["region", "nation", "customer", "supplier", "part"]

# fact table -> columns shifted by copy_idx * stride (stride chosen per
# table as a round power of ten comfortably above the source key range)
FACT_SHIFTS: dict[str, dict[str, int]] = {
    "events": {"event_id": 10**9, "user_id": 10**6},
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**7},
    "orders": {"o_orderkey": 10**9},
    "lineitem": {"l_orderkey": 10**9},
}


def replicate(df: DataFrame, shifts: dict[str, int], k: int) -> DataFrame:
    # ONE scan cross-joined with a broadcast k-row copy index — a
    # k-way union plan works at k=10 but k=1000 scans would bloat the
    # plan tree a thousandfold; this shape is O(1) in plan size
    copies = F.broadcast(
        df.sparkSession.range(k).select(F.col("id").alias("_copy"))
    )
    out = df.crossJoin(copies)
    for col, stride in shifts.items():
        dt = dict(df.dtypes)[col]
        out = out.withColumn(
            col, (F.col(col) + F.col("_copy") * F.lit(stride)).cast(dt)
        )
    return out.drop("_copy")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe/sf1.0"
    chosen = set(sys.argv[3:]) or set(FACT_SHIFTS)
    unknown = chosen - set(FACT_SHIFTS)
    if unknown:
        raise SystemExit(f"unknown fact tables: {sorted(unknown)}")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("scale-probe")

    for t in DIMS + sorted(set(FACT_SHIFTS) - chosen):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    for t in sorted(chosen):
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        # spread the replicated fact across all cores' worth of files:
        # the cross-join output otherwise inherits the SOURCE's file
        # count (sf0.1 = a handful), and every downstream scan —
        # KMeans index builds especially — drags k-times-fatter
        # straggler partitions. A real dataset at this size arrives as
        # many files; the probe should too.
        replicate(src, FACT_SHIFTS[t], k).repartition(64).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    print(f"probe dir ready: {out_dir}")


if __name__ == "__main__":
    main()
