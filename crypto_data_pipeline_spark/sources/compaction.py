"""Small-file compaction for parquet lakes.

The reference writes one JSON file per (coin, day) (crypto_app/cli.py:
95-103) — exactly the pattern that, at 100 TB, produces the classic
small-files problem: a day of streaming/incremental ingest leaves
thousands of KB-scale files, and every downstream scan pays per-file
open/footer costs plus task-scheduling overhead (a 1000-executor job
over 1M tiny files spends longer scheduling than reading).

``compact_parquet`` rewrites a parquet directory into ~target-size
files:

  * file count = ceil(input_bytes / target) — computed from the real
    file sizes via the Hadoop FileSystem API (works on any supported
    filesystem, not just local).
  * ``sort_by`` uses ``repartitionByRange`` so compacted files are
    range-clustered on the sort key — min/max footer pruning then
    skips whole files for key-range predicates (the poor man's
    Z-order for a single key).
  * without ``sort_by`` a plain round-robin ``repartition`` balances
    file sizes exactly.
  * output is written to a new directory and atomically becomes the
    compacted generation; the caller swaps paths (object stores have
    no atomic dir rename — generation-addressed paths are the
    standard pattern).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def parquet_dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of a parquet directory, via the Hadoop
    FileSystem API so it works on every Spark-supported filesystem."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    # Qualify the root through the SAME filesystem that will list it, so
    # relative paths / trailing-dot segments normalize identically to
    # the listed file paths — a raw len() slice against an unqualified
    # root mis-splits `rel` and breaks the hidden-segment filter.
    qroot = fs.makeQualified(hpath)
    it = fs.listFiles(qroot, True)
    root = qroot.toUri().getPath().rstrip("/")
    n_files = 0
    total = 0
    while it.hasNext():
        status = it.next()
        full = status.getPath().toUri().getPath()
        if not full.startswith(root + "/"):
            raise ValueError(
                f"listed file {full!r} is outside the qualified root {root!r}"
            )
        rel = full[len(root) :].lstrip("/")
        # skip hidden files AND files under hidden dirs (_temporary/
        # from an interrupted write, _spark_metadata/ from a streaming
        # sink) — either would inflate the computed output file count
        if any(seg.startswith(("_", ".")) for seg in rel.split("/")):
            continue
        n_files += 1
        total += status.getLen()
    return n_files, total


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> DataFrame:
    """Rewrite ``in_path`` into ``out_path`` as ~``target_file_bytes``
    files (count derived from actual input bytes; parquet re-encoding
    keeps sizes in the same ballpark). Returns the compacted frame.

    With ``sort_by``, files are range-partitioned on those columns so
    footer min/max statistics prune file-level for key predicates."""
    _, total = parquet_dir_stats(spark, in_path)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(in_path)
    if sort_by:
        shaped = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        shaped = df.repartition(n_out)
    shaped.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
