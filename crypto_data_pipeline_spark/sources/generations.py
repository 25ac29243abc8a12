"""Generation-addressed tables: atomic publish, time travel, rollback.

`sources/upsert.py` documents its one weakness honestly: plain-parquet
overwrite-into-place is two non-atomic writes, and object stores have
no atomic directory rename. This module is the standard fix (the same
idea Delta/Iceberg build on, minus the transaction log): every publish
writes a COMPLETE new snapshot under ``root/gen=N`` and then flips a
tiny ``_CURRENT`` pointer file. Readers resolve the pointer first, so
they always see exactly one complete generation — a crash mid-write
leaves a dangling (unreferenced) directory, never a half-table.
Rollback is re-pointing; time travel is reading an old generation;
retention is deleting unreferenced directories.

Pointer flip: written to ``_CURRENT.tmp`` then renamed over
``_CURRENT`` (atomic on HDFS/POSIX; on S3-like stores the pointer is
a single small object PUT, which is itself atomic). The reader falls
back to the highest complete generation if the pointer is mid-flip —
so even the worst-case window degrades to "latest", never to corrupt.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_GEN_RE = re.compile(r"^gen=(\d+)$")


def _fs(spark: SparkSession, path: str):
    from crypto_data_pipeline_spark.sources.hadoop_fs import get_fs

    return get_fs(spark, path)


def list_generations(spark: SparkSession, root: str) -> list[int]:
    jvm, fs, hroot = _fs(spark, root)
    if not fs.exists(hroot):
        return []
    gens = []
    for status in fs.listStatus(hroot):
        m = _GEN_RE.match(status.getPath().getName())
        if m and status.isDirectory():
            gens.append(int(m.group(1)))
    return sorted(gens)


def _read_pointer(spark: SparkSession, root: str) -> int | None:
    jvm, fs, _ = _fs(spark, root)
    ptr = jvm.org.apache.hadoop.fs.Path(f"{root}/_CURRENT")
    if not fs.exists(ptr):
        return None
    stream = fs.open(ptr)
    try:
        data = bytearray()
        b = stream.read()
        while b >= 0:
            data.append(b)
            b = stream.read()
        return int(bytes(data).decode().strip())
    finally:
        stream.close()


def _write_pointer(spark: SparkSession, root: str, gen: int) -> None:
    jvm, fs, _ = _fs(spark, root)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{root}/_CURRENT.tmp")
    ptr = jvm.org.apache.hadoop.fs.Path(f"{root}/_CURRENT")
    out = fs.create(tmp, True)
    try:
        out.write(str(gen).encode())
    finally:
        out.close()
    fs.delete(ptr, False)
    if not fs.rename(tmp, ptr):
        raise IOError(f"pointer flip failed for {root} -> gen {gen}")


def current_generation(spark: SparkSession, root: str) -> int | None:
    """Pointer value, falling back to the highest written generation
    (mid-flip window / legacy dir)."""
    ptr = _read_pointer(spark, root)
    if ptr is not None:
        return ptr
    gens = list_generations(spark, root)
    return gens[-1] if gens else None


def publish(df: DataFrame, root: str, marker: str | None = None) -> int:
    """Write a complete new snapshot and make it current. The data
    write happens ENTIRELY before the pointer flip — the only
    non-idempotent step is one tiny file rename.

    ``marker`` (an underscore-prefixed name, invisible to parquet
    reads) is dropped INSIDE the new generation dir BEFORE the pointer
    flip, so "is the current generation the one that applied X?" is
    crash-safe: a crash before the flip leaves a dangling unreferenced
    dir (replay recomputes under the next number); a crash after the
    flip leaves the marker visible (replay no-ops). This is the
    transaction-id idempotence a Delta log provides, in one file."""
    if marker is not None and not marker.startswith("_"):
        # validate BEFORE the snapshot write: failing after would leak
        # a dangling generation dir and consume its number
        raise ValueError("marker must start with '_' to stay read-invisible")
    spark = df.sparkSession
    gens = list_generations(spark, root)
    gen = (gens[-1] + 1) if gens else 0
    df.write.mode("errorifexists").parquet(f"{root}/gen={gen}")
    if marker is not None:
        jvm, fs, _ = _fs(spark, root)
        fs.create(
            jvm.org.apache.hadoop.fs.Path(f"{root}/gen={gen}/{marker}"), True
        ).close()
    _write_pointer(spark, root, gen)
    return gen


def generation_has_marker(spark: SparkSession, root: str, gen: int, marker: str) -> bool:
    jvm, fs, _ = _fs(spark, root)
    return bool(fs.exists(jvm.org.apache.hadoop.fs.Path(f"{root}/gen={gen}/{marker}")))


def generation_markers(
    spark: SparkSession, root: str, gen: int, prefix: str = "_"
) -> list[str]:
    """Names of marker files inside a generation dir (underscore files
    are invisible to parquet reads, so they are free metadata)."""
    jvm, fs, _ = _fs(spark, root)
    path = jvm.org.apache.hadoop.fs.Path(f"{root}/gen={gen}")
    if not fs.exists(path):
        return []
    return [
        st.getPath().getName()
        for st in fs.listStatus(path)
        if st.getPath().getName().startswith(prefix)
    ]


def read_current(spark: SparkSession, root: str) -> DataFrame:
    gen = current_generation(spark, root)
    if gen is None:
        raise FileNotFoundError(f"no generations published at {root}")
    return read_generation(spark, root, gen)


def read_generation(spark: SparkSession, root: str, gen: int) -> DataFrame:
    """Time travel: any retained generation is readable by number."""
    return spark.read.parquet(f"{root}/gen={gen}")


def rollback(spark: SparkSession, root: str, to_gen: int) -> None:
    """Re-point to an older snapshot — O(1), no data movement."""
    if to_gen not in list_generations(spark, root):
        raise ValueError(f"generation {to_gen} does not exist at {root}")
    _write_pointer(spark, root, to_gen)


def vacuum(spark: SparkSession, root: str, keep_last: int = 2) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` generations —
    but NEVER the current pointer target, wherever it points. Returns
    the dropped generation numbers."""
    jvm, fs, _ = _fs(spark, root)
    gens = list_generations(spark, root)
    cur = current_generation(spark, root)
    # gens[-0:] is the WHOLE list, not none of it — guard keep_last<=0
    # so "drop all but current" means what it says
    keep = (set(gens[-keep_last:]) if keep_last > 0 else set()) | (
        {cur} if cur is not None else set()
    )
    dropped = []
    for g in gens:
        if g not in keep:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/gen={g}"), True)
            dropped.append(g)
    return dropped


def upsert_publish(
    new_rows: DataFrame,
    root: str,
    keys: list[str],
    order_by: list[str] = ("created_at",),
) -> int:
    """The transactional form of `sources/upsert.py`: merge
    ``new_rows`` into the CURRENT generation (same one-shuffle
    last-write-wins window) and publish the result as a NEW
    generation. Readers of the old snapshot are never disturbed, a
    crash mid-merge leaves only an unreferenced directory, and a bad
    batch is one `rollback()` away — the three failure modes the
    staging-swap upsert documents as its plain-parquet limits, closed.
    Returns the new generation number."""
    from crypto_data_pipeline_spark.sources.upsert import latest_per_key

    spark = new_rows.sparkSession
    cur = current_generation(spark, root)
    if cur is None:
        merged = latest_per_key(new_rows, keys, list(order_by))
    else:
        existing = read_generation(spark, root, cur)
        merged = latest_per_key(
            existing.unionByName(new_rows), keys, list(order_by)
        )
    return publish(merged, root)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two snapshots of a keyed table:
    (keys..., change) with change in {'added', 'removed', 'changed'};
    unchanged rows are dropped inside the join, never surfaced.

    Comparison is EXACT: both sides' non-key columns are packed into a
    struct and tested with null-safe equality — no content hashing, so
    no collision caveat and no cross-engine hash portability to prove.
    Distributed shape: one full-outer sort-merge join keyed on the
    table key per side; generations published bucketed by the key
    co-locate both scans and drop even that Exchange. Only the key
    columns and one struct per side travel."""
    from pyspark.sql import functions as F

    cols = compare_cols or [c for c in new.columns if c not in keys]
    if not cols:
        raise ValueError("snapshot_diff needs at least one non-key column")
    o = old.select(*keys, F.struct(*cols).alias("_o"))
    n = new.select(*keys, F.struct(*cols).alias("_n"))
    change = (
        F.when(F.col("_o").isNull(), F.lit("added"))
        .when(F.col("_n").isNull(), F.lit("removed"))
        .when(~F.col("_o").eqNullSafe(F.col("_n")), F.lit("changed"))
    )
    return (
        o.join(n, list(keys), "full_outer")
        .select(*keys, change.alias("change"))
        .where(F.col("change").isNotNull())
    )


def generation_diff(
    spark: SparkSession,
    root: str,
    from_gen: int,
    to_gen: int,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Time-travel diff: what changed between two retained generations
    — the audit primitive a pointer-flip store owes its operators
    ("what did yesterday's publish actually do?"). Pure composition of
    read_generation + snapshot_diff."""
    return snapshot_diff(
        read_generation(spark, root, from_gen),
        read_generation(spark, root, to_gen),
        keys,
        compare_cols,
    )
