"""Corrupt-record quarantine (dead-letter) for semi-structured ingest.

The reference's loader trusts its JSON payloads (`load_data.py:55-64`
navigates `response_data` with bare dict indexing — one malformed API
response aborts the batch). At 100 TB a feed WILL contain truncated or
malformed payloads, and the scalable contract is: parse permissively,
route failures to a quarantine table with full provenance, and keep
the good rows flowing — never fail the job, never silently drop.

Mechanics: `from_json` in PERMISSIVE mode with a declared
`columnNameOfCorruptRecord` field keeps the RAW payload of every row
the parser rejects (and nulls the data fields), so one codegen
expression yields both streams from a single scan — no second parse,
no Python. The split is two filters over the same parsed column;
Catalyst collapses each into the scan, and at scale the quarantine
side is tiny so its write amortizes to noise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

CORRUPT_COL = "_corrupt_payload"


def parse_json_permissive(
    payload: Column | str, schema: str, corrupt_col: str = CORRUPT_COL
) -> Column:
    """One-pass permissive parse: a struct column holding the declared
    fields plus ``corrupt_col`` = the raw payload iff the parse failed
    (null for clean rows). ``schema`` is the DATA schema only, e.g.
    ``"k double"`` — the corrupt slot is appended here."""
    c = F.col(payload) if isinstance(payload, str) else payload
    return F.from_json(
        c,
        f"{schema}, {corrupt_col} string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
    )


def split_quarantine(
    df: DataFrame,
    payload: str,
    schema: str,
    corrupt_col: str = CORRUPT_COL,
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows carry the parsed struct in
    ``parsed``; quarantined rows keep every original column (full
    provenance for replay after a parser fix) plus the raw payload
    under ``corrupt_col``."""
    parsed = df.withColumn("parsed", parse_json_permissive(payload, schema, corrupt_col))
    bad_flag = F.col(f"parsed.{corrupt_col}").isNotNull()
    clean = parsed.where(~bad_flag | F.col(payload).isNull()).withColumn(
        "parsed", F.col("parsed").dropFields(corrupt_col)
    )
    quarantined = parsed.where(bad_flag).select(*df.columns)
    return clean, quarantined


def write_quarantine(
    bad: DataFrame,
    path: str,
    reason: str = "json_parse_error",
    quarantine_date: str | None = None,
) -> None:
    """Append the dead-letter rows as parquet with an audit reason —
    append, not overwrite: quarantine accumulates across ingest runs
    and is replayed/purged by an explicit maintenance job. Rows land
    under a ``_quarantine_date=YYYY-MM-DD`` hive partition (today by
    default), so retention is a directory DELETE, not a rewrite."""
    d = F.lit(quarantine_date).cast("date") if quarantine_date else F.current_date()
    (
        bad.withColumn("_quarantine_reason", F.lit(reason))
        .withColumn("_quarantine_date", d)
        .write.mode("append")
        .partitionBy("_quarantine_date")
        .parquet(path)
    )


def purge_quarantine(spark, path: str, keep_after: str) -> list[str]:
    """Retention: drop every ``_quarantine_date`` partition strictly
    OLDER than ``keep_after`` (YYYY-MM-DD). Deletes whole partition
    directories via the Hadoop FileSystem API — O(partitions) metadata
    ops, zero data rewrite, works on any Spark-supported filesystem.
    Returns the deleted partition values (for the maintenance log)."""
    from crypto_data_pipeline_spark.sources.hadoop_fs import get_fs

    jvm, fs, hpath = get_fs(spark, path)
    if not fs.exists(hpath):
        return []
    dropped: list[str] = []
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith("_quarantine_date=")):
            continue
        part_date = name.split("=", 1)[1]
        if part_date < keep_after:  # ISO dates compare lexically
            fs.delete(status.getPath(), True)
            dropped.append(part_date)
    return sorted(dropped)
