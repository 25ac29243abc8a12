"""S4: the real JDBC table-scan path (notebooks/EDA.ipynb:396-408 reads
PostgreSQL via SQLAlchemy; sources/tables.py is this sandbox's parquet
stand-in — no JDBC driver jar or database exists in the container, so
this module is exercised up to the option-assembly boundary and
documented beyond it).

Scale design, not a toy wrapper:

  * **Partitioned reads are mandatory at scale.** A bare
    ``spark.read.jdbc(url, table)`` is ONE task holding one connection —
    the whole cluster waits on a single cursor. ``partition_column`` +
    bounds split the scan into ``num_partitions`` range predicates
    (``WHERE col >= lo AND col < hi``) that run concurrently; the
    reference's coin_history PK (coin_id, fetch_date) would partition on
    an integer date key.
  * **Predicates push down.** Catalyst forwards filters/column pruning
    into the generated SQL (visible as PushedFilters in explain), same
    as the parquet path — that is why downstream plans are identical
    whichever loader produced the frame.
  * **Explicit ``predicates`` list** covers non-numeric splits (one
    partition per month string, matching the reference's per-month
    ingest loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_options(
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """Assemble the option map for a JDBC scan (pure — unit-testable
    without a driver jar). Range-partition options must be supplied
    together; ``fetch_size`` defaults high because the JDBC default
    (driver-dependent, often 10 rows) throttles bulk extraction."""
    partition_args = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(a is not None for a in partition_args) and any(a is None for a in partition_args):
        raise ValueError(
            "partition_column, lower_bound, upper_bound, num_partitions must be set together"
        )
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetch_size),
        **(properties or {}),
    }
    if partition_column is not None:
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def jdbc_write_options(
    url: str,
    table: str,
    *,
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    truncate: bool = False,
    isolation_level: str = "READ_COMMITTED",
    properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """Assemble the option map for a JDBC write (pure — unit-testable
    without a driver jar). ``batchsize`` defaults high for the same
    reason ``fetchsize`` does on the read side (per-row round trips
    throttle bulk loads); ``num_partitions`` CAPS the writer's
    concurrent connections — a 1000-task frame would otherwise open
    1000 sessions against the database, which is the scale failure
    mode of JDBC sinks (coalesce, don't repartition: no shuffle just
    to throttle connections); ``truncate=True`` makes overwrite issue
    TRUNCATE instead of DROP+CREATE, preserving server-side DDL
    (indexes, the reference's UNIQUE constraints)."""
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "batchsize": str(batch_size),
        "isolationLevel": isolation_level,
        "truncate": "true" if truncate else "false",
        **(properties or {}),
    }
    if num_partitions is not None:
        opts["numPartitions"] = str(num_partitions)
    return opts


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    keys: list[str] | None = None,
    order_by: list[str] = ("created_at",),
    mode: str = "append",
    **kwargs,
) -> None:
    """JDBC write-back — the reference's actual sink is PostgreSQL
    (`/root/reference/load_data.py:66-102`,
    `/root/reference/crypto_app/db.py:113-133`: SELECT-then-INSERT-or-
    UPDATE per key). Spark's JDBC writer has no MERGE, so the upsert
    semantics land the same way the parquet twins do
    (`sources/upsert.py`): with ``keys``, the frame is window-deduped
    last-write-wins per key FIRST (one shuffle), so a SINGLE delivery
    that carries replays of its own rows cannot violate the server's
    UNIQUE(coin_id, fetch_date) on append. That dedupe is
    WITHIN-DELIVERY only — re-running the same delivery later (the
    at-least-once replay case) still appends keys the table already
    holds and trips UNIQUE. Cross-delivery replay safety needs one of
    the two idempotent patterns: ``mode='overwrite'`` +
    ``truncate=True`` (the full-refresh twin of the S8 aggregate
    sink), or server-side merge — append to a staging table, then
    issue INSERT ... ON CONFLICT from it. This function is the
    transport, not a row-at-a-time loop.

    Untestable past the option-assembly boundary in this sandbox (no
    JDBC driver jar or database in the container) — exercised to that
    boundary by tests/test_pg_compat.py, semantics value-tested via
    the parquet upsert twins (S7/S8 driver queries)."""
    if keys:
        from crypto_data_pipeline_spark.sources.upsert import latest_per_key

        df = latest_per_key(df, list(keys), list(order_by))
    writer = df.write.format("jdbc").mode(mode)
    for k, v in jdbc_write_options(url, table, **kwargs).items():
        writer = writer.option(k, v)
    writer.save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    predicates: list[str] | None = None,
    **kwargs,
) -> DataFrame:
    """Lazy JDBC scan. With ``predicates``, each string becomes one
    partition's WHERE clause (mutually exclusive with range options —
    Spark's own jdbc() contract)."""
    if predicates is not None:
        props = kwargs.pop("properties", None) or {}
        if kwargs:
            raise ValueError("predicates and range-partition options are mutually exclusive")
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    reader = spark.read.format("jdbc")
    for k, v in jdbc_options(url, table, **kwargs).items():
        reader = reader.option(k, v)
    return reader.load()
