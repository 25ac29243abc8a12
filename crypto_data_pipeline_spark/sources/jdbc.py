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
