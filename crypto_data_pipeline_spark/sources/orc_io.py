"""ORC source/sink — the second columnar format of the lake.

The reference stores exclusively in PostgreSQL + CSV checkpoints; a
100 TB Spark deployment interoperates with Hive-era warehouses where
ORC is the incumbent format. Spark's ORC support is built in (native
vectorized reader, predicate pushdown via file/stripe min-max stats,
hive-style partition discovery), so the engine exposes it exactly like
parquet: explicit schema on read, partitioned writes on a declared
key. Doubles and integers round-trip bit-exactly (binary encoding —
unlike the CSV text path, no formatting contract needed)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)
