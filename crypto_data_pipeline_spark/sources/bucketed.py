"""Bucketed table layout and skew-mitigation joins.

The reference delegates physical layout entirely to PostgreSQL (a
UNIQUE btree on (coin_id, fetch_date), sql/create_tables.sql:11,27, is
its whole story). On Spark at 100 TB the equivalent decisions are
explicit and they dominate cost, so the engine ships them as
first-class utilities:

``write_bucketed`` / ``bucketed_table``
    Hash-bucket a fact table by its join/aggregation key at write time.
    Every later equi-join or groupBy on that key then satisfies its
    required distribution straight off the scan — ZERO Exchange in the
    plan. At 100 TB a single avoided shuffle of the fact table is the
    difference between minutes and hours; bucketing amortizes it across
    every downstream query. (Verified in tests by asserting no Exchange
    node below the join.)

``salted_join``
    For the keys bucketing can't save — pathological hot keys in a
    shuffle join. Replicates the small side ``salt`` ways and scatters
    the big side's hot partitions across them, turning one straggler
    task into ``salt`` even ones. AQE's skew-join split handles
    moderate skew at runtime (enabled in session.py); explicit salting
    is for the extreme tail and for deterministic plans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

_SALT = "__salt"


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    *,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table in the session catalog.

    ``sort_cols`` additionally sorts within each bucket file, letting a
    downstream sort-merge join skip its Sort when files-per-bucket is 1.
    ``path`` makes it an external table (data outlives the catalog
    entry, which for the default in-memory catalog lives only as long
    as the session — on a real deployment the metastore persists it).
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table. The scan reports its bucket spec as output
    partitioning, which is what lets Catalyst elide the Exchange."""
    return spark.table(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: ``left`` (the big, possibly skewed
    side) gets a uniform random salt in [0, salt); ``right`` (the small
    side) is replicated once per salt value; the join runs on
    ``on + [salt]`` so each formerly-hot key now spreads over ``salt``
    reducers.

    Only join types that never emit unmatched RIGHT rows are legal —
    the replication would multiply them. Inner/left outer/left semi are
    exactly right-row-multiplication-safe; anti is excluded because a
    left row matches in its own salt slice only, which would fabricate
    anti matches.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"}
    if how.replace(" ", "_") not in allowed:
        raise ValueError(f"salted_join supports {sorted(allowed)}, not {how!r}")
    on = list(on)
    salted_left = left.withColumn(_SALT, F.floor(F.rand(seed=0x5A17) * salt).cast("int"))
    salted_right = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_left.join(salted_right, on + [_SALT], how).drop(_SALT)


def key_skew_stats(df: DataFrame, keys: Sequence[str], top: int = 10) -> DataFrame:
    """Per-key row counts with each key's share of the table — the
    measurement half of ``salted_join``: salt only when the histogram
    says so (top-key share ≫ 1/shuffle-partitions). One hash-groupBy
    (map-side partial combine), then the grand total rides a broadcast
    1-row aggregate OVER THE ALREADY-REDUCED counts, so the raw table
    is scanned exactly once. Returns the ``top`` heaviest keys,
    count-descending with the key as deterministic tiebreak."""
    keys = list(keys)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total").cast("double"), 6).alias("share"),
        )
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(top)
    )


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan —
    the metric the bucketing tests pin to zero. Uses the pre-execution
    plan; AQE can only remove exchanges at runtime, never add them, so
    this is an upper bound."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )
