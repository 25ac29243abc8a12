"""Slowly-changing-dimension (type 2) history construction.

The reference keeps only the LATEST row per (coin, day) via its keyed
upsert (`load_data.py:66-102`) — overwriting history. A 100 TB
lakehouse usually wants the opposite: collapse a daily snapshot series
into *versioned validity intervals* (valid_from / valid_to /
is_current) that record every change of the tracked attributes and
nothing else. This is the standard SCD-2 build, expressed as pure
windows + one aggregation:

    1. per key, order by the snapshot column; a row opens a new
       version when ANY tracked column IS DISTINCT FROM its
       predecessor (null-safe, first row always opens);
    2. version = running sum of the open flags;
    3. collapse each (key, version) run to one interval row;
    4. valid_to = next version's valid_from (NULL = current).

Scale shape: ONE shuffle on the key. The groupBy on (key, version)
and the lead() over versions both re-use the key partitioning —
HashPartitioning(key) satisfies the clustered distribution of any
superset grouping — so steps 2–4 add sorts but no Exchange. Intervals
out ≪ snapshots in, so the result is the cheap side of every
downstream as-of join (operators/asof.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["scd2_intervals"]


def scd2_intervals(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tracked: list[str],
) -> DataFrame:
    """Collapse a per-key snapshot series into SCD-2 validity
    intervals over the `tracked` columns.

    Returns one row per unbroken run of identical tracked values:
    ``keys..., version, tracked..., valid_from, valid_to, last_seen,
    n_rows, is_current``. `order_col` must be unique per key (it is
    the snapshot timestamp); ties would make the interval bounds
    nondeterministic.
    """
    if not tracked:
        raise ValueError(
            "scd2_intervals needs at least one tracked column — with "
            "nothing tracked there are no change boundaries to build "
            "intervals from"
        )
    w = Window.partitionBy(*keys).orderBy(order_col)
    changed: Column = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.lag(c).over(w)) for c in tracked],
    )
    opens = F.when((F.row_number().over(w) == 1) | changed, 1).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    versioned = df.withColumn("version", F.sum(opens).over(wrun))

    grouped = versioned.groupBy(*keys, "version").agg(
        *[F.min(c).alias(c) for c in tracked],  # constant within a run
        F.min(order_col).alias("valid_from"),
        F.max(order_col).alias("last_seen"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    wv = Window.partitionBy(*keys).orderBy("version")
    valid_to = F.lead("valid_from").over(wv)
    return grouped.select(
        *keys,
        "version",
        *tracked,
        "valid_from",
        valid_to.alias("valid_to"),
        "last_seen",
        "n_rows",
        valid_to.isNull().cast("int").alias("is_current"),
    )
