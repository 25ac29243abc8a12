"""Descriptive statistics operators (SURVEY.md §2.4 A7/A9/A13, §2.6).

pandas parity notes:
  * ``describe()`` std is SAMPLE std (ddof=1) → ``stddev_samp``.
  * ``describe()`` quantiles are exact linear-interpolated →
    ``percentile`` (exact), NOT ``percentile_approx`` (A7).
  * ``.corr()`` is sample Pearson → ``F.corr``.

Scale notes: exact percentiles require a sort per group — fine for the
per-entity groups here (bounded group size). For a 100 TB global
percentile, switch to ``percentile_approx`` with a tuned accuracy; the
API keeps both spellings adjacent so the trade-off is explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from crypto_data_pipeline_spark.operators.timeseries import ENTITY, PRICE


def describe_by_group(df: DataFrame, entity: str = ENTITY, value: str = PRICE) -> DataFrame:
    """A7: ``groupby(entity)[value].describe()`` (EDA.ipynb:416)."""
    v = F.col(value)
    return df.groupBy(entity).agg(
        F.count(v).alias("count"),
        F.avg(v).alias("mean"),
        F.stddev_samp(v).alias("std"),
        F.min(v).alias("min"),
        F.expr(f"percentile({value}, 0.25)").alias("p25"),
        F.expr(f"percentile({value}, 0.5)").alias("p50"),
        F.expr(f"percentile({value}, 0.75)").alias("p75"),
        F.max(v).alias("max"),
    )


def count_pivot(df: DataFrame, row_key: str, pivot_col: str, values: list[str]) -> DataFrame:
    """A9: ``groupby([k, c]).size().unstack()`` (EDA.ipynb:1378).

    ``values`` must be supplied explicitly: this keeps the output schema
    static (no eager distinct scan to discover pivot columns — an extra
    job at 100 TB) and deterministic. Missing combos are 0, matching
    ``unstack(fill_value=0)``."""
    out = df.groupBy(row_key).pivot(pivot_col, values).count()
    return out.na.fill(0, values)


def value_pivot(
    df: DataFrame, row_key: str, pivot_col: str, values: list, value_col: str, agg=None
) -> DataFrame:
    """A9, value form: ``pivot(index=row_key, columns=pivot_col,
    values=value_col)`` (EDA.ipynb:509 — fetch_date × coin_id price
    matrix). ``agg`` defaults to ``F.max``: pandas ``pivot`` requires
    unique (row, col) combos, under which first == max == the single
    value — and max is retry-deterministic where first is pick-any.
    Pass any other aggregate (``F.avg``, ``F.first``) for
    ``pivot_table`` semantics. Explicit ``values`` keep the schema
    static (no discovery job), as in ``count_pivot``."""
    agg = agg or F.max
    return df.groupBy(row_key).pivot(pivot_col, values).agg(agg(value_col))


def pairwise_corr(df: DataFrame, group: str, x: str, y: str) -> DataFrame:
    """A13: sample Pearson correlation per group
    (transform_data.ipynb:647)."""
    return df.groupBy(group).agg(F.corr(x, y).alias("corr"))
