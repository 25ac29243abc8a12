"""A10: per-(entity, month) risk classification (EDA.ipynb:1192-1226).

Reference semantics, replicated exactly:
  within each (coin, year_month) group ordered by date, look at every
  pair of CONSECUTIVE days (the lead stays inside the month group, as
  pandas groupby().apply() does); compound two-day return
  ``(1+d1)*(1+d2)-1``; the month is High Risk if any pair <= -50%,
  Medium Risk if any pair <= -20%, else Low Risk.

The reference runs a Python ``groupby().apply(calculate_risk_level)``
(U1); here it is a pure window + grouped-max aggregate — JVM codegen,
one shuffle on (entity, year_month), then a broadcast join back (J3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from crypto_data_pipeline_spark.operators.timeseries import DATE, ENTITY


def risk_levels(df: DataFrame, entity: str = ENTITY, date: str = DATE) -> DataFrame:
    """(entity, year_month) → risk_level. Expects ``pct_change`` and
    ``year_month`` columns present."""
    w = Window.partitionBy(entity, "year_month").orderBy(date)
    d1 = F.col("pct_change") / 100
    d2 = F.lead(F.col("pct_change"), 1).over(w) / 100
    compound = (1 + d1) * (1 + d2) - 1
    severity = F.when(compound <= -0.5, 2).when(compound <= -0.2, 1).otherwise(0)
    return (
        df.select(entity, "year_month", severity.alias("_sev"))
        .groupBy(entity, "year_month")
        .agg(F.max("_sev").alias("_max_sev"))
        .select(
            entity,
            "year_month",
            F.when(F.col("_max_sev") == 2, "High Risk")
            .when(F.col("_max_sev") == 1, "Medium Risk")
            .otherwise("Low Risk")
            .alias("risk_level"),
        )
    )


def with_risk_level(df: DataFrame, entity: str = ENTITY, date: str = DATE) -> DataFrame:
    """J3: left join the month-level labels back onto the daily frame
    (EDA.ipynb:1371). The label side is one row per entity-month —
    smaller than the daily frame but ENTITY-PROPORTIONAL, so the
    strategy is left to AQE (broadcast at fixture scale, sort-merge
    when 100M entities would OOM a forced build side)."""
    return df.join(risk_levels(df, entity, date), [entity, "year_month"], "left")


def risk_levels_pandas(df: DataFrame, entity: str = ENTITY, date: str = DATE) -> DataFrame:
    """The documented exact-parity FALLBACK for U1 (SURVEY §2.10): the
    reference's ``groupby().apply(calculate_risk_level)`` literally,
    as an Arrow-batched ``applyInPandas`` over the same (entity,
    year_month) grouping. Exists for callers whose group logic
    genuinely cannot be expressed in SQL — for this one it CAN, so
    `risk_levels` (window + grouped max, pure codegen) is the hot
    path; tests/test_pandas_parity.py pins that both produce
    identical labels. Scale: same one shuffle on the group key, but
    each group crosses the JVM→Python Arrow boundary — fine for
    month-sized groups, dominated by codegen at 100 TB."""
    import pandas as pd

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(date)
        d = g["pct_change"].to_numpy() / 100.0
        level = "Low Risk"
        for i in range(len(d) - 1):
            compound = (1 + d[i]) * (1 + d[i + 1]) - 1
            if compound <= -0.5:
                level = "High Risk"
                break
            if compound <= -0.2:
                level = "Medium Risk"
        return pd.DataFrame(
            {
                entity: [g[entity].iloc[0]],
                "year_month": [g["year_month"].iloc[0]],
                "risk_level": [level],
            }
        )

    ent_type = df.schema[entity].dataType.simpleString()
    return df.select(entity, "year_month", date, "pct_change").groupBy(
        entity, "year_month"
    ).applyInPandas(
        classify, f"{entity} {ent_type}, year_month string, risk_level string"
    )
