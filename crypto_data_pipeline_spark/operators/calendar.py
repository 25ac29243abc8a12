"""Calendar / holiday feature operators (SURVEY.md §2.8 F8-F11, J4).

Parity traps (SURVEY §7 risk 2), handled explicitly:
  * pandas ``dt.dayofweek`` is Monday=0; Spark ``dayofweek`` is
    Sunday=1 → ``(dayofweek(d)+5) % 7``.
  * Day names must be the literal Spanish strings the reference emits
    (transform_data.ipynb:531-532) — a ``when`` chain, never locale
    ``date_format``.
  * ``isocalendar().week`` is ISO — Spark ``weekofyear`` matches.

The reference flags holidays with a row-wise ``apply(lambda d: d in
holidays.US())`` (transform_data.ipynb:556-564) — a per-row Python
call. Here the holiday calendars are tiny generated dimension tables
broadcast-joined against the fact (J4): zero Python in the hot path,
and at 100 TB the join is a broadcast hash probe inside codegen.

Holiday dates are the standard US federal / Chinese public holiday
calendars for 2024-2025 (public knowledge, same dates the ``holidays``
PyPI package yields), pinned as literals for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from crypto_data_pipeline_spark.operators.timeseries import DATE, ENTITY

# Monday=0 .. Sunday=6, matching pandas dt.dayofweek
SPANISH_DAY_NAMES = ["Lunes", "Martes", "Miércoles", "Jueves", "Viernes", "Sábado", "Domingo"]

US_HOLIDAYS = [
    "2024-01-01", "2024-01-15", "2024-02-19", "2024-05-27", "2024-06-19",
    "2024-07-04", "2024-09-02", "2024-10-14", "2024-11-11", "2024-11-28",
    "2024-12-25",
    "2025-01-01", "2025-01-20", "2025-02-17", "2025-05-26", "2025-06-19",
    "2025-07-04", "2025-09-01", "2025-10-13", "2025-11-11", "2025-11-27",
    "2025-12-25",
]

# Matches the ``holidays.China()`` calendar the reference applies
# (transform_data.ipynb:560-561): STATUTORY holiday days are kept
# whatever weekday they fall on (Spring Festival 2024 spans its
# weekends), substituted weekday days-off are included (2024-10-04/07,
# 2025-05-02/05), and plain weekend days that merely sit inside a
# golden week without being statutory or substituted are NOT holidays
# (2024-10-05/06, 2025-02-01/02). Every date inside the reference
# corpus span (2024-09 .. 2025-05) is pinned row-level by
# tests/test_real_reference_data.py against the published
# <coin>_prediction_data.csv is_china_holiday column; entries outside
# that span follow the same rule but have no published pin.
CN_HOLIDAYS = [
    "2024-01-01", "2024-02-10", "2024-02-11", "2024-02-12", "2024-02-13",
    "2024-02-14", "2024-02-15", "2024-02-16", "2024-02-17", "2024-04-04",
    "2024-05-01", "2024-06-10", "2024-09-16", "2024-09-17", "2024-10-01",
    "2024-10-02", "2024-10-03", "2024-10-04", "2024-10-07",
    "2025-01-01", "2025-01-28", "2025-01-29", "2025-01-30", "2025-01-31",
    "2025-02-03", "2025-02-04", "2025-04-04",
    "2025-05-01", "2025-05-02", "2025-05-05", "2025-06-02", "2025-10-01",
    "2025-10-02", "2025-10-03", "2025-10-06", "2025-10-07", "2025-10-08",
]


def with_calendar_features(df: DataFrame, date: str = DATE) -> DataFrame:
    """F8-F11: day_of_week (Mon=0), Spanish day_name, is_weekend,
    ISO week_of_year, day_of_month, quarter, day_of_year, year_month."""
    d = F.col(date)
    dow = ((F.dayofweek(d) + 5) % 7).cast("int")
    day_name = F.when(dow == 0, SPANISH_DAY_NAMES[0])
    for i in range(1, 7):
        day_name = day_name.when(dow == i, SPANISH_DAY_NAMES[i])
    return (
        df.withColumn("day_of_week", dow)
        .withColumn("day_name", day_name)
        .withColumn("is_weekend", dow.isin(5, 6).cast("int"))
        .withColumn("week_of_year", F.weekofyear(d).cast("int"))
        .withColumn("day_of_month", F.dayofmonth(d).cast("int"))
        .withColumn("quarter", F.quarter(d).cast("int"))
        .withColumn("day_of_year", F.dayofyear(d).cast("int"))
        .withColumn("year_month", F.date_format(d, "yyyy-MM"))
    )


def holiday_dim(spark: SparkSession) -> DataFrame:
    """Generated holiday dimension: (holiday_date, is_us, is_cn).

    Built as a JVM literal-array explode, NOT ``createDataFrame`` over
    Python rows (round 13, guide §4.1): a Python-list frame plans as a
    Python-backed ``Scan ExistingRDD``, so every broadcast build that
    consumes this dim spawned a Python worker wave per call — measured
    19.5 CPU-s per calendar_features call at sf0.1 for three 59-row
    broadcasts, vs ~2 for the literal plan. Same rows, same types."""
    rows = sorted(set(US_HOLIDAYS) | set(CN_HOLIDAYS))
    us, cn = set(US_HOLIDAYS), set(CN_HOLIDAYS)
    entries = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.lit(int(d in us)).alias("is_us"),
                F.lit(int(d in cn)).alias("is_cn"),
            )
            for d in rows
        ]
    )
    return (
        spark.range(1)
        .select(F.explode(entries).alias("h"))
        .select(
            F.to_date("h.d").alias("holiday_date"),
            F.col("h.is_us").alias("is_us"),
            F.col("h.is_cn").alias("is_cn"),
        )
    )


def with_holiday_flags(df: DataFrame, spark: SparkSession, date: str = DATE) -> DataFrame:
    """J4/U3: broadcast dim join replacing the reference's row-wise
    ``d in holidays.US()`` apply. Pre-holiday joins on date+1
    (transform_data.ipynb:556-564)."""
    dim = F.broadcast(holiday_dim(spark))
    d = F.col(date)
    us = dim.select(F.col("holiday_date").alias("_us_d")).where("is_us = 1")
    cn = dim.select(F.col("holiday_date").alias("_cn_d")).where("is_cn = 1")
    pre = dim.select(F.col("holiday_date").alias("_pre_d")).where("is_us = 1")
    return (
        df.join(F.broadcast(us), d == F.col("_us_d"), "left")
        .join(F.broadcast(cn), d == F.col("_cn_d"), "left")
        .join(F.broadcast(pre), F.date_add(d, 1) == F.col("_pre_d"), "left")
        .withColumn("is_us_holiday", F.col("_us_d").isNotNull().cast("int"))
        .withColumn("is_china_holiday", F.col("_cn_d").isNotNull().cast("int"))
        .withColumn("is_pre_us_holiday", F.col("_pre_d").isNotNull().cast("int"))
        .drop("_us_d", "_cn_d", "_pre_d")
    )


def us_holiday_sql_list() -> str:
    return ", ".join(f"DATE '{d}'" for d in US_HOLIDAYS)


def cn_holiday_sql_list() -> str:
    return ", ".join(f"DATE '{d}'" for d in CN_HOLIDAYS)
