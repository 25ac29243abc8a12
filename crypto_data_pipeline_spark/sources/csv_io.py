"""S5/S6: CSV source/sink with explicit schemas.

The reference checkpoints pandas frames to CSV
(notebooks/EDA.ipynb:1739 ``processed_crypto_data.csv``;
transform_data.ipynb cell 7 per-coin ``*_prediction_data.csv``) and
reloads with ``pd.read_csv`` + ``to_datetime``. Here: headered CSV
with an explicit StructType (inference would cost an extra pass and
guess types the pipeline depends on)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

PROCESSED_SCHEMA = T.StructType(
    [
        T.StructField("coin_id", T.StringType()),
        T.StructField("price_usd", T.DoubleType()),
        T.StructField("fetch_date", T.DateType()),
        T.StructField("pct_change", T.DoubleType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("month", T.IntegerType()),
        T.StructField("year_month", T.StringType()),
        T.StructField("risk_level", T.StringType()),
        T.StructField("rolling_7d_trend", T.DoubleType()),
        T.StructField("rolling_7d_variance", T.DoubleType()),
    ]
)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.option("header", True).mode(mode).csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.option("header", True).schema(schema).csv(path)
