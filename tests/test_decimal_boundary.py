"""Decimal(24,8)-at-the-storage-boundary semantics (SURVEY §1.2/§7
risk 6).

The reference stores prices as NUMERIC(24,8) and reads them back into
float64 pandas frames (crypto_app/db.py:363-364 — `pd.read_sql` coerces
NUMERIC to double), so every analytic result downstream is double math
over a Decimal storage layer. This engine is double end-to-end for
analytics parity; these tests pin the boundary itself: a
DecimalType(24,8) column round-trips parquet exactly, its cast to
double is IEEE round-to-nearest, and Spark's cast agrees bit-for-bit
with DuckDB's on the same literals — so a Decimal-typed bronze layer
could be introduced without changing any analytic output.
"""

from __future__ import annotations

from decimal import Decimal

import duckdb
import pytest
from pyspark.sql import functions as F, types as T

# exercises: exact 2dp values, a .xx5 half case, full 8dp scale, the
# 17-significant-digit edge where double precision runs out, and the
# largest magnitude NUMERIC(24,8) can hold
LITERALS = [
    "0.10000000",
    "98.42500000",
    "12345.67891234",
    "9999999999999999.99999999",
    "1234567890123456.78901234",
    "0.00000001",
    "-42.00000001",
]


@pytest.fixture(scope="module")
def decimal_df(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(i, Decimal(s)) for i, s in enumerate(LITERALS)],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("price", T.DecimalType(24, 8)),
            ]
        ),
    )
    path = str(tmp_path_factory.mktemp("decimal") / "t.parquet")
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path), path


def test_decimal_parquet_roundtrip_is_exact(decimal_df):
    """Storage tier: parquet preserves DecimalType(24,8) losslessly —
    no double conversion happens until analytics asks for it."""
    df, _ = decimal_df
    assert df.schema["price"].dataType == T.DecimalType(24, 8)
    got = {r.id: r.price for r in df.collect()}
    for i, s in enumerate(LITERALS):
        assert got[i] == Decimal(s)  # exact decimal equality


def test_decimal_to_double_is_round_to_nearest(decimal_df):
    """Analytics tier: the Decimal→double cast is IEEE-754
    round-to-nearest — identical to Python's float(Decimal), which is
    what pd.read_sql produced in the reference."""
    df, _ = decimal_df
    got = {r.id: r.d for r in df.select("id", F.col("price").cast("double").alias("d")).collect()}
    for i, s in enumerate(LITERALS):
        assert got[i] == float(Decimal(s))


def test_decimal_to_double_matches_duckdb(decimal_df, spark):
    """Engine portability: Spark and DuckDB coerce the same
    DECIMAL(24,8) parquet column to bit-identical doubles, so a
    Decimal-typed bronze layer would not perturb the oracle gate."""
    df, path = decimal_df
    spark_vals = {
        r.id: r.d for r in df.select("id", F.col("price").cast("double").alias("d")).collect()
    }
    con = duckdb.connect()
    duck_vals = dict(
        con.execute(
            f"SELECT id, CAST(price AS DOUBLE) FROM read_parquet('{path}/*.parquet')"
        ).fetchall()
    )
    assert spark_vals == duck_vals  # bit-for-bit (dict equality on floats)
