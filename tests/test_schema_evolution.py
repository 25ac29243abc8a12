"""Schema evolution on the at-rest layout: a 100 TB corpus is written
over months by evolving jobs, so the reader must (a) union columns
across file generations with nulls for the missing ones, and (b) fail
LOUDLY, not coerce silently, when two generations disagree on a
column's type."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def test_merge_schema_unions_generations(spark, tmp_path):
    root = str(tmp_path / "docs")
    v1 = spark.createDataFrame([(1, "alpha"), (2, "beta")], ["doc_id", "text"])
    v1.write.parquet(root + "/gen=1")
    v2 = spark.createDataFrame(
        [(3, "gamma", 0.9), (4, "delta", 0.2)], ["doc_id", "text", "quality"]
    )
    v2.write.parquet(root + "/gen=2")

    merged = spark.read.option("mergeSchema", True).parquet(root)
    assert set(merged.columns) == {"doc_id", "text", "quality", "gen"}
    rows = {r.doc_id: r for r in merged.collect()}
    assert rows[1].quality is None  # old generation reads as null
    assert rows[3].quality == 0.9
    # filters still push down across generations
    plan = (
        merged.where(F.col("doc_id") > 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,2)]" in plan


def test_conflicting_types_fail_loudly(spark, tmp_path):
    root = str(tmp_path / "docs")
    spark.createDataFrame([(1, 10)], ["doc_id", "score"]).write.parquet(root + "/gen=1")
    spark.createDataFrame([(2, "high")], ["doc_id", "score"]).write.parquet(root + "/gen=2")
    with pytest.raises(Exception) as ei:
        spark.read.option("mergeSchema", True).parquet(root).collect()
    assert "merge" in str(ei.value).lower() or isinstance(ei.value, AnalysisException)
