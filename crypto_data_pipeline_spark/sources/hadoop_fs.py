"""One shared handle for the Hadoop FileSystem API — generations,
quarantine retention, compaction stats, and the upsert existence probe
all need (jvm, fs, path); keeping the py4j dance in one place means a
future conf/scheme fix lands once, not in four copies."""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_fs(spark: SparkSession, path: str):
    """(jvm, fs, hadoop_path) for ``path`` under the session's Hadoop
    configuration — works on any Spark-supported filesystem."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return jvm, fs, hpath
