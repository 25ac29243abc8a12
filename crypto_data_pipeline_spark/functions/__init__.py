"""User-defined function surface (SURVEY §2.10): the preferred path is
always a pure-SQL/window rewrite (U1-U3), but the reference's
"returns an augmented frame" pattern is also exposed as a real Spark
Python UDTF for callers who need imperative per-row expansion."""

from crypto_data_pipeline_spark.functions.udtfs import ChunkToksUDTF, register_udtfs

__all__ = ["ChunkToksUDTF", "register_udtfs"]
