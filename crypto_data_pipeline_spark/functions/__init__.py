"""User-defined function surface (SURVEY §2.10): the preferred path is
always a pure-SQL/window rewrite (U1-U3), but every vectorized form a
user might need is real and parity-pinned — scalar pandas UDF, grouped
aggregate (UDAF), and a table function (UDTF) consumed via LATERAL."""

from crypto_data_pipeline_spark.functions.udfs import (
    format_market_cap_udf,
    weighted_mean,
)
from crypto_data_pipeline_spark.functions.udtfs import ChunkToksUDTF, register_udtfs

__all__ = ["ChunkToksUDTF", "format_market_cap_udf", "register_udtfs", "weighted_mean"]
