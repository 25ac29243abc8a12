from crypto_data_pipeline_spark.plans.registry import QUERIES, QuerySpec, register

__all__ = ["QUERIES", "QuerySpec", "register"]
