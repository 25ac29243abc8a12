"""SQL frontend compatibility: run the reference's PostgreSQL files
verbatim on Spark (`pg_compat`)."""

from crypto_data_pipeline_spark.sql.pg_compat import (  # noqa: F401
    extract_named_query,
    register_reference_views,
    register_reference_views_from_bronze,
    run_named_reference_query,
    run_reference_sql,
    transpile_pg,
)
