"""The reference's users execute sql/analysis_queries.sql against
PostgreSQL; these tests prove that file runs VERBATIM through the
pg_compat frontend and reproduces the engine's own DataFrame results
row for row (same Spark session — exact comparison, no tolerance)."""

from __future__ import annotations

import pytest

from crypto_data_pipeline_spark.sql import pg_compat


def test_json_operator_rewrite():
    got = pg_compat._rewrite_json_ops(
        "SELECT (response_data->'market_data'->'market_cap'->>'usd') FROM t"
    )
    assert (
        "get_json_object(response_data, '$.market_data.market_cap.usd')" in got
    )


def test_cast_rewrite_parenthesized_and_bare():
    assert (
        pg_compat._rewrite_casts("SELECT (a + b)::numeric FROM t")
        == "SELECT CAST(a + b AS DOUBLE) FROM t"
    )
    assert (
        pg_compat._rewrite_casts("SELECT x::int FROM t")
        == "SELECT CAST(x AS INT) FROM t"
    )


def test_round_avg_nudge_targets_only_aggregates():
    got = pg_compat._rewrite_round_avg(
        "SELECT ROUND(AVG(x), 2), ROUND(y / 1e12, 2) FROM t"
    )
    assert "ROUND(1e-9 + AVG(x), 2)" in got
    assert "ROUND(y / 1e12, 2)" in got  # exact-input round untouched


def test_distinct_on_rewrite_and_guard():
    got = pg_compat._rewrite_distinct_on(
        "WITH c AS (SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, d DESC) "
        "SELECT * FROM c"
    )
    assert "row_number() OVER (PARTITION BY k ORDER BY d DESC)" in got
    assert "__pg_rn = 1" in got
    with pytest.raises(ValueError, match="ORDER BY prefix"):
        pg_compat._rewrite_distinct_on(
            "WITH c AS (SELECT DISTINCT ON (k) k, v FROM t ORDER BY d DESC) "
            "SELECT * FROM c"
        )
    # top-level DISTINCT ON: PostgreSQL guarantees result order the
    # rewrite can't preserve — must refuse, not silently reorder
    with pytest.raises(ValueError, match="top-level DISTINCT ON"):
        pg_compat._rewrite_distinct_on(
            "SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, d DESC"
        )


def test_cast_rewrite_refuses_unknown_types_and_respects_literals():
    # '::interval' must not be silently corrupted into CAST(... AS INT)
    with pytest.raises(ValueError, match="unsupported ::cast"):
        pg_compat._rewrite_casts("SELECT ts::interval FROM t")
    with pytest.raises(ValueError, match="unsupported ::cast"):
        pg_compat._rewrite_casts("SELECT x::float4 FROM t")
    # ')' inside a string literal must not derail the back-scan
    got = pg_compat._rewrite_casts("SELECT (replace(x, ')', ''))::numeric FROM t")
    assert got == "SELECT CAST(replace(x, ')', '') AS DOUBLE) FROM t"


def test_inline_comments_stripped_before_splitting():
    stmts = pg_compat.split_statements(
        pg_compat._strip_comments(
            "SELECT 1 AS x -- don't split; here\n;SELECT 2"
        )
    )
    assert stmts == ["SELECT 1 AS x", "SELECT 2"]


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_reference_file_reproduces_engine_results(spark, sf_dir):
    """Both statements of the verbatim reference file == the engine's
    monthly_avg_price / drop_recovery catalog queries."""
    from crypto_data_pipeline_spark.plans.registry import load_with_extras

    specs = load_with_extras()
    q1, q2 = pg_compat.run_reference_sql(spark, sf_dir)

    eng1 = specs["monthly_avg_price"].fn(spark, sf_dir)
    assert _rows(q1, ["coin_id", "year", "month", "avg_price_usd"]) == _rows(
        eng1, ["entity_id", "year", "month", "avg_price"]
    )

    eng2 = specs["drop_recovery"].fn(spark, sf_dir)
    assert _rows(
        q2, ["coin_id", "avg_price_increase_pct", "current_market_cap_usd"]
    ) == _rows(
        eng2, ["entity_id", "avg_price_increase_pct", "market_cap_formatted"]
    )
