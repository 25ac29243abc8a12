"""Query registry: every implemented operator from SURVEY.md §2 is
registered here as (Spark callable, DuckDB oracle SQL) so the driver's
differential gate, the pytest suite, and bench.py all consume one list.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None → driver does rows-only check
    survey_ids: tuple[str, ...] = ()  # SURVEY.md §2 operator ids covered
    bench: bool = False  # include in bench.py headline suite


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    survey_ids: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, survey_ids=survey_ids, bench=bench)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every plan module so its @register calls run."""
    import crypto_data_pipeline_spark.plans.core_queries  # noqa: F401
    import crypto_data_pipeline_spark.plans.extension_queries  # noqa: F401
    import crypto_data_pipeline_spark.plans.io_queries  # noqa: F401

    return QUERIES
