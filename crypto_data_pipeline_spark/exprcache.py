"""Session-scoped memo for immutable Column expression fragments.

Round 13 (guide §1.2 step 2 — per-call fixed overhead): profiling the
bench steady rows showed several query walls dominated not by execution
but by *plan construction* — e.g. `dedup_minhash_lsh` spent 0.72s of
its 0.83s wall in py4j round trips re-building the identical 32-mask
minhash signature / band-struct expression trees on every call
(cProfile: >500 `send_command` round trips per call, ~1ms each).

A PySpark Column is an immutable expression tree over *named* column
references — the same object can be reused across any number of
DataFrames and queries (this is ordinary PySpark usage; nothing about a
Column binds it to a plan). What is NOT safe is reusing the underlying
py4j handle across JVM sessions, so the memo is keyed by
`applicationId` and entries from any other application are evicted on
first touch. This caches *unevaluated expression objects only* — never
DataFrames, never results; the produced plans are bit-identical to the
uncached construction (same expression tree handed to the analyzer).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Hashable

from pyspark.sql import Column

_CACHE: dict[tuple, Column] = {}


def _app_id() -> str | None:
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    return sc.applicationId if sc is not None else None


def memo_expr(key: tuple[Hashable, ...], build: Callable[[], Column]) -> Column:
    """Return the memoized Column for ``key`` (namespaced by the active
    application), building it with ``build()`` on first use. Stale
    entries from previous applications are dropped so handles never
    outlive their JVM."""
    import os

    if os.environ.get("SPARK_GRAFT_NO_EXPR_MEMO"):
        return build()
    app = _app_id()
    full = (app, *key)
    col = _CACHE.get(full)
    if col is None:
        for stale in [k for k in _CACHE if k[0] != app]:
            del _CACHE[stale]
        col = build()
        _CACHE[full] = col
    return col
