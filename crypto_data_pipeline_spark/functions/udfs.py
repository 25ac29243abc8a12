"""Scalar and aggregate pandas UDFs — completing the §2.10 surface
(scalar UDF / UDAF / UDTF) with the Arrow-vectorized forms.

Position in the engine: every reference UDF pattern has a PREFERRED
zero-Python rewrite (U1 risk → window+max, U3 holidays → dim join,
F5 formatting → SQL CASE), and those rewrites are what the catalog
queries run. These vectorized twins exist because a real user WILL
have logic that genuinely cannot be expressed in SQL — and the
engine's contract for that case is: Arrow-batched pandas UDFs
(columnar transfer, ~10-100x over row-at-a-time Python), never plain
row-wise `F.udf`. Each twin is parity-pinned against its SQL rewrite
in tests/test_udf_surface.py, so the fallback provably computes the
same thing it replaces — including the fiddly parts (HALF_UP
rounding, Spark's shortest-repr double→string, SQL null-dropping
aggregate semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from functools import cache

from pyspark.sql.functions import pandas_udf


def _round2_half_up(s: pd.Series) -> pd.Series:
    # Spark F.round is HALF_UP; pandas .round is banker's — mirror Spark
    return np.floor(s * 100.0 + 0.5) / 100.0


# The factories are lazy (and cached) because @pandas_udf parses its
# DDL return type against the ACTIVE session — decorating at module
# import would require a SparkSession to exist before imports.


@cache
def format_market_cap_udf():
    """Scalar vectorized twin of `operators/islands.py
    format_market_cap` (F5, sql/analysis_queries.sql:74-78):
    ``round(x/1e12,2)||'T'`` at or above a trillion, else ``||'B'``,
    NULL passthrough. `str(float)` is shortest-repr, matching Spark's
    double→string cast in the formatter's value range. Whole-Series
    vectorized ops — no per-row Python calls inside the batch."""

    @pandas_udf("string")
    def _fmt(cap: pd.Series) -> pd.Series:
        is_t = cap >= 1e12
        out = pd.Series(index=cap.index, dtype="object")
        out[is_t] = _round2_half_up(cap[is_t] / 1e12).map(lambda v: f"{str(v)}T")
        is_b = cap.notna() & ~is_t
        out[is_b] = _round2_half_up(cap[is_b] / 1e9).map(lambda v: f"{str(v)}B")
        out[cap.isna()] = None
        return out

    return _fmt


@cache
def weighted_mean():
    """Grouped-aggregate (UDAF) form: Series→scalar pandas_udf, usable
    in groupBy().agg() and over windows. The SQL rewrite is
    sum(v*w)/sum(w); this is the documented shape for aggregate logic
    SQL can't express. NULL semantics match SQL: rows where EITHER
    side is null drop from both numerator and denominator; an
    all-null group aggregates to NULL."""

    @pandas_udf("double")
    def _wm(v: pd.Series, w: pd.Series) -> float:
        mask = v.notna() & w.notna()
        if not mask.any():
            return None
        den = float(w[mask].sum())
        if den == 0.0:
            return None
        return float((v[mask] * w[mask]).sum() / den)

    return _wm
