"""Declarative data-quality expectations — the data-contract gate a
100 TB ingest runs before publishing a table.

The reference validates nothing on load (`load_data.py` inserts
whatever the API returned; a null price or duplicated (coin, date)
silently lands). Here, a table's contract is a list of declarative
expectations; the whole battery evaluates in ONE scan:

  * row-level rules (not_null / value range / set membership / regex)
    compile to conditional-count aggregate expressions — one pass,
    zero Python, map-side partial aggregation;
  * `unique` compiles to count(*) - count(DISTINCT cols) in the same
    aggregate (Catalyst plans multi-distinct via Expand, still one
    scan of the input);
  * `foreign_key` is the one relational rule: a broadcast left-anti
    count against the (small) dimension key set.

The report is one row per expectation — (expectation, kind,
n_checked, n_violations, passed) — so the gate is a trivial
`report.where(~passed)` and policy (fail / warn / quarantine) stays
with the caller. `enforce()` implements fail-fast.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    kind: str  # not_null | in_range | in_set | matches | unique | foreign_key
    cols: tuple[str, ...]
    params: tuple = field(default_factory=tuple)


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null({col})", "not_null", (col,))


def in_range(col: str, lo: float, hi: float) -> Expectation:
    """Violated when a NON-NULL value falls outside [lo, hi] — pair
    with not_null to also forbid nulls."""
    return Expectation(f"in_range({col},{lo},{hi})", "in_range", (col,), (lo, hi))


def in_set(col: str, allowed: tuple) -> Expectation:
    return Expectation(f"in_set({col})", "in_set", (col,), tuple(allowed))


def matches(col: str, regex: str) -> Expectation:
    return Expectation(f"matches({col})", "matches", (col,), (regex,))


def unique(*cols: str) -> Expectation:
    """Standard-SQL UNIQUE semantics: rows where ANY key column is
    NULL neither violate nor count (SQL UNIQUE admits multiple
    NULLs); violations = non-null-key rows minus their distinct key
    count."""
    return Expectation(f"unique({','.join(cols)})", "unique", tuple(cols))


def foreign_key(col: str, dim: DataFrame, dim_key: str) -> Expectation:
    """Every non-null value of ``col`` must exist in ``dim[dim_key]``."""
    return Expectation(f"foreign_key({col})", "foreign_key", (col,), (dim, dim_key))


def _violation_expr(e: Expectation) -> Column:
    c = F.col(e.cols[0])
    if e.kind == "not_null":
        return c.isNull().cast("long")
    if e.kind == "in_range":
        lo, hi = e.params
        return (c.isNotNull() & ((c < lo) | (c > hi))).cast("long")
    if e.kind == "in_set":
        return (c.isNotNull() & ~c.isin(list(e.params))).cast("long")
    if e.kind == "matches":
        return (c.isNotNull() & ~c.rlike(e.params[0])).cast("long")
    raise ValueError(f"not a row-level expectation: {e.kind}")


REPORT_SCHEMA = (
    "expectation string, kind string, n_checked bigint, n_violations bigint, passed boolean"
)


def check(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate the contract. All row-level + unique rules share one
    aggregate over one scan; each foreign_key adds one broadcast
    anti-join count. Returns the per-expectation report frame."""
    spark = df.sparkSession
    row_level = [e for e in expectations if e.kind not in ("unique", "foreign_key")]
    uniques = [e for e in expectations if e.kind == "unique"]
    fks = [e for e in expectations if e.kind == "foreign_key"]

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, e in enumerate(row_level):
        aggs.append(F.sum(_violation_expr(e)).alias(f"__v{i}"))
    for i, e in enumerate(uniques):
        # NULL-key rows are excluded from BOTH counts (standard-SQL
        # UNIQUE): the struct is nulled unless every key col is set,
        # and count/count_distinct both skip null inputs.
        nn = F.lit(True)
        for c in e.cols:
            nn = nn & F.col(c).isNotNull()
        key = F.when(nn, F.struct(*[F.col(c) for c in e.cols]))
        aggs.append((F.count(key) - F.count_distinct(key)).alias(f"__u{i}"))
    for i, e in enumerate(fks):
        # the FK's checked-row count rides the same single scan; only
        # the membership anti-join needs its own pass below
        aggs.append(F.count(F.col(e.cols[0])).alias(f"__fk{i}"))
    wide = df.agg(*aggs)

    # unpivot the 1-row wide aggregate into the report rows via stack()
    parts = []
    for i, e in enumerate(row_level):
        parts.append((e, f"__v{i}"))
    for i, e in enumerate(uniques):
        parts.append((e, f"__u{i}"))
    if parts:
        stack_args = ", ".join(
            f"'{e.name}', '{e.kind}', cast(coalesce({slot}, 0) as bigint)" for e, slot in parts
        )
        report = wide.selectExpr(
            f"stack({len(parts)}, {stack_args}) as (expectation, kind, n_violations)",
            "__n as n_checked",
        ).select(
            "expectation",
            "kind",
            F.col("n_checked").cast("long"),
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
    else:
        report = spark.createDataFrame([], REPORT_SCHEMA)

    if fks:
        # one JVM literal frame for ALL fk rows (round 13, guide §4.1):
        # the per-fk createDataFrame unioned Python-backed scans into
        # the report, paying a Python-worker wave per fk per action
        from crypto_data_pipeline_spark.sources.tables import literal_frame

        wide_row = wide.collect()[0]
        fk_rows = []
        for i, e in enumerate(fks):
            dim, dim_key = e.params
            col = e.cols[0]
            missing = (
                df.select(F.col(col)).where(F.col(col).isNotNull())
                .join(
                    F.broadcast(dim.select(F.col(dim_key).alias(col)).distinct()),
                    col,
                    "left_anti",
                )
            )
            n_checked = int(wide_row[f"__fk{i}"] or 0)
            n_viol = missing.count()
            fk_rows.append((e.name, e.kind, n_checked, n_viol, n_viol == 0))
        report = report.unionByName(
            literal_frame(
                spark, fk_rows,
                "expectation string, kind string, n_checked long, "
                "n_violations long, passed boolean",
            )
        )
    return report


def enforce(df: DataFrame, expectations: list[Expectation]) -> None:
    """Fail-fast policy: raise with the violating rules if any
    expectation fails — the CI gate form."""
    failed = [r for r in check(df, expectations).collect() if not r.passed]
    if failed:
        detail = ", ".join(f"{r.expectation}={r.n_violations}" for r in failed)
        raise ValueError(f"data contract violated: {detail}")


def split_by_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Row-level quarantine policy: (clean, violating) where a row is
    violating if it breaks ANY of the row-level rules (unique /
    foreign_key are table-level — use `check` for those). One
    predicate over one scan for each side; pair the violating side
    with `sources/quarantine.write_quarantine` for the dead-letter
    flow. Mirrors the JSON-parse quarantine split: bad rows keep every
    column for replay after the contract (or the producer) is fixed."""
    row_level = [e for e in expectations if e.kind not in ("unique", "foreign_key")]
    if not row_level:
        raise ValueError("split_by_expectations needs at least one row-level rule")
    bad = None
    for e in row_level:
        expr = _violation_expr(e) == 1
        bad = expr if bad is None else (bad | expr)
    return df.where(~bad), df.where(bad)
