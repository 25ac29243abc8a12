"""CDC merge: apply a change feed (upserts + delete tombstones) to a
keyed table in one shuffle.

The reference's loader only ever INSERT-or-UPDATEs (load_data.py:
66-102) — it has no delete path, so a coin delisted upstream lives in
the warehouse forever. A real change-data-capture feed carries an
operation column (insert/update/delete); the scalable merge is the
same union + last-write-wins window as `sources/upsert.py`, extended
with tombstone semantics: the NEWEST change per key decides, and if
that change is a delete the key disappears from the result. One
Exchange on the key, no per-row lookups, no second pass for deletes —
exactly how Delta/Hudi implement `MERGE ... WHEN MATCHED THEN DELETE`
under the hood.

Ordering contract: ties on ``order_by`` break toward the CHANGE side
(a change with the same timestamp as the base row it replaces must
win, or replayed feeds flap), then by the caller's tiebreak columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

OP_UPSERT = "U"
OP_DELETE = "D"


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order_by: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Merge ``changes`` (carrying ``op_col`` in {'U','D'}) into
    ``base`` (no op column): for each key, order base+changes by
    ``order_by`` DESC with changes outranking base on ties; keep the
    winner; drop keys whose winner is a delete. Returns the base
    schema (op column removed)."""
    out_cols = base.columns
    tagged_base = base.withColumn(op_col, F.lit(OP_UPSERT)).withColumn(
        "_is_change", F.lit(0)
    )
    tagged_changes = changes.select(*out_cols, op_col).withColumn(
        "_is_change", F.lit(1)
    )
    unioned = tagged_base.unionByName(tagged_changes)
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_by], F.col("_is_change").desc()
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col(op_col) != OP_DELETE))
        .select(*out_cols)
    )
