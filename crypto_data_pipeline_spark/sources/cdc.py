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


def maintain_group_aggregate(
    agg: DataFrame,
    changes: DataFrame,
    group_col: str,
    value_col: str,
    cnt_col: str = "n_rows",
    sum_col: str = "total",
    op_col: str = "op",
    prev_group_col: str | None = None,
    prev_value_col: str | None = None,
) -> DataFrame:
    """Incremental view maintenance of a COUNT/SUM group aggregate
    under a CDC feed carrying BEFORE-images (the Debezium envelope:
    insert = after only, update = before+after, delete = before only).
    Per feed row the delta algebra is textbook IVM (Gupta & Mumick):

      * op U with NULL before  -> +1/+value to the new group
      * op U with a before     -> -1/-prev to the old group AND
                                  +1/+value to the new one (group
                                  moves handled by construction)
      * op D                   -> -1/-prev to the old group

    The BASE FACT TABLE IS NEVER TOUCHED — that is the entire point:
    deltas aggregate map-side to <= |groups| rows, then one outer
    merge against the (gold-sized) aggregate table applies them;
    groups whose count reaches zero disappear. SUM stays exact under
    retraction because the operator contract takes an INTEGER value
    column (store cents, not dollars) — float retraction would be
    order-dependent and unauditable."""
    prev_group_col = prev_group_col or f"prev_{group_col}"
    prev_value_col = prev_value_col or f"prev_{value_col}"

    plus = changes.where(F.col(op_col) != OP_DELETE).select(
        F.col(group_col).alias("_g"),
        F.lit(1).cast("long").alias("_dc"),
        F.col(value_col).cast("long").alias("_dv"),
    )
    minus = changes.where(F.col(prev_group_col).isNotNull()).select(
        F.col(prev_group_col).alias("_g"),
        F.lit(-1).cast("long").alias("_dc"),
        (-F.col(prev_value_col).cast("long")).alias("_dv"),
    )
    deltas = (
        plus.unionByName(minus)
        .groupBy("_g")
        .agg(F.sum("_dc").alias("_dc"), F.sum("_dv").alias("_dv"))
    )
    zero = F.lit(0).cast("long")
    merged = agg.join(deltas, agg[group_col] == deltas["_g"], "full_outer").select(
        F.coalesce(agg[group_col], F.col("_g")).alias(group_col),
        (F.coalesce(F.col(cnt_col), zero) + F.coalesce(F.col("_dc"), zero)).alias(cnt_col),
        (F.coalesce(F.col(sum_col), zero) + F.coalesce(F.col("_dv"), zero)).alias(sum_col),
    )
    # Drop a group only when BOTH stats are zero. For an in-order feed
    # count==0 implies sum==0 (no live rows), so this is identical to
    # the plain count filter there — but under BACKFILL (whole
    # deliveries applied out of order) a cross-delivery value update
    # can transiently leave count==0 with sum!=0; dropping that row
    # would lose the sum mass forever and break the any-order
    # convergence the delta algebra otherwise guarantees
    # (tests/test_sources_streaming.py property test).
    return merged.where((F.col(cnt_col) != 0) | (F.col(sum_col) != 0))
