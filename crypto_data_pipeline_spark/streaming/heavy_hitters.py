"""Custom stateful streaming operator: heavy-hitter tracking.

The streaming form of `operators/sketch.py:heavy_hitters_exact`'s
pass 1 — a Misra-Gries summary maintained CONTINUOUSLY over an
unbounded key stream, with bounded state, via
``applyInPandasWithState`` (the same API class as the sessionizer).

Sharding gives the distributed shape: each key hash-routes to exactly
ONE of ``n_shards`` state rows, so a shard's MG summary covers its
keys' ENTIRE substream and the classic bound applies per shard —
undercount <= N_shard/(capacity+1). Any key with global count
> N/(capacity+1) therefore survives its shard's summary (its full
count lives in one shard and N_shard <= N): the union of the latest
per-shard summaries is a certified candidate superset of every
stream-wide heavy hitter, at any point in the stream's life. State is
<= n_shards * capacity (key, count) pairs FOREVER — no watermark
needed to bound it, unlike the sessionizer.

Batch reuse: the per-batch merge is literally `sketch._mg_merge` (the
hypothesis-property-tested reduction), so streaming and batch prune
share one code path — the Lambda-architecture trap avoided again.

Emission is update-mode: every micro-batch that touches a shard emits
that shard's CURRENT summary; the latest emission per shard is the
live candidate set (see `latest_summaries`). An exact verify over the
landed raw stream (the batch operator's pass 2) turns candidates into
exact counts whenever a consumer needs them.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("k", StringType()),
        StructField("mg_count", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def _hh_fn(capacity: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        from crypto_data_pipeline_spark.operators.sketch import _mg_merge

        (shard,) = key
        if state.exists:
            keys, counts = state.get
            summary = pd.Series(list(counts), index=list(keys), dtype="int64")
        else:
            summary = pd.Series(dtype="int64")
        # concat the shard's whole micro-batch before ONE merge: chunked
        # merges would make the summary depend on Arrow chunk boundaries
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            summary = _mg_merge(summary, batch["k"], capacity)
        state.update((list(summary.index), [int(c) for c in summary.values]))
        # one NULL-key sentinel per emission: an EMPTY summary (MG
        # decrements can clear every counter) must still land a row,
        # or latest_summaries would resurrect the shard's previous
        # non-empty summary — "untouched this batch" and "emitted
        # empty" were indistinguishable in the store before this
        yield pd.DataFrame(
            {
                "shard": shard,
                "k": list(summary.index) + [None],
                "mg_count": [int(c) for c in summary.values] + [0],
            }
        )

    return fn


def heavy_hitter_stream(
    keyed: DataFrame, n_shards: int = 8, capacity: int = 64
) -> DataFrame:
    """(k string) stream -> per-shard MG summary emissions
    (streaming-only: Spark 4 removed batch-mode
    applyInPandasWithState; the batch prune is
    `sketch._misra_gries_candidates`, same `_mg_merge` core). The only
    shuffle is the groupBy(shard) the stateful operator needs anyway —
    n_shards bounded rows of state, kilobytes of emission per batch.

    NULL keys are dropped here, at the operator's own input: the
    emission protocol uses an in-band NULL-key sentinel row (see
    `_hh_fn`), so a caller's genuine NULL key would alias the sentinel
    and silently vanish from `latest_summaries`. A NULL is never a
    meaningful heavy-hitter key; excluding it is the operator's
    contract, not the caller's chore (round-8 fix — previously only
    the `stream_heavy_hitters` wrapper filtered)."""
    from crypto_data_pipeline_spark.operators.sketch import term_hash

    # portable char-fold shard hash (not xxhash64): the single-delivery
    # summary is then a deterministic function of the key multiset that
    # a DuckDB oracle can reproduce shard-for-shard
    sharded = keyed.where(F.col("k").isNotNull()).select(
        F.pmod(term_hash(F.col("k").cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        F.col("k").cast("string").alias("k"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _hh_fn(capacity),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_heavy_hitters(
    spark: SparkSession,
    bronze_dir: str,
    out_root: str,
    checkpoint_dir: str,
    schema,
    key_col: str,
    n_shards: int = 8,
    capacity: int = 64,
) -> StreamingQuery:
    """Wire the tracker to a file source: every micro-batch lands the
    emitted summaries as an immutable ``batch_id=N`` dir (at-least-once
    replay overwrites identically — the summary is a deterministic
    function of checkpointed state + batch). availableNow =
    catch-up-and-stop; state survives restarts via the checkpoint, so
    summaries keep their full-stream guarantee across runs."""
    stream = spark.readStream.schema(schema).parquet(bronze_dir)
    out = heavy_hitter_stream(
        stream.select(F.col(key_col).alias("k")).where(F.col("k").isNotNull()),
        n_shards,
        capacity,
    )

    def land(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("overwrite").parquet(f"{out_root}/batch_id={batch_id}")

    return (
        out.writeStream.foreachBatch(land)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def latest_summaries(spark: SparkSession, out_root: str) -> DataFrame:
    """The live candidate set: each shard's MOST RECENT emission (a
    shard absent from later batches kept its last summary — update
    semantics). The per-emission NULL-key sentinel row advances a
    shard's latest pointer even when its summary emptied, then drops
    out of the result. One aggregation over the kilobyte-sized
    summary store."""
    all_rows = spark.read.parquet(out_root)
    latest = all_rows.groupBy("shard").agg(F.max("batch_id").alias("batch_id"))
    return (
        all_rows.join(F.broadcast(latest), ["shard", "batch_id"])
        .where(F.col("k").isNotNull())
        .drop("batch_id")
    )
