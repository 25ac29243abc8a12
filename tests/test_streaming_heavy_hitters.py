"""Stateful streaming heavy-hitter tracker (streaming/heavy_hitters.py):
the per-shard Misra-Gries summaries must keep their certified-superset
guarantee over the WHOLE stream, across micro-batches AND across
checkpointed restarts, with state bounded by n_shards * capacity."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F, types as T

from crypto_data_pipeline_spark.streaming import heavy_hitters as hh
import pytest

SCHEMA = T.StructType([T.StructField("t", T.StringType(), True)])


def _tokens(spark, toks):
    return spark.createDataFrame([(t,) for t in toks], SCHEMA)


def test_single_delivery_matches_mg_merge_directly(spark, tmp_path):
    """One delivery (one micro-batch, empty initial state): the emitted
    summaries must equal running the pandas reduction per shard."""
    import pandas as pd

    from crypto_data_pipeline_spark.operators.sketch import _mg_merge

    toks = ["hot"] * 50 + [f"tail{i}" for i in range(300)] + ["warm"] * 20
    bronze = str(tmp_path / "bronze")
    out = str(tmp_path / "hh")
    _tokens(spark, toks).coalesce(1).write.parquet(bronze)
    q = hh.stream_heavy_hitters(
        spark, bronze, out, str(tmp_path / "ckpt"), SCHEMA, "t",
        n_shards=4, capacity=16,
    )
    q.awaitTermination()
    got = {
        (r["shard"], r["k"]): r["mg_count"]
        for r in hh.latest_summaries(spark, out).collect()
    }

    from crypto_data_pipeline_spark.operators.sketch import term_hash

    shard_of = {
        r["k"]: r["shard"]
        for r in _tokens(spark, toks).select(
            F.col("t").alias("k"),
            F.pmod(term_hash(F.col("t")), F.lit(4)).cast("int").alias("shard"),
        ).collect()
    }
    expect: dict[tuple, int] = {}
    for s in range(4):
        sub = pd.Series([t for t in toks if shard_of[t] == s])
        if len(sub):
            summary = _mg_merge(pd.Series(dtype="int64"), sub, 16)
            for k, c in summary.items():
                expect[(s, k)] = int(c)
    assert got == expect


def test_streaming_guarantee_across_restarts(spark, tmp_path):
    """Two deliveries via two checkpointed runs: after the second run,
    the latest per-shard summaries contain every token whose FULL
    stream count exceeds N/(capacity+1), counts never overestimate,
    and every shard's summary respects the capacity bound."""
    bronze = str(tmp_path / "bronze")
    out = str(tmp_path / "hh")
    ckpt = str(tmp_path / "ckpt")
    cap, shards = 8, 4

    d1 = ["alpha"] * 30 + [f"noise{i}" for i in range(120)]
    d2 = ["alpha"] * 30 + ["beta"] * 45 + [f"junk{i}" for i in range(80)]

    _tokens(spark, d1).write.parquet(bronze)
    q = hh.stream_heavy_hitters(spark, bronze, out, ckpt, SCHEMA, "t",
                                n_shards=shards, capacity=cap)
    q.awaitTermination()
    _tokens(spark, d2).write.mode("append").parquet(bronze)
    q = hh.stream_heavy_hitters(spark, bronze, out, ckpt, SCHEMA, "t",
                                n_shards=shards, capacity=cap)
    q.awaitTermination()

    latest = hh.latest_summaries(spark, out)
    rows = latest.collect()
    counts = Counter(d1 + d2)
    n = len(d1) + len(d2)
    survived = {r["k"] for r in rows}
    for tok, c in counts.items():
        if c * (cap + 1) > n:
            assert tok in survived, (tok, c, n)
    for r in rows:
        assert r["mg_count"] <= counts[r["k"]]
    per_shard = Counter(r["shard"] for r in rows)
    assert all(v <= cap for v in per_shard.values())
    # the heavy keys' counts reflect BOTH deliveries (state carried
    # across the restart): alpha appeared 30+30 times, undercount is
    # bounded by N_shard/(cap+1) < n/(cap+1)
    alpha = next(r for r in rows if r["k"] == "alpha")
    assert alpha["mg_count"] > 60 - n / (cap + 1)


def test_emptied_summary_overwrites_instead_of_resurrecting(spark, tmp_path):
    """Round-6 review finding: a shard whose second delivery DECREMENTS
    its summary to empty used to land zero rows, so latest_summaries
    resurrected the first delivery's stale counts. The sentinel row
    must advance the shard's latest pointer: after the emptying
    delivery the live candidate set is empty, and the sentinel itself
    never surfaces."""
    import pandas as pd

    from crypto_data_pipeline_spark.operators.sketch import _mg_merge

    bronze = str(tmp_path / "bronze")
    out = str(tmp_path / "hh")
    ckpt = str(tmp_path / "ckpt")
    cap, shards = 2, 1

    d1 = ["hot", "hot"]
    d2 = ["a", "a", "b", "b", "c", "c"]
    # pin the premise: merging d2 into d1's summary really empties it
    ref = _mg_merge(_mg_merge(pd.Series(dtype="int64"), pd.Series(d1), cap),
                    pd.Series(d2), cap)
    assert len(ref) == 0

    _tokens(spark, d1).write.parquet(bronze)
    q = hh.stream_heavy_hitters(spark, bronze, out, ckpt, SCHEMA, "t",
                                n_shards=shards, capacity=cap)
    q.awaitTermination()
    assert {(r["k"], r["mg_count"]) for r in hh.latest_summaries(spark, out).collect()} == {
        ("hot", 2)
    }

    _tokens(spark, d2).write.mode("append").parquet(bronze)
    q = hh.stream_heavy_hitters(spark, bronze, out, ckpt, SCHEMA, "t",
                                n_shards=shards, capacity=cap)
    q.awaitTermination()
    assert hh.latest_summaries(spark, out).count() == 0


@pytest.mark.slow
def test_null_keys_cannot_alias_the_sentinel(spark, tmp_path):
    """ADVICE round-7: the emission protocol's empty-summary marker is
    an in-band NULL-key row, so a caller's genuine NULL key used to
    alias it and silently vanish. heavy_hitter_stream now drops NULL
    keys at its own input (round-8): a delivery carrying NULLs must
    (a) not crash, (b) track the non-NULL keys exactly as if the
    NULLs were never there, and (c) never surface a NULL key from
    latest_summaries."""
    # drive the GENERIC operator directly (the wrapper always filtered;
    # the operator is where the fix lives) — same wiring as
    # stream_heavy_hitters minus the caller-side NULL filter
    def run(toks, tag):
        bronze = str(tmp_path / f"bronze_{tag}")
        out = str(tmp_path / f"hh_{tag}")
        _tokens(spark, toks).coalesce(1).write.parquet(bronze)
        stream = spark.readStream.schema(SCHEMA).parquet(bronze)
        tracked = hh.heavy_hitter_stream(
            stream.select(F.col("t").alias("k")), n_shards=2, capacity=8
        )

        def land(batch, batch_id):
            batch.write.mode("overwrite").parquet(f"{out}/batch_id={batch_id}")

        q = (
            tracked.writeStream.foreachBatch(land)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            r["k"]: r["mg_count"] for r in hh.latest_summaries(spark, out).collect()
        }

    toks = ["hot"] * 30 + [None] * 50 + ["warm"] * 10
    got = run(toks, "nulls")
    assert got == {"hot": 30, "warm": 10}
    assert run([t for t in toks if t is not None], "clean") == got
