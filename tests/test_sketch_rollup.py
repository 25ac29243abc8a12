"""Mergeable-sketch rollups: the 100 TB distinct-count pattern is
'sketch once per partition-grain, merge upward, never rescan raw'.
Spark's Datasketches HLL functions (hll_sketch_agg / hll_union_agg /
hll_sketch_estimate) make the daily→monthly rollup a pure merge; these
tests pin that the merge path agrees with sketching the raw data
directly, and that both track the exact answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.sources.tables import load_table


def test_hll_daily_sketches_merge_to_monthly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("month", "ts").alias("month"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    daily = ev.groupBy("month", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    direct = ev.groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_est"),
        F.count_distinct("user_id").alias("exact"),
    )
    rows = merged.join(direct, "month").collect()
    assert rows
    for r in rows:
        # merging the daily register sets must agree with sketching the
        # month's raw rows (register max-merge loses nothing)...
        assert abs(r.merged_est - r.direct_est) <= 0.02 * max(r.direct_est, 1)
        # ...and both must track the exact distinct count
        assert abs(r.merged_est - r.exact) <= 0.05 * max(r.exact, 1)


def test_hll_rollup_never_rescans_raw(spark, sf_dir):
    """The monthly merge over PRE-AGGREGATED daily sketches must plan
    as sketch-merge aggregation over the daily frame — at 100 TB the
    daily sketches are a materialized table and the monthly rollup
    reads kilobytes. Pinned by the merge plan containing a partial
    union aggregate, not a raw-column sketch build."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("month", "ts").alias("month"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    daily = ev.groupBy("month", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    daily.cache()
    try:
        daily.count()
        merged = daily.groupBy("month").agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        )
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "hll_union_agg" in plan
        assert "InMemoryTableScan" in plan  # reads the daily sketches, not raw
    finally:
        daily.unpersist()


def test_approx_top_k_recovers_exact_heavy_hitters(spark, sf_dir):
    """approx_top_k is the sketch path of key_skew_stats: with the
    tracked-item capacity above the true cardinality the counts are
    exact, so the sketch's top keys must equal the exact groupBy's."""
    ev = load_table(spark, sf_dir, "events")
    sk = spark.sql(
        "SELECT approx_top_k(user_id, 5, 100000) AS tk FROM {ev}", ev=ev
    ).first()["tk"]
    got = {(r["item"], r["count"]) for r in sk}
    exact = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "user_id")
    ).collect()
    floor = min(c for _, c in got)
    want = {(r["user_id"], r["n"]) for r in exact if r["n"] >= floor}
    # every sketched (item, count) pair must be a true exact pair
    assert got <= want
    assert len(got) == 5


def test_portable_hll_matches_python_reference_and_merges(spark, sf_dir):
    """The PORTABLE HLL (operators/sketch.py:hll_registers) — unlike
    the Datasketches built-in above, every register and estimate is
    reproducible in pure Python: recompute the registers sequentially
    and require bit equality, then pin the max-merge property by
    splitting the input and merging the halves' register tables."""
    from crypto_data_pipeline_spark.operators.dedup import (
        PORTABLE_MOD,
        portable_minhash_params,
    )
    from crypto_data_pipeline_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    m, seed = 64, 29
    ev = load_table(spark, sf_dir, "events").select("user_id")
    regs = hll_registers(ev, F.col("user_id"), m=m, seed=seed)
    got = {r["j"]: r["r"] for r in regs.collect()}

    (a1, b1), (a2, b2) = portable_minhash_params(2, seed)
    wbits = 31 - (m.bit_length() - 1)
    ref: dict[int, int] = {}
    for (uid,) in ev.where("user_id IS NOT NULL").collect():
        # affine -> xorshift(15) -> affine, the round-11 avalanche
        # composition (_hll_j_rho) that holds the error contract on
        # sequential keys
        h1 = ((uid % PORTABLE_MOD) * a1 + b1) % PORTABLE_MOD
        h = ((h1 ^ (h1 >> 15)) * a2 + b2) % PORTABLE_MOD
        w = h // m
        rho = wbits + 1 if w == 0 else wbits + 1 - w.bit_length()
        j = h % m
        ref[j] = max(ref.get(j, 0), rho)
    assert got == ref

    est = hll_estimate(regs, m=m).collect()[0]["hll_estimate"]
    exact = ev.select(F.count_distinct("user_id")).collect()[0][0]
    assert abs(est - exact) <= 0.3 * exact  # m=64 -> ~13% std err

    # max-merge: sketch each half, union, re-max -> identical registers
    lo = hll_registers(ev.where("user_id % 2 = 0"), F.col("user_id"), m=m, seed=seed)
    hi = hll_registers(ev.where("user_id % 2 = 1"), F.col("user_id"), m=m, seed=seed)
    merged = lo.unionByName(hi).groupBy("j").agg(F.max("r").alias("r"))
    assert {r["j"]: r["r"] for r in merged.collect()} == got


def test_hll_distinct_with_exact_matches_separate_paths(spark):
    """The fused exact+sketch pipeline (one dedup, estimate and truth
    as two columns of one aggregation — round-8 plan consolidation)
    must produce the SAME estimate as the raw-scan
    hll_registers -> hll_estimate path (registers are
    duplicate-insensitive) and the true per-group distinct counts —
    including NULL-key exclusion and groups of very different
    cardinality."""
    from crypto_data_pipeline_spark.operators.sketch import (
        hll_distinct_with_exact,
        hll_estimate,
        hll_registers,
    )

    rows = (
        [("a", i % 7) for i in range(500)]      # heavy dup, 7 distinct
        + [("b", 1000 + i) for i in range(300)]  # all distinct
        + [("a", None), ("b", None)]             # NULL keys excluded
    )
    ev = spark.createDataFrame(rows, "g string, uid int").repartition(16)
    m, seed = 64, 29

    fused = {
        r.g: (r.n_exact, r.hll_estimate)
        for r in hll_distinct_with_exact(
            ev, F.col("uid"), m=m, seed=seed, group=("g",)
        ).collect()
    }
    regs_raw = hll_registers(ev, F.col("uid"), m=m, seed=seed, group=("g",))
    est_raw = {
        r.g: r.hll_estimate
        for r in hll_estimate(regs_raw, m=m, group=("g",)).collect()
    }
    assert {g: n for g, (n, _) in fused.items()} == {"a": 7, "b": 300}
    assert {g: e for g, (_, e) in fused.items()} == est_raw


def test_heavy_hitters_exact_on_adversarial_tail(spark):
    """One dominant key + a long tail far wider than the MG capacity:
    the prune must keep the certified heavy hitters and the final
    output must equal the plain exact groupBy, including on a
    repartitioned input with empty partitions."""
    from crypto_data_pipeline_spark.operators.sketch import heavy_hitters_exact

    rows = (
        [("hot",)] * 400
        + [("warm",)] * 60
        + [(f"tail{i}",) for i in range(3000)]
    )
    df = spark.createDataFrame(rows, "k string").repartition(50)
    import pytest

    with pytest.raises(ValueError):  # capacity below the certificate bound
        heavy_hitters_exact(df, F.col("k"), 1, 100, capacity=64)
    got = {
        (r["k"], r["freq"], r["share_pct"])
        for r in heavy_hitters_exact(df, F.col("k"), 1, 100, capacity=128).collect()
    }
    n = len(rows)
    exact = {
        (r["k"], r["cnt"], round(r["cnt"] * 100.0 / n, 6))
        for r in df.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("cnt")).collect()
        if r["cnt"] * 100 >= n
    }
    assert got == exact
    assert ("hot", 400, round(400 * 100.0 / n, 6)) in got


def test_heavy_hitters_exact_long_keys(spark):
    """Key dtype survives the Arrow round-trip (bigint keys)."""
    from crypto_data_pipeline_spark.operators.sketch import heavy_hitters_exact

    df = spark.createDataFrame(
        [(7,)] * 50 + [(i,) for i in range(200)], "k long"
    ).repartition(8)
    rows = heavy_hitters_exact(df, F.col("k"), 1, 10).collect()
    assert [(r["k"], r["freq"]) for r in rows] == [(7, 51)]


def test_mg_merge_superset_certificate_property():
    """Hypothesis property over the shipped pandas MG reduction
    (operators/sketch.py:_mg_merge): for ANY stream and ANY batch
    split, every item with total count > N/(capacity+1) survives in
    the summary keys, and the summary never exceeds capacity — the
    certificate heavy_hitters_exact's pass-1 prune rests on."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from crypto_data_pipeline_spark.operators.sketch import _mg_merge

    @settings(max_examples=150, deadline=None)
    @given(
        stream=st.lists(st.integers(0, 30), min_size=1, max_size=400),
        capacity=st.integers(2, 12),
        n_batches=st.integers(1, 6),
        data=st.data(),
    )
    def prop(stream, capacity, n_batches, data):
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(0, len(stream)),
                    min_size=n_batches - 1,
                    max_size=n_batches - 1,
                )
            )
        )
        bounds = [0, *cuts, len(stream)]
        summary = pd.Series(dtype="int64")
        for lo, hi in zip(bounds, bounds[1:]):
            if hi > lo:
                summary = _mg_merge(summary, pd.Series(stream[lo:hi]), capacity)
        assert len(summary) <= capacity
        n = len(stream)
        counts = pd.Series(stream).value_counts()
        for item, c in counts.items():
            if c * (capacity + 1) > n:
                assert item in summary.index, (item, c, n, capacity)
            # MG counters never overestimate
            if item in summary.index:
                assert summary[item] <= c

    prop()
