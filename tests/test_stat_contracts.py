"""Statistical-contract pins — suite-sized versions of
tools/stat_contract_probe.py (round 11; VERDICT r10 next #3).

The round-10 MinHash mask bug proved that hash-green oracles certify
cross-engine AGREEMENT, not DISTRIBUTIONAL correctness: Spark and
DuckDB happily agree on degenerate signatures. These tests pin each
sketch/fingerprint operator to its published theory on deterministic
planted inputs, so a hash regression that keeps both engines in
lockstep still fails the suite. Bands are 'theory ± enough slack to
never flake at fixed seeds, tight enough that the known degeneracies
(single-affine HLL: +54%; mask-free MinHash: curve collapses to 0)
land far outside'.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.operators import dedup as D
from crypto_data_pipeline_spark.operators import sketch as SK


def _planted_pair_frame(spark, n_pairs: int, width: int, subst: int):
    """(ta, tb) rows: tb replaces the first `subst` of ta's `width`
    distinct tokens — cosine (width-subst)/width by construction."""
    return spark.range(n_pairs).select(
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), F.lit(width - 1)),
            lambda j: F.concat(F.lit("d"), F.col("id"), F.lit("x"), j),
        )).alias("ta"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), F.lit(width - 1)),
            lambda j: F.when(
                j < subst, F.concat(F.lit("v"), F.col("id"), F.lit("y"), j)
            ).otherwise(F.concat(F.lit("d"), F.col("id"), F.lit("x"), j)),
        )).alias("tb"),
    )


def test_simhash_hamming_tracks_arccos_curve(spark):
    """Charikar contract: E[Hamming] = 64*arccos(cos)/pi. Measured at
    500 pairs per point (tools/stat_contract_probe.py records the
    same curve at 10k): 9.85/14.42/21.00 vs theory 10.30/14.72/21.33.
    A degenerate bit pipeline (all-equal contributions, the MinHash
    mask class) collapses every mean to ~0 or ~32 — far outside these
    bands. Identical texts must land at exactly 0 (determinism)."""
    width, n = 64, 500
    expectations = {
        0: (0.0, 0.0),      # exact: identical text, identical hash
        8: (8.8, 11.8),     # theory 10.30
        16: (13.2, 16.2),   # theory 14.72
        32: (19.8, 22.8),   # theory 21.33
    }
    for subst, (lo, hi) in expectations.items():
        mean = (
            _planted_pair_frame(spark, n, width, subst)
            .select(F.bit_count(
                D.simhash64("ta").bitwiseXOR(D.simhash64("tb"))
            ).alias("h"))
            .agg(F.avg("h")).collect()[0][0]
        )
        assert lo <= mean <= hi, f"subst={subst}: mean {mean} outside [{lo},{hi}]"


def test_simhash_band_join_pigeonhole_recall_is_exact(spark):
    """Any pair at Hamming <= 3 agrees on >= 1 of the 4 16-bit bands
    (pigeonhole) — so the banded candidate join's recall on such pairs
    is EXACTLY 1.0, not approximately. Planted 1-token substitutions
    put ~60% of pairs at <= 3; every one must be found."""
    n, width = 300, 64
    base = spark.range(n).select(
        F.col("id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), F.lit(width - 1)),
            lambda j: F.concat(F.lit("d"), F.col("id"), F.lit("x"), j),
        )).alias("text"),
    )
    var = spark.range(n).select(
        F.col("id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), F.lit(width - 1)),
            lambda j: F.when(
                j < 1, F.concat(F.lit("v"), F.col("id"), F.lit("y"), j)
            ).otherwise(F.concat(F.lit("d"), F.col("id"), F.lit("x"), j)),
        )).alias("text"),
    ).select((F.col("id") + n).alias("id"), "text")
    docs = base.unionByName(var).withColumnRenamed("id", "doc_id")

    sh = docs.select("doc_id", D.simhash64("text").alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    close = (
        a.join(b, F.col("b.doc_id") - F.col("a.doc_id") == n)
        .where(F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))) <= 3)
        .count()
    )
    assert close > 100  # the planted family lands where theory says
    found = (
        D.simhash_candidate_pairs(docs, max_hamming=3)
        .where(F.col("id_b") - F.col("id_a") == n)
        .count()
    )
    assert found == close  # pigeonhole: zero recall loss, exactly


def test_bloom_fpr_tracks_fill_theory(spark):
    """FPR on fresh non-members must match (set_bits/m)^k — the
    realized-fill prediction, which also covers the slight overfill of
    the affine-of-one-base-hash position family vs ideal k independent
    hashes. 20k members / 2^18 bits / k=4: theory ~0.9%, band [0, 3%];
    a broken position family (e.g. all k positions equal) collapses
    fill to ~n/m and FPR toward n/m ~ 7.6% — outside."""
    n, m_bits, k = 20_000, 1 << 18, 4
    members = spark.range(n).select(
        F.concat(F.lit("member doc "), F.col("id")).alias("text")
    )
    bits = D.bloom_bitset(members, m_bits=m_bits, k=k).persist()
    set_bits = bits.count()
    # the affine family must fill within 5% of the ideal Poisson fill
    ideal_fill = m_bits * (1 - math.exp(-k * n / m_bits))
    assert abs(set_bits - ideal_fill) / ideal_fill < 0.05
    fresh = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("novel doc "), F.col("id")).alias("text"),
    )
    fp = (
        D.bloom_prefilter_flags(members, fresh, m_bits=m_bits, k=k, bits=bits)
        .where(F.col("bloom_pass")).count()
    )
    bits.unpersist()
    fpr, fill_theory = fp / n, (set_bits / m_bits) ** k
    assert fpr <= 3 * fill_theory + 0.005, (fpr, fill_theory)


def test_hll_error_contract_on_sequential_keys(spark):
    """THE round-11 regression pin: m=256 HLL must hold rms relative
    error ~ 1.04/sqrt(256) = 6.5% on SEQUENTIAL integer keys — the id
    columns the operator is actually pointed at. The original
    single-affine key hash measured +54% here (10x contract) while
    every value-pinned fixture passed, because the DuckDB twin
    computed the same degenerate registers; the affine->xorshift->
    affine composition (_hll_j_rho) holds 6.2% rms / 12.9% max at this
    exact geometry (tools/stat_contract_probe.py)."""
    n, groups, m = 62_500, 16, 256
    df = spark.range(n * groups).select(
        (F.col("id") % groups).alias("grp"), F.col("id").alias("k")
    )
    regs = SK.hll_registers(df, F.col("k"), m=m, group=("grp",))
    est = SK.hll_estimate(regs, m=m, group=("grp",)).collect()
    assert len(est) == groups
    rel = [(r["hll_estimate"] - n) / n for r in est]
    rms = math.sqrt(sum(e * e for e in rel) / len(rel))
    sigma = 1.04 / math.sqrt(m)
    assert rms < 2 * sigma, f"rms {rms:.4f} vs contract sigma {sigma:.4f}"
    assert max(abs(e) for e in rel) < 4 * sigma


def test_gumbel_draw_win_frequencies_match_softmax(spark):
    """THE second round-11 regression pin: Gumbel-top-k selection
    (operators/dsir.py:_gumbel_key) promises P(top-1 = doc i) =
    exp(w_i)/Σexp(w) — Xie et al.'s sampling-∝-exp(weight) semantics.
    The affine hash_bucket silently broke this: it couples every
    doc's uniform into ONE lattice per salt (u_{i+1} = frac(u_i +
    const)), and measured win frequencies were (0.235, 0.255, 0.255,
    0.255) against softmax (0.1, 0.2, 0.3, 0.4) — while the
    rank/threshold twins stayed hash-green (DuckDB computes the same
    coupled draw). avalanche_bucket's xorshift restores independence;
    this pins it at 4σ bands over 4000 salted draws."""
    import math as _math

    from crypto_data_pipeline_spark.operators.sampling import MOD, avalanche_bucket

    n_draws = 4000
    w = [0.0, _math.log(2.0), _math.log(3.0), _math.log(4.0)]
    weights = F.array(*[F.lit(x) for x in w])
    drawn = spark.range(n_draws).select(
        F.col("id").alias("salt_k"), F.explode(F.sequence(F.lit(0), F.lit(3))).alias("d")
    ).select(
        "salt_k", "d",
        (weights[F.col("d")] - F.log(-F.log(
            (avalanche_bucket(F.col("d") + F.col("salt_k") * 1000, salt=0) + 0.5)
            / F.lit(float(MOD))
        ))).alias("key"),
    )
    wins = {
        int(r["winner"]): r["count"]
        for r in drawn.groupBy("salt_k").agg(F.max_by("d", "key").alias("winner"))
        .groupBy("winner").count().collect()
    }
    total = sum(wins.values())
    assert total == n_draws
    for i, p in enumerate((0.1, 0.2, 0.3, 0.4)):
        freq = wins.get(i, 0) / total
        band = 4 * _math.sqrt(p * (1 - p) / n_draws)
        assert abs(freq - p) < band, f"doc {i}: {freq:.4f} vs {p} (±{band:.4f})"


def test_cms_overcount_bound_on_heavy_tail_stream(spark):
    """Cormode-Muthukrishnan: estimate >= exact ALWAYS (deterministic
    min-of-counters guarantee — pinned exactly), and overcount <=
    e*N/width with per-probe failure probability <= e^{-depth}. On a
    200k-token heavy-tail stream with w=256/d=3 the realized
    overcounts sit far inside the bound; a degenerate bucket hash
    (all rows identical) sends tail-term overcounts toward the heavy
    mass — orders of magnitude outside."""
    n_tokens, width, depth = 200_000, 256, 3
    u = (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) + 0.5) / 1_000_000.0
    rank = F.least(F.ceil(F.pow(u, F.lit(-0.8))), F.lit(50_000)).cast("long")
    docs = spark.range(n_tokens).select(F.concat(F.lit("w"), rank).alias("text"))
    ladder = [1, 3, 8, 20, 50, 120, 300, 800, 2000, 5000, 12000, 30000]
    out = SK.cms_point_estimates(
        spark, docs, [f"w{r}" for r in ladder], depth=depth, width=width
    ).collect()
    assert len(out) == len(ladder)
    eps_n = math.e / width * n_tokens
    assert all(r["overcount"] >= 0 for r in out)  # exact CM guarantee
    over_budget = sum(1 for r in out if r["overcount"] > eps_n)
    # e^{-3} per probe over 12 probes -> expected 0.6 failures; 3 is
    # already a >3-sigma Poisson excursion
    assert over_budget <= 3, [(r["term"], r["overcount"]) for r in out]
