"""Statistical-contract probe — the standing defense for operators
whose correctness is a DISTRIBUTIONAL property no value-pinned fixture
can see (VERDICT r10 next #3; the round-10 MinHash mask bug proved the
class: every hash-green oracle certifies that Spark and DuckDB compute
the SAME numbers, not that the numbers have the promised statistics).

Four contracts, each measured against its published theory at scale:

- SimHash (operators/dedup.py:simhash64): planted token-substitution
  families at controlled cosine — mean Hamming distance must track
  Charikar's 64*arccos(cos)/pi curve (Goemans-Williamson hyperplane
  rounding), and the 4x16-bit band join must find EVERY pair at
  Hamming <= 3 (pigeonhole — exact, not statistical).
- Bloom (operators/dedup.py:bloom_prefilter_flags): measured FPR on
  fresh non-members vs the realized-fill prediction (set_bits/m)^k
  and the idealized (1-e^{-kn/m})^k.
- HLL (operators/sketch.py:hll_registers/hll_estimate): relative
  error over disjoint SEQUENTIAL-key groups (the id columns the
  operator is pointed at — the hash's adversarial case) vs the
  1.04/sqrt(m) standard error. This probe caught a real bug in round
  11: the original single-affine key hash put +54% error on 100k
  sequential keys (10x the contract) while every fixture passed —
  fixed by the affine->xorshift->affine composition in _hll_j_rho.
- CMS (operators/sketch.py:cms_point_estimates): overcount >= 0
  always (the deterministic CM guarantee) and <= e*N/width with
  failure probability <= e^{-depth} per probe (Cormode-Muthukrishnan)
  on a 1M-token heavy-tail stream.

Deterministic end to end (hash-derived streams, no rand()).
Usage:  python tools/stat_contract_probe.py [--small]
Prints one JSON line per measurement; record results in
docs/SCALE_PROBE.md.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crypto_data_pipeline_spark import get_spark
from crypto_data_pipeline_spark.operators import dedup as D
from crypto_data_pipeline_spark.operators import sketch as SK


def probe_simhash(spark, n_pairs: int, width: int = 64) -> list[dict]:
    """Mean Hamming distance of planted substitution pairs vs the
    arccos curve, plus the banded join's pigeonhole recall at <=3."""
    rows = []
    for s in (0, 4, 8, 16, 32, 48):
        df = spark.range(n_pairs).select(
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(0), F.lit(width - 1)),
                lambda j: F.concat(F.lit("d"), F.col("id"), F.lit("x"), j),
            )).alias("ta"),
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(0), F.lit(width - 1)),
                lambda j: F.when(
                    j < s, F.concat(F.lit("v"), F.col("id"), F.lit("y"), j)
                ).otherwise(F.concat(F.lit("d"), F.col("id"), F.lit("x"), j)),
            )).alias("tb"),
        )
        r = (
            df.select(
                F.bit_count(
                    D.simhash64("ta").bitwiseXOR(D.simhash64("tb"))
                ).alias("h")
            )
            .agg(F.avg("h").alias("mean"), F.stddev("h").alias("sd"))
            .collect()[0]
        )
        cos = (width - s) / width
        rows.append({
            "probe": "simhash_curve", "n_pairs": n_pairs, "subst": s,
            "cosine": round(cos, 4),
            "mean_hamming": round(float(r["mean"]), 3),
            "sd": round(float(r["sd"] or 0.0), 3),
            "theory": round(64 * math.acos(cos) / math.pi, 3),
        })

    # pigeonhole: pairs planted at Hamming <= 3 (1-token substitution
    # lands there with high probability) MUST all surface from the
    # banded candidate join — zero recall loss is the contract
    base = spark.range(n_pairs).select(
        F.col("id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), F.lit(width - 1)),
            lambda j: F.concat(F.lit("d"), F.col("id"), F.lit("x"), j),
        )).alias("text"),
    )
    # build the text BEFORE shifting the id: an aliased `id` in the
    # same select would capture the shifted value inside the token
    # lambda and the "pair" would share zero tokens
    var = spark.range(n_pairs).select(
        F.col("id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), F.lit(width - 1)),
            lambda j: F.when(
                j < 1, F.concat(F.lit("v"), F.col("id"), F.lit("y"), j)
            ).otherwise(F.concat(F.lit("d"), F.col("id"), F.lit("x"), j)),
        )).alias("text"),
    ).select((F.col("id") + n_pairs).alias("id"), "text")
    docs = base.unionByName(var).withColumnRenamed("id", "doc_id")
    pairs = D.simhash_candidate_pairs(docs, max_hamming=3)
    found = (
        pairs.where(F.col("id_b") - F.col("id_a") == n_pairs).count()
    )
    # ground truth: how many planted pairs actually land at <= 3
    sh = docs.select("doc_id", D.simhash64("text").alias("sh"))
    a = sh.where(F.col("doc_id") < n_pairs).alias("a")
    b = sh.where(F.col("doc_id") >= n_pairs).alias("b")
    close = (
        a.join(b, F.col("b.doc_id") - F.col("a.doc_id") == n_pairs)
        .where(
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))) <= 3
        ).count()
    )
    rows.append({
        "probe": "simhash_band_pigeonhole", "n_pairs": n_pairs,
        "planted_at_le3": close, "found_by_band_join": found,
        "recall": round(found / close, 4) if close else None,
    })
    return rows


def probe_bloom(spark, n: int, bits_per_item: int = 8, k: int = 4) -> dict:
    # m scales with n (8 bits/item, k=4 -> ~2% idealized FPR) so the
    # measurement is meaningful at every probe scale
    m_bits = 1 << (n * bits_per_item - 1).bit_length()
    members = spark.range(n).select(
        F.concat(F.lit("member doc "), F.col("id")).alias("text")
    )
    bits = D.bloom_bitset(members, m_bits=m_bits, k=k).persist()
    set_bits = bits.count()
    n_probe = min(n, 200_000)
    fresh = spark.range(n_probe).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("novel doc "), F.col("id")).alias("text"),
    )
    fp = (
        D.bloom_prefilter_flags(members, fresh, m_bits=m_bits, k=k, bits=bits)
        .where(F.col("bloom_pass")).count()
    )
    bits.unpersist()
    return {
        "probe": "bloom_fpr", "n_members": n, "m_bits": m_bits, "k": k,
        "set_bits": set_bits, "n_probes": n_probe,
        "fpr": round(fp / n_probe, 5),
        "theory_fill": round((set_bits / m_bits) ** k, 5),
        "theory_ideal": round((1 - math.exp(-k * n / m_bits)) ** k, 5),
    }


def probe_hll(spark, n_per_group: int, groups: int = 16, m: int = 256) -> dict:
    """Sequential keys — the structured case that broke the affine
    hash. Contract: rms relative error ~ 1.04/sqrt(m)."""
    df = spark.range(n_per_group * groups).select(
        (F.col("id") % groups).alias("grp"), F.col("id").alias("k")
    )
    regs = SK.hll_registers(df, F.col("k"), m=m, group=("grp",))
    est = SK.hll_estimate(regs, m=m, group=("grp",)).collect()
    rel = [(r["hll_estimate"] - n_per_group) / n_per_group for r in est]
    return {
        "probe": "hll_seq_keys", "n_per_group": n_per_group,
        "groups": groups, "m": m,
        "rms_rel_err": round(math.sqrt(sum(e * e for e in rel) / len(rel)), 4),
        "max_rel_err": round(max(abs(e) for e in rel), 4),
        "sigma_contract": round(1.04 / math.sqrt(m), 4),
    }


def probe_cms(spark, n_tokens: int, width: int = 1024, depth: int = 3) -> dict:
    """Heavy-tail token stream via deterministic inverse-CDF; probe a
    rank ladder of terms and test the (e*N/w, e^-d) CM bound plus the
    deterministic overcount >= 0 guarantee."""
    u = (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) + 0.5) / 1_000_000.0
    rank = F.least(F.ceil(F.pow(u, F.lit(-0.8))), F.lit(100_000)).cast("long")
    docs = spark.range(n_tokens).select(F.concat(F.lit("w"), rank).alias("text"))
    ladder = [1, 2, 3, 5, 8, 12, 20, 30, 50, 80, 120, 200, 300, 500, 800,
              1200, 2000, 3000, 5000, 8000, 12000, 20000, 30000, 50000, 80000]
    out = SK.cms_point_estimates(
        spark, docs, [f"w{r}" for r in ladder], depth=depth, width=width
    ).collect()
    eps_n = math.e / width * n_tokens
    over = [r["overcount"] for r in out]
    return {
        "probe": "cms_bound", "n_tokens": n_tokens, "width": width,
        "depth": depth, "eps_n": round(eps_n, 1),
        "n_probes": len(out),
        "negatives": sum(1 for o in over if o < 0),
        "over_eps_n": sum(1 for o in over if o > eps_n),
        "bound_fail_budget": round(len(out) * math.exp(-depth), 2),
        "max_overcount": max(over), "median_overcount": sorted(over)[len(over) // 2],
    }


def probe_gumbel(spark, n_draws: int) -> dict:
    """Gumbel-max contract of the DSIR resampler: P(top-1 = doc i) =
    exp(w_i)/Σexp(w) over independent salted draws. Salts enter the
    hash additively BEFORE the scramble (avalanche_bucket(key, salt) ==
    avalanche_bucket(key + salt, 0)), so one Spark job sweeps n_draws
    salts at spacing 1000 (> max doc id — no cross-draw key reuse).
    This is the probe that exposed the affine hash_bucket's lattice
    coupling in round 11: measured (0.235, 0.255, 0.255, 0.255)
    pre-fix where softmax says (0.1, 0.2, 0.3, 0.4)."""
    from crypto_data_pipeline_spark.operators.sampling import MOD, avalanche_bucket

    w = {0: math.log(1.0), 1: math.log(2.0), 2: math.log(3.0), 3: math.log(4.0)}
    weights = F.array(*[F.lit(w[i]) for i in range(4)])
    docs = F.sequence(F.lit(0), F.lit(3))
    drawn = spark.range(n_draws).select(
        F.col("id").alias("salt_k"),
        F.explode(docs).alias("d"),
    ).select(
        "salt_k", "d",
        (weights[F.col("d")]
         - F.log(-F.log(
             (avalanche_bucket(F.col("d") + F.col("salt_k") * 1000, salt=0) + 0.5)
             / F.lit(float(MOD))
         ))).alias("key"),
    )
    wins = (
        drawn.groupBy("salt_k").agg(F.max_by("d", "key").alias("winner"))
        .groupBy("winner").count().orderBy("winner").collect()
    )
    total = sum(r["count"] for r in wins)
    freq = {int(r["winner"]): round(r["count"] / total, 4) for r in wins}
    return {
        "probe": "gumbel_softmax", "n_draws": n_draws,
        "win_freq": [freq.get(i, 0.0) for i in range(4)],
        "softmax_target": [round(x / 10, 4) for x in (1, 2, 3, 4)],
    }


def main() -> None:
    small = "--small" in sys.argv
    spark = get_spark("stat-contract-probe")
    scale = 1 if small else 20
    for row in probe_simhash(spark, n_pairs=500 * scale):
        print(json.dumps(row), flush=True)
    print(json.dumps(probe_bloom(spark, n=50_000 * scale)), flush=True)
    print(json.dumps(probe_hll(spark, n_per_group=62_500 * scale)), flush=True)
    print(json.dumps(probe_cms(spark, n_tokens=50_000 * scale * 20)), flush=True)
    print(json.dumps(probe_gumbel(spark, n_draws=25_000 * scale)), flush=True)


if __name__ == "__main__":
    main()
