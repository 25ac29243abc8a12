"""Count-min sketch over the corpus token stream.

Cormode & Muthukrishnan 2005 ("An improved data stream summary: the
count-min sketch and its applications"): a depth x width grid of
counters; each item increments one counter per row under an
independent hash; a point query reads the MINIMUM of its d counters —
always an overestimate, with error eps*N at depth ln(1/delta).

Distributed shape: the sketch build is ONE aggregation over the token
stream keyed on (row, bucket) — at most depth*width distinct keys, so
map-side partial aggregation collapses each task's contribution to a
few hundred rows and the shuffle carries kilobytes regardless of
corpus size. The fitted sketch is a broadcastable mini-table; probes
join against it broadcast-side. This is the sketch a 100 TB pipeline
uses for approximate term frequencies where the exact vocabulary
aggregation (vocab_coverage) is too hot to maintain online.

Hashes are the repo's portable polynomial family (dedup.py): the
char-fold term hash feeds (a_j*h + b_j) mod P mod width rows, exact
integer arithmetic both engines execute bit-identically — so the
whole lossy sketch, estimates included, hash-checks against a DuckDB
oracle instead of settling for a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from crypto_data_pipeline_spark.operators.dedup import (
    PORTABLE_MOD,
    _poly_fold,
    portable_minhash_params,
)
from crypto_data_pipeline_spark.operators.text import tokens


def term_hash(col: Column) -> Column:
    """Polynomial char hash (h*131 + codepoint) mod 2^31-1 — the same
    family the portable minhash twin proves engine-portable."""
    return _poly_fold(F.transform(F.split(col, ""), F.ascii))


def _bucket_array(h: Column, params: list[tuple[int, int]], width: int) -> Column:
    return F.array(
        *[((h * F.lit(a) + F.lit(b)) % PORTABLE_MOD % width) for a, b in params]
    )


def cms_build(
    docs: DataFrame,
    depth: int = 3,
    width: int = 64,
    seed: int = 11,
    text: str = "text",
) -> DataFrame:
    """(j, bucket, c): the sketch grid as a depth*width-row frame."""
    params = portable_minhash_params(depth, seed)
    stream = docs.select(F.explode(tokens(text)).alias("t")).where(F.col("t") != "")
    hashed = stream.select(term_hash(F.col("t")).alias("h"))
    return (
        hashed.select(F.posexplode(_bucket_array(F.col("h"), params, width)).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def hll_registers(
    df: DataFrame,
    key: Column,
    m: int = 256,
    seed: int = 29,
    group: tuple[str, ...] = (),
) -> DataFrame:
    """HyperLogLog register table (Flajolet, Fusy, Gandouet, Meunier
    2007): one row per (group, register j) holding max(rho). The build
    is ONE aggregation with at most |groups|*m distinct keys, so
    map-side combine collapses every scan task to a handful of rows
    and the shuffle carries kilobytes regardless of input size — the
    whole point vs an exact COUNT(DISTINCT), which must shuffle every
    distinct key. Registers are max-monotone, so sketches merge by
    unionByName + the same groupBy(max) — partition-local sketches,
    daily sketches, and the global sketch are the same frame.

    Portability: item hash h = (a*x + b) mod 2^31-1 (the repo's LCG
    family); j = h mod m; rho = leading-zero count of the remaining
    (31 - log2(m))-bit word + 1, computed via integer bit length
    (length of the binary string — no floating log anywhere), so every
    register value is bit-identical in DuckDB."""
    j, rho = _hll_j_rho(key, m, seed)
    return (
        df.where(key.isNotNull())
        .select(*group, j.alias("j"), rho.alias("rho"))
        .groupBy(*group, "j")
        .agg(F.max("rho").alias("r"))
    )


def _hll_j_rho(key: Column, m: int, seed: int) -> tuple[Column, Column]:
    """The portable register-index / rank expressions shared by the
    raw-scan build (`hll_registers`) and the fused exact+sketch build
    (`hll_registers_with_exact`).

    The key hash is affine → xorshift(15) → affine (all mod 2^31-1,
    products < 2^62, so exact on any 64-bit-integer engine — the same
    portability class as the single affine it replaces). The xorshift
    round is load-bearing (round 11): HLL reads the LEADING-zero count
    of h div m, and a bare affine LCG of SEQUENTIAL keys (the id
    columns this operator is pointed at) walks an arithmetic
    progression whose high bits are structured — measured +54% error
    at 100k sequential keys, 10x the m=256 contract of 6.5%, while
    every value-pinned fixture passed because the DuckDB twin computes
    the SAME degenerate registers (the MinHash-mask class of bug;
    tools/stat_contract_probe.py is the standing defense). With the
    xorshift: rms 7.3% / max 16.6% over 16 sequential-key groups —
    inside the 1.04/sqrt(m) contract. `sql_hll_hash` is the oracle
    twin of this exact composition."""
    p = m.bit_length() - 1
    if m != 1 << p:
        raise ValueError(f"m must be a power of two, got {m}")
    wbits = 31 - p
    (a1, b1), (a2, b2) = portable_minhash_params(2, seed)
    x = F.pmod(key.cast("long"), F.lit(PORTABLE_MOD))
    h1 = (x * F.lit(a1) + F.lit(b1)) % F.lit(PORTABLE_MOD)
    h1x = h1.bitwiseXOR(F.shiftright(h1, 15))
    h = (h1x * F.lit(a2) + F.lit(b2)) % F.lit(PORTABLE_MOD)
    w = F.floor(h / F.lit(m)).cast("long")
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return (h % F.lit(m)), rho.cast("int")


def sql_hll_hash(key_expr: str, seed: int) -> str:
    """DuckDB twin of `_hll_j_rho`'s key hash — ONE definition feeds
    every HLL oracle so the Spark expression and the SQL twin cannot
    drift (verified bit-identical on negative and sequential keys).
    DuckDB's `xor`/`>>` operate on BIGINT exactly like Spark's
    bitwiseXOR/shiftright on long. ``key_expr`` is spelled several
    times — pass a column reference, not a subquery."""
    (a1, b1), (a2, b2) = portable_minhash_params(2, seed)
    pm = f"((({key_expr}) % {PORTABLE_MOD}) + {PORTABLE_MOD}) % {PORTABLE_MOD}"
    h1 = f"((({pm}) * {a1} + {b1}) % {PORTABLE_MOD})"
    return f"((xor({h1}, {h1} >> 15)) * {a2} + {b2}) % {PORTABLE_MOD}"


def hll_distinct_with_exact(
    df: DataFrame,
    key: Column,
    m: int = 256,
    seed: int = 29,
    group: tuple[str, ...] = (),
) -> DataFrame:
    """Sketch estimate NEXT TO its ground truth, per group:
    ``(*group, n_exact, hll_estimate)`` — the error-documentation
    frame, as ONE LINEAR pipeline with no self-join and no branch.

    The exact count inherently shuffles every distinct (group, key)
    pair — that cost is the point of comparison, not overhead. What IS
    optimizable is everything around it (round-8 consolidation; the
    previous shape paid 4 exchanges — a raw-scan register build, a
    register merge, a two-shuffle COUNT(DISTINCT), then a join):

      1. dedupe (group, key) — the one unavoidable big shuffle;
         registers are duplicate-insensitive, so they can ride this;
      2. per (group, j): max(rho) AND count(*) of distinct keys in
         the register's bucket — the register table plus a partition
         of the exact count, one model-sized shuffle;
      3. per group: the harmonic sum over finalized registers AND
         sum of per-register key counts (= the exact distinct count)
         in the SAME aggregation — estimate and truth emerge as two
         columns of one row, so no join closes the plan.

    A branched formulation (registers here, exact count there, join)
    re-plans the shared aggregation once per branch after column
    pruning — measured at 4 exchanges; this linear form is 3.

    Standalone sketch maintenance should keep using `hll_registers`
    on the raw scan: its shuffle is bounded by |groups|*m keys at any
    input size, which is the property that matters when there is no
    exact twin to compute."""
    j, rho = _hll_j_rho(F.col("_k"), m, seed)
    deduped = (
        df.where(key.isNotNull())
        .select(*group, key.alias("_k"))
        .distinct()
        .select(*group, j.alias("j"), rho.alias("rho"))
    )
    regs = deduped.groupBy(*group, "j").agg(
        F.max("rho").alias("r"),
        F.count(F.lit(1)).cast("long").alias("_nk"),
    )
    per = regs.groupBy(*group).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("_s"),
        F.count(F.lit(1)).cast("double").alias("_nz"),
        F.sum("_nk").cast("long").alias("n_exact"),
    )
    return per.select(
        *group, "n_exact", F.round(_hll_est_col(m), 6).alias("hll_estimate")
    )


# Flajolet, Fusy, Gandouet, Meunier 2007 §4: the asymptotic
# alpha_m = 0.7213/(1+1.079/m) holds for m >= 128; below that the
# paper prescribes measured constants (the asymptotic form overshoots
# by up to ~5% at m=16). Mirrored into every DuckDB oracle via
# hll_alpha so the two engines cannot diverge.
_HLL_SMALL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_alpha(m: int) -> float:
    """Bias-correction constant alpha_m for an m-register HLL."""
    return _HLL_SMALL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_estimate(regs: DataFrame, m: int = 256, group: tuple[str, ...] = ()) -> DataFrame:
    """Cardinality estimate per group from a register table: the
    standard bias-corrected harmonic mean (small-m alpha table below
    128 registers, asymptotic alpha above), with the small-range
    linear-counting correction (est <= 2.5m and empty registers
    present -> m*ln(m/V)). No large-range correction: the portable
    hash space is 31 bits, so estimates approaching 2^27 need a hash
    upgrade, not a correction term — calibrated use at scale is
    m >= 256 over cardinalities <= ~10^8 per group.

    The harmonic sum is EXACT cross-engine despite being floating
    point: every term 2^-r (r <= 31-log2(m)+1) is a power of two, and
    the full sum fits a 53-bit mantissa (lsb 2^-24, total < 2^8 for
    m=256), so addition is associative here and no engine ordering can
    change a bit. Only the final ln/division are rounded (6 dp)."""
    per = regs.groupBy(*group).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("_s"),
        F.count(F.lit(1)).cast("double").alias("_nz"),
    )
    return per.select(*group, F.round(_hll_est_col(m), 6).alias("hll_estimate"))


def _hll_est_col(m: int) -> Column:
    """The bias-corrected estimate over aggregated ``_s`` (harmonic
    sum of present registers) and ``_nz`` (present-register count)
    columns — shared by `hll_estimate` and `hll_distinct_with_exact`
    so the two query shapes cannot drift."""
    alpha = hll_alpha(m)
    v = F.lit(float(m)) - F.col("_nz")
    s = F.col("_s") + v  # absent registers hold 0 -> each contributes 2^0
    raw = F.lit(alpha * m * m) / s
    return F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)


def cms_point_estimates(
    spark: SparkSession,
    docs: DataFrame,
    probe_terms: list[str],
    depth: int = 3,
    width: int = 64,
    seed: int = 11,
    text: str = "text",
) -> DataFrame:
    """Point-query the sketch for `probe_terms` and report the estimate
    next to the exact count: (term, exact_freq, cms_estimate,
    overcount). overcount >= 0 always — the CM guarantee."""
    params = portable_minhash_params(depth, seed)
    cells = cms_build(docs, depth, width, seed, text)

    # JVM literal-array explode, not createDataFrame (round 13, guide
    # §4.1): a Python-list frame plans as a Python-backed RDD scan and
    # spawns a worker wave per call for a handful of probe rows
    probes = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in probe_terms])).alias("term")
    )
    pb = probes.select(
        "term",
        F.posexplode(_bucket_array(term_hash(F.col("term")), params, width)).alias(
            "j", "bucket"
        ),
    )
    est = (
        pb.join(F.broadcast(cells), ["j", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0).cast("long"))).alias("cms_estimate"))
    )
    exact = (
        docs.select(F.explode(tokens(text)).alias("t"))
        .where(F.col("t").isin(*probe_terms))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_freq"))
        .withColumnRenamed("t", "term")
    )
    zero = F.lit(0).cast("long")
    return (
        est.join(F.broadcast(exact), "term", "left")
        .select(
            "term",
            F.coalesce("exact_freq", zero).alias("exact_freq"),
            "cms_estimate",
            (F.col("cms_estimate") - F.coalesce("exact_freq", zero)).alias("overcount"),
        )
    )


def _misra_gries_candidates(keyed: DataFrame, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries (Misra & Gries 1982):
    candidate keys PLUS one NULL-key row carrying the partition's exact
    row count. MG guarantees per-partition undercount <= N_p/(capacity+1),
    so any item with GLOBAL count > N/(capacity+1) exceeds that bound
    in at least one partition (pigeonhole over the partition sums) and
    must appear in that partition's summary — the union of summary
    keys is therefore a certified superset of every global heavy
    hitter. Arrow-batched; state is one dict of <= capacity counters
    per task regardless of partition size.

    The ``n`` column (round 14): the MG pass already touches every row,
    so it counts them for free — sum of the NULL-key rows' ``n`` is the
    exact stream total N the threshold test needs, and no later pass
    has to re-scan the stream just for count(*). Candidate rows carry
    n=0 so the sum is unpolluted. The NULL sentinel cannot alias a real
    key: the caller filters NULL keys before this pass."""

    def summarize(batches):
        import pandas as pd

        summary = pd.Series(dtype="int64")
        dtype = None
        nrows = 0
        for pdf in batches:
            dtype = pdf["k"].dtype
            nrows += len(pdf)
            summary = _mg_merge(summary, pdf["k"], capacity)
        if len(summary):
            # keys keep their native dtype (int64 keys must not decay
            # to float via a mixed-None column — 2^53 corruption class)
            yield pd.DataFrame(
                {
                    "k": pd.Series(summary.index, dtype=dtype),
                    "n": pd.Series([0] * len(summary), dtype="int64"),
                }
            )
        if nrows:
            yield pd.DataFrame(
                {
                    "k": pd.Series([None], dtype="object"),
                    "n": pd.Series([nrows], dtype="int64"),
                }
            )

    k_type = keyed.schema["k"].dataType.simpleString()
    return keyed.mapInPandas(summarize, f"k {k_type}, n long")


def _mg_merge(summary, batch, capacity: int):
    """Mergeable-summaries form of MG (Agarwal et al. 2013): the batch
    is summarized exactly by value_counts (vectorized), added into the
    running summary, then reduced back to <= `capacity` keys by
    subtracting the (capacity+1)-th largest counter from all and
    dropping non-positives — the same N/(capacity+1) undercount bound
    as item-at-a-time MG, at O(batch + summary log summary) per batch.
    Pure pandas: property-tested directly in tests/test_sketch_rollup."""
    summary = summary.add(batch.value_counts(), fill_value=0)
    if len(summary) > capacity:
        cut = summary.nlargest(capacity + 1).iloc[-1]
        summary = summary[summary > cut] - cut
    return summary


def heavy_hitters_exact(
    df: DataFrame,
    key: Column,
    threshold_num: int,
    threshold_den: int,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters — every key with count*den >= N*num (share
    >= num/den) with its exact count and share — WITHOUT a
    full-cardinality shuffle. Two passes over the stream:

      1. per-partition Misra-Gries (capacity ~ den/num counters) emits
         a certified candidate superset: <= capacity keys per TASK, so
         even at 1000 executors the candidate frame is broadcast-sized;
      2. a broadcast semi join filters the stream to candidates and an
         exact groupBy counts ONLY them — the shuffle carries the
         candidate slice, never the tail vocabulary.

    The threshold test is pure integer arithmetic (count*den >= N*num)
    so the output is bit-exact and plain-SQL-oracle-checkable; the
    lossy sketch only routes work, exactly like bloom_prefilter_ingest."""
    if capacity is None:
        capacity = max(2 * ((threshold_den + threshold_num - 1) // threshold_num), 8)
    if (capacity + 1) * threshold_num <= threshold_den:
        # the MG certificate only covers keys with count > N/(cap+1);
        # a smaller capacity could prune a key that meets the output
        # threshold — silently breaking the EXACT contract
        raise ValueError(
            f"capacity {capacity} cannot certify threshold "
            f"{threshold_num}/{threshold_den}: need (capacity+1)*num > den"
        )
    keyed = df.select(key.alias("k")).where(F.col("k").isNotNull())
    # TWO stream scans total, and pass 2 stays the cheap semi-join shape
    # (round 14, settling the r13 sf0.1 regression; guide §2.3): the MG
    # pass already reads every row, so it emits the exact stream total
    # alongside the candidate keys (the NULL-key rows' ``n``) — the old
    # third count(*) scan is gone WITHOUT r13's NULL-key left-join fold,
    # whose +2 tiny-frame exchanges and all-rows hash aggregation
    # measured +21% wall / 1,914 → 5,487 shuffle bytes at sf0.1. The
    # summary frame is consumed twice (total, candidate keys), so it is
    # eagerly localCheckpoint'd: one MG scan materializes task-bounded
    # rows (<= capacity+1 per task), blocks are GC-cleaned with the
    # frame — no session-lifetime persist to leak.
    cands = _misra_gries_candidates(keyed, capacity).localCheckpoint()
    total = cands.agg(F.sum("n").alias("_n"))
    counts = (
        keyed.join(F.broadcast(cands.where(F.col("k").isNotNull()).select("k")),
                   "k", "left_semi")
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("freq") * F.lit(threshold_den) >= F.col("_n") * F.lit(threshold_num))
        .select(
            "k",
            "freq",
            F.round(F.col("freq") * 100.0 / F.col("_n"), 6).alias("share_pct"),
        )
    )


def hll_merge(regs: DataFrame, group: tuple[str, ...] = ()) -> DataFrame:
    """Union-merge of HLL register tables: registers are max-monotone,
    so ANY pile of per-partition / per-delivery / per-day register
    frames merges by one groupBy(max) into the register table of the
    union of their inputs — losslessly (bit-identical to sketching the
    union directly). This is the read side of the streaming sketch
    store: merge kilobytes of registers, never rescan raw events."""
    return regs.groupBy(*group, "j").agg(F.max("r").alias("r"))
