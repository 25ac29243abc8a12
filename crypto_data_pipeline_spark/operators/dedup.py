"""Deduplication operators for the `documents` table (north star ops).

Five families, from exact to fuzzy:

  * exact       — md5 over normalized text, hash-groupBy (one shuffle).
  * minhash+LSH — shingle → minhash signature → band → bucket join →
                  candidate pairs → exact-Jaccard verify.
  * simhash     — 64-bit sign-of-weighted-bits fingerprint; near-dup =
                  small Hamming distance, banded for bucketing.
  * n-gram Jaccard — exact verified similarity on candidate pairs.
  * embedding cosine — see similarity.py.

Scale design: nothing here ever materializes an O(n²) cross product.
Candidate generation is always a shuffle-on-bucket-key equi-join (LSH
bands / simhash bands), so cost is O(sum of bucket sizes²) — the
standard web-scale dedup layout (MinHashLSH as in Broder '97 /
the Spark MLlib MinHashLSH design, re-expressed with higher-order
array functions so signatures stay inside codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from crypto_data_pipeline_spark.operators.text import normalized, tokens


# ---------------------------------------------------------------------------
# exact


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Hash-groupBy duplicate census: one row per distinct normalized
    text, with the member count and the survivor (min id)."""
    return (
        df.withColumn("content_hash", F.md5(normalized(text)))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Keep exactly one row (min id) per normalized-content hash.
    Window-over-hash instead of join-back → single shuffle."""
    w = Window.partitionBy("content_hash").orderBy(id_col)
    return (
        df.withColumn("content_hash", F.md5(normalized(text)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# shingles + minhash


def word_shingles(text: str = "text", k: int = 3) -> Column:
    """Distinct k-word shingles of the normalized text (k-shingling as
    in Broder's resemblance paper). Short docs (<k words) contribute
    their whole text as one shingle."""
    toks = tokens(text)
    n = F.size(toks)
    shingled = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return F.array_distinct(F.when(n >= k, shingled).otherwise(F.array(F.concat_ws(" ", toks))))


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """num_hashes-long minhash signature: h_j = min over shingles of
    xxhash64(shingle, j). Arrays + higher-order functions only — the
    signature computation never leaves the JVM."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s, j=j: F.xxhash64(s, F.lit(j))))
            for j in range(num_hashes)
        ]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash-LSH banding: split the signature into `bands` bands of
    r = num_hashes/bands rows, hash each band, shuffle on
    (band_idx, band_hash), emit intra-bucket pairs (a < b).

    Returns distinct candidate pairs (id_a, id_b)."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signature(word_shingles(text, shingle_k), num_hashes)
    banded = df.select(F.col(id_col).alias("id"), sig.alias("sig")).select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.xxhash64(F.slice(F.col("sig"), b * r + 1, r)).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "band.band_idx", "band.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_verified_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs: join each side back to
    its distinct shingle set, intersect/union with array functions."""
    sets_ = df.select(F.col(id_col).alias("id"), word_shingles(text, shingle_k).alias("sh"))
    out = (
        candidates.join(sets_.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sets_.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def minhash_dedup_pairs(df: DataFrame, threshold: float = 0.7, **kw) -> DataFrame:
    """End-to-end MinHash-LSH near-dup detection: LSH candidates →
    exact-Jaccard verification at `threshold`."""
    cands = lsh_candidate_pairs(df, **kw)
    return jaccard_verified_pairs(df, cands, threshold=threshold)


# ---------------------------------------------------------------------------
# simhash


def simhash64(text: str = "text") -> Column:
    """Charikar simhash: per token take xxhash64, accumulate +1/-1 per
    bit across tokens, sign-pack into a 64-bit long. One aggregate over
    the token array with a 64-length accumulator — single pass, no
    explode, no Python."""
    toks = tokens(text)

    def contrib(t: Column) -> Column:
        h = F.xxhash64(t)
        return F.array(
            *[
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                for i in range(64)
            ]
        )

    acc = F.aggregate(
        toks,
        F.array(*[F.lit(0) for _ in range(64)]),
        lambda a, t: F.zip_with(a, contrib(t), lambda x, y: x + y),
    )
    # sign-pack: bit 63 is the two's-complement sign bit of the long
    packed = F.lit(0).cast("long")
    for i in range(64):
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        packed = packed.bitwiseOR(
            F.when(F.element_at(acc, i + 1) > 0, F.lit(bit_val).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return packed


def simhash_candidate_pairs(df: DataFrame, id_col: str = "doc_id", text: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash: band the 64 bits into 4 × 16-bit keys
    (any pair within Hamming distance 3 must agree on ≥1 band), bucket-
    join, verify true Hamming distance with bit_count(xor)."""
    sh = df.select(F.col(id_col).alias("id"), simhash64(text).alias("sh"))
    bands = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright("sh", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("band_key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("band"),
    ).select("id", "sh", "band.band_idx", "band.band_key")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"))
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
