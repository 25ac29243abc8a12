"""Byte-pair-encoding vocabulary learning as DataFrame algebra.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"):
repeatedly merge the most frequent adjacent symbol pair. The classic
implementation runs on a word-frequency dictionary, not the corpus —
and that is exactly the distributed shape here:

  * ONE corpus-sized shuffle builds the (word, freq) table; at 100 TB
    the corpus is touched once and never again.
  * Every merge iteration then runs on the vocab-sized symbol table
    (unique words x word length), partitioned by word — each step is
    a lead/lag window pass plus a tiny pair-count aggregation, with
    the Exchange on `word` reused across all window passes.
  * The per-step argmax is a 1-row collect (the learned merge rule —
    model state, not data).

Greedy left-to-right merge application over overlapping matches
("aaa" + (a,a) -> ["aa", "a"]) is the sequential-looking part, and it
is expressed as the gaps-and-islands trick: runs of consecutive
matching positions are islands, and within each island the even
offsets are the non-overlapping matches. Both engines (Spark and the
DuckDB oracle, see plans/extension_queries.py) run the identical
window algebra, so vocabulary learning hash-checks end to end despite
being inherently iterative.

No UDFs anywhere: pair counting, island grouping, and sequence
rebuild are all JVM window/aggregate expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from crypto_data_pipeline_spark.operators.text import tokens


def word_frequencies(docs: DataFrame, text: str = "text") -> DataFrame:
    """(word, freq): the only corpus-sized job in the whole learner."""
    return (
        docs.select(F.explode(tokens(text)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """Exploded char-level start state: (word, freq, pos, sym)."""
    return (
        words.select(
            "word",
            "freq",
            F.posexplode(F.split(F.col("word"), "")).alias("pos", "sym"),
        )
        # guard against engines that emit a trailing '' on empty-regex
        # split; the filter keeps positions dense either way
        .where(F.col("sym") != "")
    )


def top_pair(syms: DataFrame) -> tuple[str, str, int] | None:
    """Most frequent adjacent pair, tie-broken (count DESC, l, r) so
    the learned vocabulary is deterministic across engines."""
    w = Window.partitionBy("word").orderBy("pos")
    rows = (
        syms.withColumn("nxt", F.lead("sym").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy("sym", "nxt")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("sym").asc(), F.col("nxt").asc())
        .limit(1)
        .collect()
    )
    if not rows:
        return None
    r = rows[0]
    return (r["sym"], r["nxt"], r["cnt"])


def apply_merge(syms: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy non-overlapping replacement of (left, right) -> left||right
    in every word's symbol sequence — islands over match positions."""
    w = Window.partitionBy("word").orderBy("pos")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    matched = F.coalesce(
        (F.col("sym") == left) & (F.lead("sym").over(w) == right), F.lit(False)
    )
    df = syms.withColumn("mt", matched)
    df = df.withColumn(
        "grp", F.col("pos") - F.sum(F.col("mt").cast("int")).over(cum)
    )
    wrun = Window.partitionBy("word", "mt", "grp").orderBy("pos")
    df = df.withColumn(
        "sel",
        F.when(F.col("mt"), (F.row_number().over(wrun) - 1) % 2 == 0).otherwise(
            F.lit(False)
        ),
    )
    df = df.withColumn("absorbed", F.coalesce(F.lag("sel").over(w), F.lit(False)))
    return (
        df.where(~F.col("absorbed"))
        .select(
            "word",
            "freq",
            (F.row_number().over(w) - 1).alias("pos"),
            F.when(F.col("sel"), F.lit(left + right)).otherwise(F.col("sym")).alias("sym"),
        )
    )


from crypto_data_pipeline_spark.operators.dedup import PORTABLE_BASE, PORTABLE_MOD

# Fold bases for the encode pins. Char-level IS the portable family's
# base (imported, so the cross-engine portability proof this leans on
# cannot silently diverge); the two outer folds use odd primes small
# enough that residue*base + residue stays < 2^62.
_CHAR_BASE = PORTABLE_BASE
_PIECE_BASE = 1000003
_DOC_BASE = 8191
_FOLD_MOD = PORTABLE_MOD


def _fold(arr: Column, base: int) -> Column:
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda h, x: (h * F.lit(base) + x) % F.lit(_FOLD_MOD),
    )


def word_pieces(syms: DataFrame) -> DataFrame:
    """The fitted tokenizer as a lookup table: one row per distinct
    word with its ordered subword decomposition plus the integer
    summaries every downstream consumer actually joins on —
    ``n_pieces`` (subword count) and ``word_code`` (a polynomial fold
    over per-piece char folds, pinning the exact decomposition,
    boundaries included). Vocab-sized, hence always broadcastable:
    this frame IS the model artifact BPE encode ships to 1000
    executors."""
    piece_hash = _fold(F.transform(F.split(F.col("sym"), ""), F.ascii), _CHAR_BASE)
    return (
        syms.groupBy("word")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("sym")))
            ).alias("_ps")
        )
        .select(
            "word",
            F.transform("_ps", lambda s: s["sym"]).alias("pieces"),
        )
        .select(
            "word",
            "pieces",
            F.size("pieces").cast("long").alias("n_pieces"),
            _fold(
                F.transform("pieces", lambda p: _fold(F.transform(F.split(p, ""), F.ascii), _CHAR_BASE)),
                _PIECE_BASE,
            ).alias("word_code"),
        )
    )


def encode_docs(
    docs: DataFrame,
    syms: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Tokenize the corpus with a fitted BPE symbol frame: per doc,
    ``n_tokens`` (subword count) and ``seq_hash`` (fold of word codes
    in document order — pins the exact token sequence, subword
    boundaries included). Docs whose normalized text has no words
    produce no row, matching the learner's census.

    Out-of-vocabulary words (absent from the fit corpus) fall back to
    their CHARACTER decomposition — the standard BPE behavior for a
    known alphabet: n_pieces = length, word_code = the fold over
    per-char piece hashes (a single char's piece hash is its code
    point, so the fallback is one JVM expression, no join miss ever
    drops a word).

    100 TB shape: BPE encoding factors through the word — identical
    words always tokenize identically — so the per-word merge work
    happens ONCE on the vocab-sized fitted table (`word_pieces`,
    broadcast), never on the corpus. The corpus is touched by exactly
    one explode + broadcast join, and per-doc reassembly is one
    groupBy on `id_col` carrying only three integers per word (widx,
    n_pieces, word_code) — no windows, no per-token rows, no text in
    the shuffle."""
    wp = word_pieces(syms).select("word", "n_pieces", "word_code")
    keys = [id_col, *carry]
    ex = (
        docs.select(
            *keys, F.posexplode(tokens(text)).alias("widx", "word")
        )
        .where(F.col("word") != "")
    )
    oov_pieces = F.length("word").cast("long")
    oov_code = _fold(F.transform(F.split(F.col("word"), ""), F.ascii), _PIECE_BASE)
    ex = (
        ex.join(F.broadcast(wp), "word", "left")
        .withColumn("n_pieces", F.coalesce("n_pieces", oov_pieces))
        .withColumn("word_code", F.coalesce("word_code", oov_code))
    )
    return (
        ex
        .groupBy(*keys)
        .agg(
            F.sum("n_pieces").cast("long").alias("n_tokens"),
            _fold(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("widx"), F.col("word_code")))
                    ),
                    lambda s: s["word_code"],
                ),
                _DOC_BASE,
            ).alias("seq_hash"),
        )
    )


def learn_bpe(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 3,
    text: str = "text",
) -> tuple[list[dict], DataFrame]:
    """Run `n_merges` BPE iterations; returns (merge table rows, final
    symbol frame). The final frame is persisted (vocab-sized — it is
    the fitted tokenizer state, the analogue of the ANN index cache);
    intermediate generations are materialized then released."""
    syms = initial_symbols(word_frequencies(docs, text)).persist()
    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        best = top_pair(syms)
        if best is None:
            break
        left, right, cnt = best
        nxt = apply_merge(syms, left, right).persist()
        nxt.count()  # materialize the child before dropping the parent
        syms.unpersist()
        syms = nxt
        merges.append(
            {
                "step": step,
                "left_sym": left,
                "right_sym": right,
                "merged": left + right,
                "pair_freq": int(cnt),
            }
        )
    return merges, syms
