"""BPE learner vs a pure-Python reference implementation.

The catalog oracle (test_catalog_oracle) proves Spark == DuckDB on the
real corpus, but the word-soup test data never produces overlapping
pair matches ("aaa" + merge (a,a)) — the one place the greedy
left-to-right semantics and the islands-trick encoding could diverge.
These tests drive exactly those cases against the textbook sequential
algorithm (Sennrich et al. 2016, alg. 1)."""

from __future__ import annotations

from collections import Counter

from crypto_data_pipeline_spark.operators import bpe
import pytest


def _ref_apply(syms: list[str], left: str, right: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_learn(word_freq: dict[str, int], n_merges: int):
    syms = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, f in word_freq.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        syms = {w: _ref_apply(s, left, right) for w, s in syms.items()}
    return merges, syms


def _spark_words(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")


def _collect_syms(df):
    rows = df.orderBy("word", "pos").collect()
    out: dict[str, list[str]] = {}
    for r in rows:
        out.setdefault(r["word"], []).append(r["sym"])
    return out


@pytest.mark.slow
def test_apply_merge_overlapping_runs(spark):
    """aaaa -> [aa, aa]; aaa -> [aa, a]; banana (a,n) -> [b, an, an, a]."""
    docs = _spark_words(spark, ["aaaa aaa banana"])
    syms = bpe.initial_symbols(bpe.word_frequencies(docs))
    m_aa = _collect_syms(bpe.apply_merge(syms, "a", "a"))
    assert m_aa["aaaa"] == ["aa", "aa"]
    assert m_aa["aaa"] == ["aa", "a"]
    assert m_aa["banana"] == ["b", "a", "n", "a", "n", "a"]
    m_an = _collect_syms(bpe.apply_merge(syms, "a", "n"))
    assert m_an["banana"] == ["b", "an", "an", "a"]
    assert m_an["aaaa"] == ["a", "a", "a", "a"]


def test_learn_matches_reference_on_pathological_words(spark):
    texts = ["aaaa aaa aa banana bananana abab ababab",
             "aaaa banana abab abab aaa aaa"]
    word_freq: Counter = Counter(w for t in texts for w in t.split())
    ref_merges, ref_syms = _ref_learn(dict(word_freq), 4)

    docs = _spark_words(spark, texts)
    merges, syms_df = bpe.learn_bpe(spark, docs, n_merges=4)
    got_syms = _collect_syms(syms_df)
    syms_df.unpersist()

    assert [(m["left_sym"], m["right_sym"], m["pair_freq"]) for m in merges] == ref_merges
    assert got_syms == {w: s for w, s in ref_syms.items()}


def test_learn_stops_when_no_pairs_left(spark):
    docs = _spark_words(spark, ["a b c"])
    merges, syms_df = bpe.learn_bpe(spark, docs, n_merges=5)
    syms_df.unpersist()
    assert merges == []


def _ref_fold(xs, base):
    h = 0
    for x in xs:
        h = (h * base + x) % 2147483647
    return h


def _ref_word_code(pieces):
    return _ref_fold([_ref_fold([ord(c) for c in p], 131) for p in pieces], 1000003)


def test_word_pieces_reconstructs_and_codes(spark):
    """Every word's pieces concatenate back to the word, and word_code
    equals the pure-Python triple fold."""
    texts = ["aaaa aaa banana bananana abab", "banana abab aaaa aaa aaa"]
    docs = _spark_words(spark, texts)
    _, syms = bpe.learn_bpe(spark, docs, n_merges=3)
    rows = bpe.word_pieces(syms).collect()
    syms.unpersist()
    assert rows
    for r in rows:
        assert "".join(r["pieces"]) == r["word"]
        assert r["n_pieces"] == len(r["pieces"])
        assert r["word_code"] == _ref_word_code(r["pieces"])


def test_encode_docs_matches_reference_sequence(spark):
    """encode_docs' (n_tokens, seq_hash) equal the fold over the
    textbook sequential encoder's per-doc subword stream — exact
    sequence semantics, not just counts."""
    texts = ["aaaa banana abab", "aaa bananana aaaa aaaa", ""]
    word_freq: Counter = Counter(w for t in texts for w in t.split())
    ref_merges, ref_syms = _ref_learn(dict(word_freq), 3)

    docs = _spark_words(spark, texts)
    _, syms = bpe.learn_bpe(spark, docs, n_merges=3)
    got = {r["doc_id"]: r for r in bpe.encode_docs(docs, syms).collect()}
    syms.unpersist()

    assert set(got) == {0, 1}  # empty doc produces no row
    for doc_id, t in enumerate(texts[:2]):
        words = t.split()
        exp_tokens = sum(len(ref_syms[w]) for w in words)
        exp_hash = _ref_fold([_ref_word_code(ref_syms[w]) for w in words], 8191)
        assert got[doc_id]["n_tokens"] == exp_tokens
        assert got[doc_id]["seq_hash"] == exp_hash


def test_encode_docs_oov_falls_back_to_characters(spark):
    """Encoding NEW docs with a fitted vocabulary: out-of-vocabulary
    words decompose to characters (standard BPE alphabet fallback) —
    they are counted and pinned, never silently dropped."""
    fit = _spark_words(spark, ["aaaa aaa banana"])
    _, syms = bpe.learn_bpe(spark, fit, n_merges=2)
    new = _spark_words(spark, ["banana zq aaaa"])  # zq is OOV
    got = {r["doc_id"]: r for r in bpe.encode_docs(new, syms).collect()}
    syms.unpersist()

    word_freq = Counter("aaaa aaa banana".split())
    ref_merges, ref_syms = _ref_learn(dict(word_freq), 2)
    exp_tokens = len(ref_syms["banana"]) + 2 + len(ref_syms["aaaa"])  # zq -> z,q
    assert got[0]["n_tokens"] == exp_tokens
    zq_code = _ref_fold([ord("z"), ord("q")], 1000003)
    exp_hash = _ref_fold(
        [_ref_word_code(ref_syms["banana"]), zq_code, _ref_word_code(ref_syms["aaaa"])],
        8191,
    )
    assert got[0]["seq_hash"] == exp_hash
