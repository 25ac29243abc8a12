"""Recall/precision tests for the hash-based dedup + ANN operators —
the check the DuckDB oracle can't do (xxhash64 isn't reproducible in
SQL), promised by the rows-only catalog entries.

Ground truth is brute-force: all-pairs exact Jaccard over word
3-shingles (dedup) and exact cosine top-k (similarity), computed with
plain Python/numpy on the collected sf0.001 corpus (500 docs → trivial
driver-side; this is a TEST oracle, never a production path).
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from pyspark.sql import functions as F

from crypto_data_pipeline_spark.operators import dedup, similarity
from crypto_data_pipeline_spark.sources.tables import load_table

THRESHOLD = 0.5


def _norm_tokens(text: str) -> list[str]:
    return " ".join(text.lower().strip().split()).split(" ")


def _shingles(text: str, k: int = 3) -> frozenset[str]:
    toks = _norm_tokens(text)
    if len(toks) < k:
        return frozenset([" ".join(toks)])
    return frozenset(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1))


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    rows = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    return {r.doc_id: r.text for r in rows}


@pytest.fixture(scope="module")
def true_pairs(corpus):
    """All-pairs exact-Jaccard ground truth at THRESHOLD."""
    sh = {i: _shingles(t) for i, t in corpus.items()}
    out = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if inter == 0:
            continue
        j = inter / len(sh[a] | sh[b])
        if j >= THRESHOLD:
            out[(a, b)] = j
    return out


def test_minhash_signature_is_a_real_minhash(spark):
    """The signature family's statistical contract, pinned at unit
    speed: (1) the 32 mask slots are DISTINCT values on a nontrivial
    doc (the round-10 dedup scale probe caught them collapsing to one
    mask-free value — a PySpark HOF lambda bound its mask as a second
    parameter, which silently becomes the array index); (2) per-slot
    agreement between two sets estimates their exact Jaccard (the
    defining minhash property — the collapsed signature read 0/32 on a
    J=0.78 pair)."""
    import itertools

    docs = spark.createDataFrame(
        [
            (0, " ".join(f"w{i}" for i in range(40))),
            (1, " ".join(f"w{i}" for i in itertools.chain(range(30), range(100, 110)))),
        ],
        ["doc_id", "text"],
    )
    sets = dedup.hashed_shingle_sets(docs)
    sig = dedup._signature_from_hashes(F.col("hs"), 32)
    rows = {r.doc_id: r for r in sets.select(
        F.col("id").alias("doc_id"), "hs", sig.alias("s")).collect()}
    assert len(set(rows[0].s)) > 16, "signature slots collapsed to few values"
    j = len(set(rows[0].hs) & set(rows[1].hs)) / len(set(rows[0].hs) | set(rows[1].hs))
    agree = sum(1 for a, b in zip(rows[0].s, rows[1].s) if a == b) / 32
    # J ~= 0.56 here; a binomial(32, J) stays within +-0.3 of J with
    # overwhelming probability, and the degenerate signature reads 0.0
    assert abs(agree - j) < 0.3, (agree, j)


def test_minhash_lsh_recall_and_precision(spark, sf_dir, true_pairs):
    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_dedup_pairs(docs, threshold=THRESHOLD).collect()
    }
    assert true_pairs, "fixture corpus must contain near-dup pairs"
    # precision 1.0: every emitted pair IS a true near-dup pair (the
    # final stage verifies exact Jaccard, so no false positives beyond
    # 64-bit shingle-hash collisions)
    assert set(got) <= set(true_pairs)
    # recall: banding (8 bands × 4 rows) catches >= 90% at J >= 0.5 in
    # expectation; require 0.8 as a stable floor
    recall = len(got) / len(true_pairs)
    assert recall >= 0.8, f"minhash recall {recall:.2f} over {len(true_pairs)} true pairs"


def test_ngram_jaccard_prefix_filter_exact(spark, sf_dir, true_pairs):
    """Prefix filtering is lossless: the operator must return EXACTLY
    the brute-force all-pairs truth — same pairs, same values."""
    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=THRESHOLD).collect()
    }
    assert set(got) == set(true_pairs)
    for (a, b), j in got.items():
        assert abs(j - true_pairs[(a, b)]) < 1e-5


@pytest.mark.slow
def test_simhash_hamming_is_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.simhash_candidate_pairs(docs, max_hamming=3).collect()
    sh = {
        r.id: r.sh
        for r in docs.selectExpr("doc_id AS id")
        .join(
            docs.selectExpr("doc_id AS id", "text"),
            "id",
        )
        .select("id", dedup.simhash64("text").alias("sh"))
        .collect()
    }
    for r in pairs:
        assert r.id_a < r.id_b
        recomputed = bin((sh[r.id_a] ^ sh[r.id_b]) & 0xFFFFFFFFFFFFFFFF).count("1")
        assert recomputed == r.hamming <= 3


def test_exact_dedup_idempotent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    once = dedup.exact_dedup(docs)
    assert once.count() == dedup.exact_dedup(once).count()
    assert once.groupBy("content_hash").count().where("count > 1").count() == 0


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    rows = load_table(spark, sf_dir, "embeddings").collect()
    ids = [r.vec_id for r in rows]
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


def _np_topk(ids, mat, k=5, n_queries=10):
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = normed[: n_queries] @ normed.T
    truth = {}
    for qi in range(n_queries):
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[qi]),
            key=lambda i: (-sims[qi, i], ids[i]),
        )
        truth[ids[qi]] = [ids[i] for i in order[:k]]
    return truth


def test_brute_force_topk_matches_numpy(spark, sf_dir, emb):
    ids, mat = emb
    truth = _np_topk(ids, mat)
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where("vec_id < 10").selectExpr("vec_id AS query_id", "embedding")
    got: dict[int, list[int]] = {}
    for r in similarity.brute_force_topk(embs, queries, k=5).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    for q, ranked in got.items():
        assert [v for _, v in sorted(ranked)] == truth[q]


def test_arrow_topk_equals_jvm_baseline(spark, sf_dir, emb):
    """The partition-local-topk Arrow formulation must reproduce the
    crossJoin+window baseline exactly (same rows, same rounded scores,
    same ranks) — it is the same exact operator with a scalable
    physical plan."""
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where("vec_id < 10").selectExpr("vec_id AS query_id", "embedding")
    base = {tuple(r) for r in similarity.brute_force_topk(embs, queries, k=5).collect()}
    arrow = {tuple(r) for r in similarity.brute_force_topk_arrow(embs, queries, k=5).collect()}
    assert arrow == base


def test_ivf_topk_recall_floor(spark, sf_dir, emb):
    ids, mat = emb
    truth = _np_topk(ids, mat)
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where("vec_id < 10").selectExpr("vec_id AS query_id", "embedding")
    got: dict[int, set[int]] = {}
    for r in similarity.ivf_topk(embs, queries, k=5).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(got.get(q, set()) & set(t)) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    # nprobe/n_centroids = 1/4 of the corpus scored; on weakly
    # clustered vectors recall tracks that fraction plus locality gains
    assert hits / total >= 0.2, f"IVF recall {hits}/{total}"


def test_lsh_topk_recall_floor(spark, sf_dir, emb):
    ids, mat = emb
    truth = _np_topk(ids, mat)
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where("vec_id < 10").selectExpr("vec_id AS query_id", "embedding")
    got: dict[int, set[int]] = {}
    for r in similarity.lsh_topk(embs, queries, k=5).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(got.get(q, set()) & set(t)) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    # random-hyperplane LSH on near-random vectors is recall-lossy by
    # design; it must still beat a trivial floor and return k rows/query
    assert hits / total >= 0.2, f"LSH recall {hits}/{total}"


def test_lsh_multiprobe_recall_dominates_single_probe(spark, sf_dir, emb):
    """Multi-probe LSH (Lv et al. 2007) against the SAME index: per
    extra flipped bit, the candidate set only grows (probe sets are
    supersets), so recall is monotone in probes_per_table — and on
    this fixture the 2-flip probe must strictly beat single-probe
    (measured 0.44 → 0.86 at sf0.001). Also pins the two contract
    edges: probes_per_table=0 reproduces the single-probe result
    byte-for-byte (same rows, scores, ranks), and an out-of-range
    probe count fails loud instead of silently clamping."""
    ids, mat = emb
    truth = _np_topk(ids, mat)
    total = sum(len(t) for t in truth.values())
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where("vec_id < 10").selectExpr("vec_id AS query_id", "embedding")
    index = similarity.build_lsh_keys(embs)

    def recall(npr: int) -> float:
        got: dict[int, set[int]] = {}
        rows = similarity.lsh_topk(
            embs, queries, k=5, corpus_keys=index, probes_per_table=npr
        ).collect()
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.vec_id)
        return sum(len(got.get(q, set()) & set(t)) for q, t in truth.items()) / total

    r0, r1, r2 = recall(0), recall(1), recall(2)
    assert r0 <= r1 <= r2, (r0, r1, r2)
    assert r2 > r0, "2-flip multi-probe must beat single-probe on this fixture"
    assert r2 >= 0.5, f"multi-probe recall {r2}"

    base = {tuple(r) for r in similarity.lsh_topk(embs, queries, k=5, corpus_keys=index).collect()}
    zero = {
        tuple(r)
        for r in similarity.lsh_topk(
            embs, queries, k=5, corpus_keys=index, probes_per_table=0
        ).collect()
    }
    assert zero == base

    with pytest.raises(ValueError, match="probes_per_table"):
        similarity.lsh_topk(embs, queries, k=5, corpus_keys=index, probes_per_table=6)


def test_multiprobe_key_set_is_superset_of_single_probe(spark, sf_dir):
    """The construction-level invariant behind monotone recall: the
    multi-probe key set CONTAINS the single-probe (t, base-bucket)
    keys for every query and every table, plus exactly n_flip extra
    distinct buckets per (query, table) — a flipped bit always changes
    the bucket and two different flips differ, so the (1+n_flip)
    probes per table are all distinct. Pins the generator itself, so a
    refactor of the key expression cannot silently drop the base probe
    or collapse flips."""
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where("vec_id < 10").selectExpr("vec_id AS query_id", "embedding")
    single = queries.select(
        "query_id",
        F.explode(similarity._table_buckets("embedding", 64, 5, 10, 42)).alias("tb"),
    ).select("query_id", "tb.t", "tb.b")
    multi = similarity.multiprobe_query_keys(
        queries, "query_id", "embedding", dim=64, bits=5, tables=10, seed=42, n_flip=2
    )
    s = {tuple(r) for r in single.collect()}
    m = {tuple(r) for r in multi.collect()}
    assert s <= m, f"missing base probes: {sorted(s - m)[:5]}"
    assert len(m) == 3 * len(s)  # (1 + n_flip) distinct buckets per (query, table)


def test_lsh_query_keys_arrow_matches_expression_forms(spark, sf_dir):
    """The round-13 Arrow query-key path (lsh_query_keys — sequential
    Python folds, planes in the closure) must reproduce the expression
    forms KEY FOR KEY, at single-probe and multi-probe, including
    multiplicity: lsh_topk's candidate sets — and the hash-gated
    multiprobe driver row — depend on it bit for bit."""
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where("vec_id < 10").selectExpr("vec_id AS query_id", "embedding")
    expr_single = queries.select(
        "query_id",
        F.explode(similarity._table_buckets("embedding", 64, 5, 10, 42)).alias("tb"),
    ).select("query_id", "tb.t", "tb.b")
    arrow_single = similarity.lsh_query_keys(
        queries, "query_id", "embedding", 64, 5, 10, 42, n_flip=0
    )
    assert sorted(map(tuple, expr_single.collect())) == sorted(
        map(tuple, arrow_single.collect())
    )
    expr_multi = similarity.multiprobe_query_keys(
        queries, "query_id", "embedding", dim=64, bits=5, tables=10, seed=42, n_flip=2
    )
    arrow_multi = similarity.lsh_query_keys(
        queries, "query_id", "embedding", 64, 5, 10, 42, n_flip=2
    )
    assert sorted(map(tuple, expr_multi.collect())) == sorted(
        map(tuple, arrow_multi.collect())
    )


def test_duplicated_spans_merges_maximal_runs(spark):
    """Lee-et-al span semantics on a hand fixture: a 4-token phrase
    shared by two docs yields one merged span per doc (two overlapping
    3-gram windows → span_len 4), a within-doc repeat counts as
    duplicated, and unique text yields nothing."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox sat alone"),
            (2, "then the quick brown fox ran"),
            (3, "x y z x y z"),          # within-doc repeat of 'x y z'
            (4, "entirely unique words here"),
        ],
        "doc_id long, text string",
    )
    spans = {
        (r.doc_id, r.span_start, r.span_len)
        for r in dedup.duplicated_spans(docs, k=3).collect()
    }
    # shared phrase 'the quick brown fox' (4 tokens): doc 1 windows
    # 0,1 → span (0, 4); doc 2 windows 1,2 → span (1, 4)
    assert (1, 0, 4) in spans and (2, 1, 4) in spans
    # doc 3: 'x y z x' unique; 'x y z' at 0 and 3 duplicated, 'y z x'
    # 'z x y' unique → two disjoint spans of exactly the phrase
    assert (3, 0, 3) in spans and (3, 3, 3) in spans
    assert not any(d == 4 for d, _, _ in spans)


def test_pq_encode_and_adc_mechanics(spark, sf_dir, emb):
    """PQ sanity on the real corpus: a codebook vector encodes to its
    own code in every subspace (self-distance 0 is a unique argmin),
    codes are well-formed, and the ADC score of a codebook vector
    against its own query distance table is ~0."""
    embs = load_table(spark, sf_dir, "embeddings")
    books = similarity.build_fixed_pq_codebook(embs, list(range(16)), m=8)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    codes = {r.vec_id: r.codes for r in similarity.pq_encode(embs, books).collect()}
    assert set(codes) == {r.vec_id for r in embs.select("vec_id").collect()}
    for cid in range(16):
        assert codes[cid] == [cid] * 8, f"codebook vector {cid} not self-coded"
    assert all(0 <= c < 16 for cs in codes.values() for c in cs)


def test_pq_topk_recall_floor(spark, sf_dir, emb):
    ids, mat = emb
    truth = _np_topk(ids, mat)
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where("vec_id < 10").selectExpr("vec_id AS query_id", "embedding")
    books = similarity.build_fixed_pq_codebook(embs, list(range(16)), m=8)
    got: dict[int, set[int]] = {}
    for r in similarity.pq_topk(embs, queries, books, k=5).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    assert all(len(v) == 5 for v in got.values())
    hits = sum(len(got.get(q, set()) & set(t)) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    # 16-entry sub-codebooks quantize hard; ADC must still beat the
    # trivial floor (random 5-of-500 would land ~0.01)
    assert hits / total >= 0.2, f"PQ recall {hits}/{total}"


def test_ivfpq_topk_recall_floor(spark, sf_dir, emb):
    """IVFPQ compounds both pruning losses (nprobe cells × code
    quantization) and must still beat the trivial floor; measured 0.28
    on this fixture."""
    ids, mat = emb
    truth = _np_topk(ids, mat)
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where("vec_id < 10").selectExpr("vec_id AS query_id", "embedding")
    books = similarity.build_fixed_pq_codebook(embs, list(range(16)), m=8)
    index = similarity.build_fixed_ivf_index(embs, list(range(16)))
    got: dict[int, set[int]] = {}
    for r in similarity.ivfpq_topk(index, queries, books, k=5, nprobe=4).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    index.assigned.unpersist()
    assert all(len(v) == 5 for v in got.values())
    hits = sum(len(got.get(q, set()) & set(t)) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    assert hits / total >= 0.2, f"IVFPQ recall {hits}/{total}"


def test_ivf_index_roundtrips_through_cell_partitioned_layout(spark, sf_dir, tmp_path):
    """write_ivf_index → read_ivf_index: probing the at-rest index
    returns exactly the in-memory probe's rows, the layout is hive-
    partitioned by cell (directory-level pruning for a probe), and a
    one-cell read scans just that partition."""
    import os

    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where("vec_id < 5").selectExpr("vec_id AS query_id", "embedding")
    ivf = similarity.build_ivf_index(embs, n_centroids=4)
    mem = {tuple(r) for r in similarity.ivf_topk(embs, queries, n_centroids=4, index=ivf).collect()}

    path = str(tmp_path / "ivf")
    similarity.write_ivf_index(ivf, path)
    ivf.assigned.unpersist()
    loaded = similarity.read_ivf_index(spark, path)
    got = {tuple(r) for r in similarity.ivf_topk(embs, queries, n_centroids=4, index=loaded).collect()}
    assert got == mem

    cells = [d for d in os.listdir(path + "/assigned") if d.startswith("_cell=")]
    assert len(cells) == 4
    one = loaded.assigned.where("_cell = 0")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_ivf_config_guard_pins_two_fixture_geometries(spark, sf_dir):
    """The round-11 IVF analog of the LSH build-time guard (VERDICT
    r10 what's-missing #1): on the fixture embeddings the shipped demo
    geometry (16 cells, nprobe=4 — kept because the fixed quantizer's
    SQL twin uses it) scans ~25% of the corpus per probe → warn with
    an n_centroids recommendation; 64 cells at nprobe=1 prunes to
    ~1.7% → ok. Fractions are measured from the index's own assigned
    frame (empirical, corpus-distributed queries), so these pins are
    the estimator's contract on this corpus, not a balanced-cell
    idealization."""
    embs = load_table(spark, sf_dir, "embeddings")
    demo = similarity.build_fixed_ivf_index(embs, list(range(16)))
    with pytest.warns(UserWarning, match="barely prunes"):
        v1 = similarity.ivf_config_check(demo, nprobe=4)
    assert v1["verdict"] == "warn"
    assert 0.15 < v1["expected_candidate_fraction"] < 0.40  # 0.2509 measured
    assert v1["recommended_n_centroids"] > 16
    assert v1["n_sampled"] == 500  # whole fixture corpus under the cap
    demo.assigned.unpersist()

    sharp = similarity.build_fixed_ivf_index(embs, list(range(64)))
    v2 = similarity.ivf_config_check(sharp, nprobe=1)
    assert v2["verdict"] == "ok"
    assert v2["expected_candidate_fraction"] < 0.05  # 0.0172 measured
    assert v2["recommended_n_centroids"] == 64
    sharp.assigned.unpersist()


def test_ivf_fraction_curve_and_serving_chooser(spark, sf_dir):
    """Round 12 (VERDICT r11 next #3): the one-pass fraction curve
    must agree with the point estimator at every nprobe (same sample,
    same argsort — cumulative vs sliced), be monotone nondecreasing,
    and the serving chooser must return the LARGEST nprobe under the
    guard threshold — the operating point the bench embedding_ann_ivf
    row now serves. The chooser's threshold is the module's
    IVF_WARN_ABOVE constant (single source with ivf_config_check),
    so this test also fails if the two ever desynchronize."""
    embs = load_table(spark, sf_dir, "embeddings")
    ix = similarity.build_fixed_ivf_index(embs, list(range(16)))
    curve = similarity.ivf_candidate_fraction_curve(ix, max_nprobe=6)
    assert len(curve) == 6
    assert all(b >= a for a, b in zip(curve, curve[1:])), curve
    for nprobe in (1, 3, 6):
        point = similarity.ivf_expected_candidate_fraction(ix, nprobe)
        assert abs(curve[nprobe - 1] - point["expected_candidate_fraction"]) < 1e-9

    serve = similarity.ivf_serving_nprobe(ix, max_nprobe=6)
    np_pick, thr = serve["nprobe"], serve["warn_above"]
    assert thr == similarity.IVF_WARN_ABOVE
    assert curve[np_pick - 1] <= thr or np_pick == 1
    if np_pick < 6:
        assert curve[np_pick] > thr  # largest ok, not merely an ok
    ix.assigned.unpersist()


def test_ivf_write_lands_config_verdict_in_sidecar(spark, sf_dir, tmp_path):
    """write_ivf_index (the production at-rest boundary) runs the
    guard by default at the declared serving nprobe and lands the
    verdict beside the centroids; read_ivf_index re-surfaces a warn —
    the same build/serve contract as the LSH sidecar. The gate queries
    serve through this path (`_ivf_fixed_index`), so the sidecar the
    driver-checked IVF query reads carries this verdict."""
    import json

    embs = load_table(spark, sf_dir, "embeddings")
    idx = similarity.build_fixed_ivf_index(embs, list(range(16)))
    path = str(tmp_path / "ivf_guarded")
    with pytest.warns(UserWarning, match="barely prunes"):
        similarity.write_ivf_index(idx, path)  # demo geometry: ~0.25
    with open(path + "/centers.json") as f:
        params = json.load(f)
    assert params["config_check"]["verdict"] == "warn"
    assert params["config_check"]["recommended_n_centroids"] > 16
    assert params["config_check"]["nprobe"] == 4
    with pytest.warns(UserWarning, match="barely prune"):
        loaded = similarity.read_ivf_index(spark, path)
    assert len(loaded.centers) == 16

    path2 = str(tmp_path / "ivf_unchecked")
    similarity.write_ivf_index(idx, path2, check_config=False)
    with open(path2 + "/centers.json") as f:
        assert "config_check" not in json.load(f)
    idx.assigned.unpersist()


def test_lsh_index_roundtrips_through_table_partitioned_layout(spark, sf_dir, tmp_path):
    """write_lsh_index → read_lsh_index: probing the at-rest index
    returns exactly the in-memory probe's rows and the params sidecar
    still guards against family mismatch."""
    import os

    import pytest

    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where("vec_id < 5").selectExpr("vec_id AS query_id", "embedding")
    idx = similarity.build_lsh_keys(embs)
    mem = {tuple(r) for r in similarity.lsh_topk(embs, queries, corpus_keys=idx).collect()}

    path = str(tmp_path / "lsh")
    similarity.write_lsh_index(idx, path)
    idx.keys.unpersist()
    loaded = similarity.read_lsh_index(spark, path)
    got = {tuple(r) for r in similarity.lsh_topk(embs, queries, corpus_keys=loaded).collect()}
    assert got == mem
    assert len([d for d in os.listdir(path + "/keys") if d.startswith("t=")]) == 10
    with pytest.raises(ValueError, match="LSH index"):
        similarity.lsh_topk(embs, queries, bits=7, corpus_keys=loaded)


def test_lsh_config_guard_pins_scale_probe_families(spark):
    """The round-9 probe measured that the 5b×10t family stops pruning
    on the 2M clustered corpus (0.276 candidate fraction; probe slower
    than the brute scan) while 10b×8t prunes to 0.014 — this pins the
    BUILD-TIME guard's verdict on the same two families over the same
    clustered generator. The estimator is N-invariant at fixed
    geometry (a property of the hash family on the distribution —
    docs/SCALE_PROBE.md), so 20k vectors reproduce the 2M fractions
    the guard's thresholds came from."""
    from tools.ann_scale_probe import DIM, synth_corpus

    corpus = synth_corpus(spark, 20_000).persist()
    try:
        loose = similarity.build_lsh_keys(corpus, dim=DIM, bits=5, tables=10)
        with pytest.warns(UserWarning, match="barely prunes"):
            v1 = similarity.lsh_config_check(loose)
        assert v1["verdict"] == "warn"
        assert 0.15 < v1["expected_candidate_fraction"] < 0.45  # 0.276 at 2M
        assert v1["recommended_bits"] > 5
        loose.keys.unpersist()

        sharp = similarity.build_lsh_keys(corpus, dim=DIM, bits=10, tables=8)
        v2 = similarity.lsh_config_check(sharp)
        assert v2["verdict"] == "ok"
        assert v2["expected_candidate_fraction"] < 0.05  # 0.014 at 2M
        assert v2["recommended_bits"] == 10
        sharp.keys.unpersist()
    finally:
        corpus.unpersist()


def test_lsh_write_lands_config_verdict_in_sidecar(spark, sf_dir, tmp_path):
    """write_lsh_index (the production at-rest boundary) runs the
    guard by default and lands the verdict beside the family params,
    so a reader sees what the builder saw; check_config=False skips
    it (and the histogram pass) for callers that already checked."""
    import json

    embs = load_table(spark, sf_dir, "embeddings")
    idx = similarity.build_lsh_keys(embs)
    path = str(tmp_path / "lsh_guarded")
    with pytest.warns(UserWarning, match="barely prunes"):
        similarity.write_lsh_index(idx, path)  # fixture family: ~0.28
    with open(path + "/params.json") as f:
        params = json.load(f)
    assert params["config_check"]["verdict"] == "warn"
    assert params["config_check"]["recommended_bits"] > params["bits"]
    # the verdict rides along AND the reader re-surfaces it — the
    # serve side sees what the build side saw, no key re-scan
    with pytest.warns(UserWarning, match="barely prune"):
        loaded = similarity.read_lsh_index(spark, path)
    assert loaded.bits == 5 and loaded.tables == 10

    path2 = str(tmp_path / "lsh_unchecked")
    similarity.write_lsh_index(idx, path2, check_config=False)
    with open(path2 + "/params.json") as f:
        assert "config_check" not in json.load(f)
    idx.keys.unpersist()


def test_prebuilt_index_param_mismatch_raises(spark, sf_dir):
    import pytest

    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where("vec_id < 3").selectExpr("vec_id AS query_id", "embedding")

    lsh = similarity.build_lsh_keys(embs, bits=5, tables=10)
    with pytest.raises(ValueError, match="LSH index"):
        similarity.lsh_topk(embs, queries, bits=6, corpus_keys=lsh)

    ivf = similarity.build_ivf_index(embs, n_centroids=4)
    with pytest.raises(ValueError, match="IVF index"):
        similarity.ivf_topk(embs, queries, n_centroids=8, index=ivf)
    # matching params probe fine and honor the index's id_col
    assert similarity.ivf_topk(embs, queries, n_centroids=4, index=ivf).count() > 0
    ivf.assigned.unpersist()
    lsh.keys.unpersist()


def test_pii_redaction_patterns_fire(spark):
    """Crafted PII examples (the synthetic corpus contains none): each
    pattern class matches, counts come from the original text, and
    redaction applies in declaration order."""
    from crypto_data_pipeline_spark.operators import text as txt

    docs = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@example.co.uk or jane@a.io today"),
            (2, "served from 10.0.0.1 and 192.168.100.200 at 3pm"),
            (3, "card 4111111111111111 acct 123456789"),
            (4, "mixed: a@b.com from 8.8.8.8 ref 987654321012"),
            (5, "clean text, nothing to scrub"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in txt.with_redactions(docs).collect()}
    assert (got[1].n_email, got[1].n_ipv4, got[1].n_idnum) == (2, 0, 0)
    assert "bob" not in got[1].redacted and got[1].redacted.count("<EMAIL>") == 2
    assert (got[2].n_email, got[2].n_ipv4, got[2].n_idnum) == (0, 2, 0)
    assert got[2].redacted == "served from <IP> and <IP> at 3pm"
    assert (got[3].n_email, got[3].n_ipv4, got[3].n_idnum) == (0, 0, 2)
    assert got[3].redacted == "card <ID> acct <ID>"
    assert (got[4].n_email, got[4].n_ipv4, got[4].n_idnum) == (1, 1, 1)
    assert got[4].redacted == "mixed: <EMAIL> from <IP> ref <ID>"
    assert got[5].redacted == got[5].text


def test_fuzzy_pairs_blocked_edit_distance(spark):
    """Prefix blocking + Levenshtein: typo-distance pairs inside a
    block match; docs in different blocks never compare."""
    from crypto_data_pipeline_spark.operators.dedup import fuzzy_pairs_blocked

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumped over the lazy dog"),   # dist 3 on the 40-prefix (insertion shifts the truncated tail)
            (3, "the quick brown fox jumps over the hazy dog"),    # dist 1
            (4, "a completely different document about spark"),
            (5, "the quick red fox"),  # same block, far beyond max_dist
        ],
        "doc_id long, text string",
    )
    got = {(r.id_a, r.id_b): r.dist for r in fuzzy_pairs_blocked(docs, max_dist=5).collect()}
    assert got[(1, 2)] == 3 and got[(1, 3)] == 1
    assert (2, 3) in got  # transitively close pair also surfaces
    assert all(4 not in pair for pair in got)  # different block
    assert all(5 not in pair for pair in got)  # same block, too far


def test_stream_near_dup_filter_matches_batch_buckets(spark, sf_dir, tmp_path):
    """Streaming LSH near-dedup: an availableNow run over the real
    embeddings (with injected event times) must keep EXACTLY one row
    per distinct 16-bit signature, the signature set must equal the
    batch computation's, and every survivor must carry its own
    vector's signature. Survivor IDENTITY is first-arrival (arrival
    order is the priority at ingest), so the assertions pin the
    bucket algebra, not an arrival order the batch twin can't see —
    deterministic survivorship is the oracle-checked
    embedding_bucket_dedup query."""
    from pyspark.sql import functions as F

    embs = load_table(spark, sf_dir, "embeddings")
    stamped = embs.withColumn(
        "ts", F.timestamp_micros((F.lit(1700000000000000) + F.col("vec_id")).cast("long"))
    )
    src = str(tmp_path / "src")
    stamped.write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    out = str(tmp_path / "out")
    q = (
        similarity.stream_near_dup_filter(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    kept = spark.read.parquet(out).select("vec_id", "lsh_bucket").collect()
    batch = {
        (r.vec_id, r.lsh_bucket)
        for r in similarity.with_lsh_bucket(embs).select("vec_id", "lsh_bucket").collect()
    }
    batch_buckets = {b for _, b in batch}

    assert len(kept) == len(batch_buckets)            # one survivor per signature
    assert {r.lsh_bucket for r in kept} == batch_buckets
    assert all((r.vec_id, r.lsh_bucket) in batch for r in kept)  # own signature

    # the batch path of the same operator picks the identical bucket set
    batch_kept = similarity.stream_near_dup_filter(embs.withColumn("ts", F.current_timestamp()))
    assert {r.lsh_bucket for r in batch_kept.select("lsh_bucket").collect()} == batch_buckets


def test_quantized_topk_tracks_exact(spark, sf_dir):
    """SQ8 search quality: top-5 over the int8 codes must stay close
    to the float baseline — measured 0.98 avg / 0.8 min recall and
    ≤0.0025 absolute cosine deviation on this corpus at sf0.001 and
    sf0.01; floors set with slack below that. The quantized score's
    cross-engine EXACTNESS (integer dots) is separately pinned by the
    embedding_topk_quantized oracle."""
    from pyspark.sql import functions as F

    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(embs, queries, k=5).collect()
    quant = similarity.quantized_topk(embs, queries, k=5).collect()

    ex, qt = {}, {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.vec_id)
    for r in quant:
        qt.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(ex[q] & qt[q]) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.9
    assert min(recalls) >= 0.6

    exact_scores = {(r.query_id, r.vec_id): r.cosine for r in exact}
    devs = [
        abs(exact_scores[(r.query_id, r.vec_id)] - r.cosine_q)
        for r in quant
        if (r.query_id, r.vec_id) in exact_scores
    ]
    assert devs and max(devs) <= 0.01


def test_incremental_ingest_admits_only_novel(spark, sf_dir):
    """Against-store dedup: no admitted hash exists in the store, the
    admitted set is itself duplicate-free, and every novel batch hash
    is represented exactly once (min-id survivor)."""
    from crypto_data_pipeline_spark.operators.text import normalized

    docs = load_table(spark, sf_dir, "documents")
    store = docs.where(F.col("doc_id") % 4 != 0)
    batch = docs.where(F.col("doc_id") % 4 == 0)
    admitted = dedup.incremental_ingest_dedup(store, batch)

    store_hashes = {
        r.h for r in store.select(F.md5(normalized("text")).alias("h")).collect()
    }
    got = admitted.select("doc_id", "content_hash").collect()
    assert got, "fixture batch should admit at least one novel doc"
    assert not {r.content_hash for r in got} & store_hashes
    assert len({r.content_hash for r in got}) == len(got)  # batch-internal dedup

    # survivor = min doc_id per novel hash, verified driver-side
    batch_rows = batch.select(
        "doc_id", F.md5(normalized("text")).alias("h")
    ).collect()
    novel_min: dict[str, int] = {}
    for r in batch_rows:
        if r.h not in store_hashes:
            novel_min[r.h] = min(novel_min.get(r.h, r.doc_id), r.doc_id)
    assert {(r.content_hash, r.doc_id) for r in got} == set(novel_min.items())

    # the 100 TB contract: the store side rides NO Exchange — the one
    # shuffle is the batch survivor window; membership is broadcast
    admitted.write.format("noop").mode("overwrite").save()
    from crypto_data_pipeline_spark.observability import plan_runtime_metrics

    df = dedup.incremental_ingest_dedup(store, batch)
    df._jdf.queryExecution().toRdd().count()
    m = plan_runtime_metrics(df)
    assert m["n_exchanges"] <= 1, "store must not shuffle"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bloom_prefilter_matches_exact_ingest(spark, sf_dir):
    """The bloom-accelerated ingest admits the IDENTICAL set as the
    unaccelerated exact path (Bloom guarantees no false negatives, so
    the prefilter may only route rows, never change the answer), and
    every true duplicate in the batch passes the bloom — the
    no-false-negative property itself."""
    from crypto_data_pipeline_spark.operators.text import normalized

    docs = load_table(spark, sf_dir, "documents")
    store = docs.where(F.col("doc_id") % 4 != 0)
    batch = docs.where(F.col("doc_id") % 4 == 0)

    exact = {
        (r.doc_id, r.content_hash)
        for r in dedup.incremental_ingest_dedup(store, batch)
        .select("doc_id", "content_hash")
        .collect()
    }
    bloom = {
        (r.doc_id, r.content_hash)
        for r in dedup.bloom_prefilter_ingest(store, batch)
        .select("doc_id", "content_hash")
        .collect()
    }
    assert bloom == exact

    # no false negatives: every batch row whose content IS in the
    # store must be bloom-positive
    store_hashes = {
        r.h for r in store.select(F.md5(normalized("text")).alias("h")).collect()
    }
    flags = dedup.bloom_prefilter_flags(store, batch).collect()
    for r in flags:
        if r.content_hash in store_hashes:
            assert r.bloom_pass, f"false negative for doc {r.doc_id}"

    # the bit set is bounded by m regardless of corpus size
    assert dedup.bloom_bitset(store, m_bits=64, k=4).count() <= 64


def test_bloom_prefilter_saturated_filter_degrades_to_exact(spark):
    """A tiny m forces every position set → all rows bloom-positive →
    the path degenerates to the plain exact check, still correct."""
    rows = [(i, "alpha beta gamma " + str(i % 3)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    store, batch = df.where("doc_id < 9"), df.where("doc_id >= 9")
    out = dedup.bloom_prefilter_ingest(store, batch, m_bits=2, k=2)
    # contents 0,1,2 all already in store → nothing admitted
    assert out.count() == 0
    flagged = dedup.bloom_prefilter_flags(store, batch, m_bits=2, k=2)
    assert all(r.bloom_pass for r in flagged.collect())


def test_segment_dedup_keeps_global_first_occurrence(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta eps shared one two three four"),
            (2, "shared one two three four unique five six seven eight"),
            (3, "shared one two three four"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.segment_dedup(docs, seg_tokens=5).collect()
    }
    # doc 1 owns both its segments (first occurrence of "shared one two
    # three four" by (id, pos) order)
    assert (out[1].n_segments, out[1].n_kept) == (2, 2)
    assert out[1].text_clean == "alpha beta gamma delta eps shared one two three four"
    # doc 2 loses its first segment to doc 1, keeps its unique tail
    assert (out[2].n_segments, out[2].n_kept) == (2, 1)
    assert out[2].text_clean == "unique five six seven eight"
    # doc 3 is entirely boilerplate → empty reassembly
    assert (out[3].n_segments, out[3].n_kept) == (1, 0)
    assert out[3].text_clean == ""


def test_segment_dedup_line_mode(spark):
    docs = spark.createDataFrame(
        [
            (1, "keep me\nboilerplate footer"),
            (2, "other line\nboilerplate footer"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.segment_dedup(docs, split_pattern="\n").collect()
    }
    assert out[1].text_clean == "keep me\nboilerplate footer"
    assert out[2].text_clean == "other line"
    assert out[2].n_kept == 1


def test_knn_classify_majority_vote(spark):
    from crypto_data_pipeline_spark.ml.classify import knn_classify

    # two tight clusters on orthogonal axes; the query id 0 sits in
    # cluster A (label 7) — 3 of its 5 neighbors must be label 7
    rows = [(0, [1.0, 0.05, 0.0], 7)]
    rows += [(i, [1.0, 0.01 * i, 0.0], 7) for i in range(1, 4)]
    rows += [(i, [0.0, 1.0, 0.01 * i], 9) for i in range(4, 10)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    queries = corpus.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = knn_classify(corpus, queries, k=5).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.pred_label, r.votes, r.true_label, r.correct) == (7, 3, 7, True)


def test_mmr_diversifies_vs_pure_relevance(spark):
    # corpus: a near-duplicate pair most relevant to the query plus a
    # moderately-relevant diverse vector. Pure top-2 takes the dup pair
    # (2 then 1); MMR at lambda=0.5 must swap the dup out for 4
    # (verified closed-form: step-2 scores 1→-0.0278, 3→0.0315,
    # 4→0.0879).
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.045, 0.0]),   # near-dup of 1
            (3, [0.5, 0.0, 0.866]),
            (4, [0.6, 0.75, 0.0]),      # diverse, still relevant
        ],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [0.9, 0.3, 0.1])], "query_id long, embedding array<double>"
    )
    got = sorted(
        similarity.mmr_topk(
            corpus, queries, k=2, pool=4, lam=0.5, exclude_self=False
        ).collect(),
        key=lambda r: r.rank,
    )
    exact = sorted(
        similarity.brute_force_topk(
            corpus, queries, k=2, exclude_self=False
        ).collect(),
        key=lambda r: r.rank,
    )
    assert [r.vec_id for r in exact] == [2, 1]          # relevance-only picks the dup pair
    assert got[0].vec_id == 2                            # MMR step 1 = most relevant
    assert got[1].vec_id == 4                            # step 2 trades relevance for diversity
    assert got[0].rank == 1 and got[1].rank == 2


def test_mmr_pool_smaller_than_k(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(9, [1.0, 0.1])], "query_id long, embedding array<double>"
    )
    got = similarity.mmr_topk(
        corpus, queries, k=5, pool=10, lam=0.5, exclude_self=False
    ).collect()
    assert len(got) == 2                                 # selection stops at the pool
    assert sorted(r.rank for r in got) == [1, 2]


def test_rp_projection_matrix_and_distance_preservation(spark, sf_dir):
    """JL projection: the ±1 matrix matches the portable-hash high-bit
    formula element-wise; an exact duplicate projects to distance 0
    and ranks first; and the JL property itself holds on the real
    corpus — ||S(x-y)||^2 / (m*||x-y||^2) concentrates around 1
    (E[ratio] = 1 for Rademacher rows; std ~ sqrt(2/m) ~ 0.35 at
    m=16). Top-5 recall is deliberately NOT pinned: on this synthetic
    near-equidistant corpus, neighbor ordering is fragile under ANY
    m=16 projection — distance concentration is the guarantee JL
    actually makes."""
    import numpy as np

    from crypto_data_pipeline_spark.operators.dedup import (
        PORTABLE_MOD,
        portable_minhash_params,
    )
    from crypto_data_pipeline_spark.operators.similarity import (
        _rp_matrix,
        rp_topk,
        with_int8_codes,
        with_rp_codes,
    )

    s = _rp_matrix(4, 6, seed=41)
    for j, (a, b) in enumerate(portable_minhash_params(4, 41)):
        for i in range(6):
            assert s[j, i] == 1 - 2 * (((a * i + b) % PORTABLE_MOD) * 2 // PORTABLE_MOD)
    assert set(np.unique(s)) <= {-1, 1}

    embs = load_table(spark, sf_dir, "embeddings")
    # planted exact duplicate: projected distance must be exactly 0
    dup = embs.where("vec_id = 0").select(
        (F.col("vec_id") + 10**9).alias("vec_id"), "embedding", "label"
    )
    queries = embs.where("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = rp_topk(embs.unionByName(dup), queries, k=5).collect()
    assert got[0]["vec_id"] == 10**9 and got[0]["rp_dist"] == 0

    # distance concentration over sampled pairs
    m = 16
    q = {r["vec_id"]: np.array(r["q"], dtype=np.int64)
         for r in with_int8_codes(embs).select("vec_id", "q").collect()}
    y = {r["vec_id"]: np.array(r["y"], dtype=np.int64)
         for r in with_rp_codes(embs, out_dim=m, seed=41).collect()}
    ids = sorted(q)
    rng = np.random.default_rng(7)
    ratios = []
    for _ in range(400):
        a_id, b_id = rng.choice(ids, 2, replace=False)
        orig = int(((q[a_id] - q[b_id]) ** 2).sum())
        proj = int(((y[a_id] - y[b_id]) ** 2).sum())
        if orig:
            ratios.append(proj / (m * orig))
    r = np.array(ratios)
    assert 0.7 <= np.median(r) <= 1.3, np.median(r)
    assert (np.abs(np.log(r)) <= np.log(4)).mean() >= 0.9, r


def test_ann_registry_recall_floor_sf001(spark):
    """Recall floors for the REGISTERED ANN queries at sf0.01 (round-9,
    the catalog-scale sibling of the fixture-scale floors above, and
    the assertion twin of bench.py's recall_at_k artifact column): the
    benched IVF and LSH probes must keep a minimum recall@5 against
    the exact brute-force twin on the same 10 fixed queries.
    Deterministic — fixed index build, fixed queries — so the floor is
    a regression gate, not a flake: measured 0.30 (IVF — round 12
    moved the query to the guard-RECOMMENDED operating point, √N
    cells with nprobe chosen under the guard threshold; the old 0.72
    was the 16-cell demo geometry scanning ~33% of the corpus on a
    warn verdict) / 0.56 (LSH) / 0.94 (LSH multiprobe) at sf0.01;
    floors leave margin for intentional re-tuning but catch a
    collapse."""
    import os

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("sf0.01 testdata not mounted")
    from crypto_data_pipeline_spark.plans.registry import load_with_extras

    qs = load_with_extras()
    truth: dict[int, set[int]] = {}
    for r in (
        qs["embedding_topk_bruteforce"].fn(spark, sf)
        .select("query_id", "vec_id").collect()
    ):
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    total = sum(len(v) for v in truth.values())
    # multiprobe measured 0.94 at sf0.01 — the floor also encodes that
    # it must stay clearly ABOVE its single-probe sibling, not just
    # above a collapse threshold
    floors = {
        "embedding_ann_ivf": 0.2,  # recommended point, verdict-ok pruning
        "embedding_ann_lsh": 0.4,
        "embedding_ann_lsh_multiprobe": 0.8,
    }
    for name, floor in floors.items():
        got: dict[int, set[int]] = {}
        for r in qs[name].fn(spark, sf).select("query_id", "vec_id").collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        assert hits / total >= floor, (name, hits, total)
