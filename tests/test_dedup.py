"""Dedup operators: MinHash/LSH reference semantics + variants, on Spark."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from index_spark.operators import dedup as dd


def naive_fnv(data: bytes) -> int:
    h = 146959810393466560
    for b in data:
        h = ((h * 1099511628211) & 0xFFFFFFFFFFFFFFFF) ^ b
    return h


def test_shingle_hashes_match_reference_semantics():
    words = "the quick brown fox jumps over the lazy dog again and again".split()
    exp = [naive_fnv(b"".join(w.encode() for w in words[i : i + 8]))
           for i in range(len(words) - 7)]
    assert list(dd.shingle_hashes(words)) == exp
    # short doc: one whole-doc shingle (shingle.cpp:40-45)
    assert list(dd.shingle_hashes(words[:3])) == [naive_fnv("".join(words[:3]).encode())]
    assert dd.shingle_hashes([]).size == 0


def test_minhash_signature_matches_cpp_size_t_semantics():
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    sh = [naive_fnv(b"".join(w.encode() for w in words[i : i + 8]))
          for i in range(len(words) - 7)]
    exp = bytes(
        min((((a * x + b) & 0xFFFFFFFFFFFFFFFF) % 255) for x in sh)
        for a, b in zip(dd.A.tolist(), dd.B_C.tolist())
    )
    assert dd.minhash_signature(words) == exp
    assert dd.minhash_signature([]) == bytes([0xFF] * 64)


def test_minhash_batch_matches_per_doc():
    """The whole-batch kernel must be byte-identical to the per-document
    reference path for every document shape (empty, <8 words, long,
    repeated words, unicode)."""
    texts = [
        "",
        "one",
        "two words",
        "seven little words fit in one shingle",
        " ".join(f"w{i % 7}tok{i % 29}" for i in range(200)),
        " ".join("same" for _ in range(40)),
        "café naïve übung " * 10,
        None,
        " ".join(f"z{i}" for i in range(9)),
    ]
    sigs, bands = dd.minhash_signatures_batch(texts)
    for i, t in enumerate(texts):
        exp = dd.minhash_signature((t or "").split())
        assert sigs[i].tobytes() == exp, i
        for b in range(dd.NUM_BANDS):
            expb = naive_fnv(exp[b * 8: (b + 1) * 8]) - (1 << 63)
            assert int(bands[i, b]) == expb, (i, b)


def _naive_simhash(text: str) -> int:
    # token hash = the pinned FNV multiply-then-xor recurrence (round-3
    # spec change from blake2b: SQL-expressible for the driver oracle)
    words, counts = np.unique((text or "").split(), return_counts=True)
    if words.size == 0:
        return 0
    hs = np.array([dd._fnv_bytes(w.encode()) for w in words],
                  dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    votes = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    fp = np.uint64(0)
    for i in np.flatnonzero(votes > 0):
        fp |= np.uint64(1) << np.uint64(i)
    return int(fp.astype(np.int64))


def test_simhash_batch_matches_per_doc():
    texts = ["", "one", "a b a b", " ".join(f"t{i % 31}" for i in range(150)),
             None, "tie tie untie untie"]
    got = dd.simhash_batch(texts)
    for i, t in enumerate(texts):
        assert int(got[i]) == _naive_simhash(t or ""), i


def test_near_dup_separation():
    """Contiguous 1% edit stays >= 57/64; 50% scattered edit falls below."""
    base = [f"word{i % 50}x{i % 13}" for i in range(600)]  # aperiodic (lcm 650)
    close = base.copy()
    close[300:306] = [f"m{i}" for i in range(6)]  # 1% contiguous
    far = base.copy()
    far[::2] = [f"m{i}" for i in range(300)]
    s0, s1, s2 = (dd.minhash_signature(w) for w in (base, close, far))
    agree = lambda a, b: sum(x == y for x, y in zip(a, b))
    assert agree(s0, s1) >= dd.NUM_SIMILARITY
    assert agree(s0, s2) < dd.NUM_SIMILARITY


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = []
    base = " ".join(f"tok{i % 97}w{i % 13}" for i in range(400))
    words = base.split()
    near = words.copy()
    near[100:104] = ["x1", "x2", "x3", "x4"]  # 1% contiguous edit
    far = words.copy()
    far[::2] = [f"y{i}" for i in range(200)]
    rows.append((0, base))
    rows.append((1, " ".join(near)))   # near-dup of 0
    rows.append((2, " ".join(far)))    # mutant — admitted
    rows.append((3, base))             # exact dup of 0
    for i in range(4, 30):
        rows.append((i, " ".join(f"doc{i}tok{j}" for j in range(120))))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_near_dup_pairs_spark(spark, docs_df):
    pairs = {(r["doc_a"], r["doc_b"])
             for r in dd.minhash_near_dup_pairs(docs_df).collect()}
    assert (0, 1) in pairs
    assert (0, 3) in pairs  # exact dup always caught
    assert (0, 2) not in pairs
    assert all(a < 4 and b < 4 for a, b in pairs)


def test_dedup_keep_first(spark, docs_df):
    pairs = dd.minhash_near_dup_pairs(docs_df)
    kept = dd.dedup_keep_first(docs_df, pairs)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 0 in ids and 1 not in ids and 3 not in ids and 2 in ids


def test_exact_dup_groups(spark, docs_df):
    rows = dd.exact_dup_groups(docs_df).collect()
    assert len(rows) == 1
    assert rows[0]["n_dups"] == 2 and rows[0]["keep_doc_id"] == 0


def test_simhash_pairs(spark, docs_df):
    sh = {r["doc_id"]: r["simhash"] for r in dd.simhash64(docs_df).collect()}
    assert sh[0] == sh[3]  # exact dup -> identical fingerprint
    pairs = {(r["doc_a"], r["doc_b"])
             for r in dd.simhash_near_dup_pairs(docs_df, max_hamming=6).collect()}
    assert (0, 3) in pairs and (0, 1) in pairs


def test_ngram_jaccard_pairs(spark, docs_df):
    rows = dd.ngram_jaccard_pairs(docs_df, threshold=0.5).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert got[(0, 3)] == 1.0
    assert (0, 1) in got and got[(0, 1)] > 0.9
    assert (0, 2) not in got


def test_ngram_prefix_filter_bounds_stop_gram(spark):
    """A gram shared by EVERY doc must not induce a quadratic candidate
    join: with prefix filtering the stop-gram only pairs docs whose
    prefixes contain it, and results stay exact vs the naive join."""
    m = 40
    rows = [(i, "common stop gram " + " ".join(f"u{i}x{j}" for j in range(30)))
            for i in range(m)]
    rows.append((m, "common stop gram " + " ".join(f"u{m}x{j}" for j in range(30))))
    rows.append((m + 1, rows[0][1]))  # exact dup of doc 0
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    grams = dd._doc_grams(df, 3, "text", "doc_id")
    n_pairs_naive = (
        grams.alias("l").join(grams.alias("r"), "gram")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select("l.doc_id", "r.doc_id").distinct().count())
    prefix = dd._gram_prefix(grams, 0.5)
    n_pairs_prefix = (
        prefix.alias("l").join(prefix.alias("r"), "gram")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select("l.doc_id", "r.doc_id").distinct().count())
    # every doc shares 'common stop gram' -> naive candidates ~ m^2/2;
    # the stop-gram is in no prefix (highest df), so prefix candidates
    # stay tiny (the one true dup pair and a few rare-gram collisions)
    assert n_pairs_naive >= (m * (m - 1)) // 2
    assert n_pairs_prefix < m

    # both plans are exact and agree
    for mode in ("naive", "prefix"):
        got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
               for r in dd.ngram_jaccard_pairs(df, threshold=0.5,
                                               mode=mode).collect()}
        assert got == {(0, m + 1): 1.0}, mode
    # auto picks prefix when the join-row statistic blows past the cap
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in dd.ngram_jaccard_pairs(df, threshold=0.5,
                                           naive_max_join_rows=10).collect()}
    assert got == {(0, m + 1): 1.0}


def test_winnow_fingerprints_match_naive():
    """winnow_batch == the definitional per-doc computation (rolling
    polynomial hash over char 8-grams, min per 4-window, distinct)."""
    texts = ["the quick brown fox jumps over the lazy dog",
             "the quick brown fox jumps over the lazy dog",  # dup
             "completely different content here with words",
             "short", ""]
    d, f = dd.winnow_batch(texts, k=8, window=4)
    got = {}
    for di, fp in zip(d, f):
        got.setdefault(int(di), set()).add(int(fp))
    for i, t in enumerate(texts):
        b = t.encode()
        if len(b) < 8 + 3:
            assert i not in got
            continue
        hs = []
        for p in range(len(b) - 7):
            v = 0
            for j in range(8):
                v = v * dd.FP_BASE + b[p + j]
            hs.append(v % dd.FP_MOD)
        exp = {min(hs[p: p + 4]) for p in range(len(hs) - 3)}
        assert got[i] == exp, i
    assert got[0] == got[1]  # identical docs -> identical fingerprints
    assert got[0] != got[2]


def test_lsh_giant_bucket_star_pairing(spark):
    """An oversized LSH bucket (many mutually-identical docs) must emit
    O(m) star pairs, not O(m^2) — and keep-first dedup must still drop
    every loser."""
    m = 30
    text = " ".join(f"tok{i % 11}w{i % 7}" for i in range(300))
    rows = [(i, text) for i in range(m)] + [(m, "totally different " * 50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = dd.signatures_df(df)
    pairs = dd.minhash_candidate_pairs(sigs, max_bucket=8)
    rows_p = pairs.collect()
    # star pairing: every pair anchors at doc 0 (the bucket min)
    assert 0 < len(rows_p) <= m
    assert all(r["doc_a"] == 0 for r in rows_p)
    near = pairs.where(F.col("n_equal") >= dd.NUM_SIMILARITY)
    kept = dd.dedup_keep_first(df, near)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == {0, m}


from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = st.lists(
    st.text(alphabet=st.sampled_from("abcdé1"), min_size=1, max_size=6),
    max_size=20)


@settings(max_examples=40, deadline=None)
@given(st.lists(_WORDS, max_size=6))
def test_minhash_batch_property(word_lists):
    """Batch MinHash == per-doc reference path over random word lists."""
    texts = [" ".join(w) for w in word_lists]
    sigs, bands = dd.minhash_signatures_batch(texts)
    for i, t in enumerate(texts):
        assert sigs[i].tobytes() == dd.minhash_signature(t.split()), i


@settings(max_examples=40, deadline=None)
@given(st.lists(_WORDS, max_size=6))
def test_simhash_batch_property(word_lists):
    texts = [" ".join(w) for w in word_lists]
    got = dd.simhash_batch(texts)
    for i, t in enumerate(texts):
        assert int(got[i]) == _naive_simhash(t), i


def test_curate_corpus_gates(spark, tiny_corpus):
    """Pinned gate order + keep-first dedup + kept() composition."""
    import pandas as pd

    from index_spark.operators.curate import curate_corpus, kept

    rows = pd.DataFrame([
        {"doc_id": 0, "text": "alpha beta gamma delta epsilon zeta"},
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"},
        {"doc_id": 2, "text": "short one"},
        {"doc_id": 3, "text": "1234 5678 9012 3456 7890 1111"},
        {"doc_id": 4, "text": "plain unique words here again ok"},
    ])
    df = spark.createDataFrame(rows)
    v = {r["doc_id"]: r for r in
         curate_corpus(df, min_tokens=3, max_tokens=10,
                       min_alpha=0.5).collect()}
    assert v[0]["reason"] == "ok" and v[0]["keep"]
    assert v[1]["reason"] == "duplicate" and v[1]["dup_of"] == 0
    assert v[2]["reason"] == "too_short"
    assert v[3]["reason"] == "low_alpha"
    assert v[4]["reason"] == "ok"
    verdicts = curate_corpus(df, min_tokens=3, max_tokens=10,
                             min_alpha=0.5)
    left = sorted(r["doc_id"] for r in kept(df, verdicts).collect())
    assert left == [0, 4]


def test_curate_null_text_keeps_its_verdict_row(spark):
    """NULL text must not silently drop the doc from the verdicts."""
    from index_spark.operators.curate import curate_corpus

    df = spark.createDataFrame(
        [(0, "real words here ok fine yes"), (1, None)],
        "doc_id long, text string")
    v = {r["doc_id"]: r for r in
         curate_corpus(df, min_tokens=3).collect()}
    assert set(v) == {0, 1}
    assert v[1]["reason"] == "too_short" and not v[1]["keep"]
