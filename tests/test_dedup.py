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
