"""Sequence packing (operators/pack.py): concat-and-split placement
relation — tiling, coverage, determinism, and the two-level prefix-sum
decomposition."""

import re

import pytest
from pyspark.sql import functions as F

from index_spark.operators.pack import pack_sequences


def _py_pack(rows, seq_len):
    # rows: [(doc_id, text)] — the sequential reference
    out, start = [], 0
    for doc_id, text in sorted(rows):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        n = len(toks)
        if n == 0:
            continue
        for seq_id in range(start // seq_len, (start + n - 1) // seq_len + 1):
            lo = max(start, seq_id * seq_len)
            hi = min(start + n, (seq_id + 1) * seq_len)
            out.append((seq_id, doc_id, lo - start, lo - seq_id * seq_len,
                        hi - lo))
        start += n
    return sorted(out)


ROWS = [
    (0, "one two three four five six seven"),
    (1, ""),                              # empty doc places nothing
    (2, "a b c"),
    (3, " ".join(f"w{i}" for i in range(23))),  # straddles boundaries
    (4, "x y"),
]


def test_pack_matches_python_reference(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 pack_sequences(df, seq_len=8, group_size=2).collect())
    assert got == _py_pack(ROWS, 8)
    assert not any(r[1] == 1 for r in got)  # empty doc absent


def test_pack_tiling_and_coverage(spark, tiny_corpus):
    df = spark.createDataFrame(tiny_corpus).select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("text"))
    rows = pack_sequences(df, seq_len=128, group_size=16).collect()
    per_seq: dict[int, int] = {}
    per_doc: dict[int, int] = {}
    for r in rows:
        per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + r.n_tokens
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_tokens
        assert 0 <= r.seq_off and r.seq_off + r.n_tokens <= 128
        assert r.n_tokens > 0
    last = max(per_seq)
    # every sequence except the last is exactly full; ids contiguous
    assert all(v == 128 for s, v in per_seq.items() if s != last)
    assert set(per_seq) == set(range(last + 1))
    # every document's tokens are fully placed exactly once
    want = {r.doc_id: r.n for r in df.select(
        "doc_id",
        F.size(F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                        lambda x: x != "")).alias("n")).collect()
        if r.n > 0}
    assert per_doc == want


def test_pack_group_size_and_partitioning_invariance(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i} " * (i % 7)) for i in range(200)],
        "doc_id long, text string")
    a = sorted(tuple(r) for r in
               pack_sequences(df, seq_len=16, group_size=3).collect())
    b = sorted(tuple(r) for r in
               pack_sequences(df.repartition(17), seq_len=16,
                              group_size=1 << 16).collect())
    assert a == b and a


def test_pack_validation(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=0)
