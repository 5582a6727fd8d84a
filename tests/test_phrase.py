"""Phrase search + position postings: kernel properties, engine vs naive
oracle, merge passthrough."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from index_spark.functions.text import (
    term_counts_stream, tokenize, simple_tokens)


def _stream(texts):
    raw = "".join(texts).encode()
    bounds = np.cumsum([0] + [len(t.encode()) for t in texts]).astype(np.int64)
    return np.frombuffer(raw, np.uint8), bounds


def test_stream_positions_match_naive():
    """term_counts_stream(positions=True) positions == the naive
    per-document enumerate() of the same tokenizer."""
    texts = ["the quick fox the quick", "fox fox fox", "a b a b a",
             "singleword", ""]
    buf, bounds = _stream(texts)
    vocab, d, t, cnt, lens, pos = term_counts_stream(
        buf, bounds, stem=False, positions=True)
    got = {}
    off = 0
    for di, ti, c in zip(d, t, cnt):
        got[(int(di), vocab[ti])] = list(pos[off: off + c])
        off += c
    for di, text in enumerate(texts):
        naive = {}
        for p, tok in enumerate(tokenize(text, stem=False)):
            naive.setdefault(tok, []).append(p)
        for tok, plist in naive.items():
            assert got[(di, tok)] == plist, (di, tok)


def test_camel_false_equals_simple_tokens():
    """camel=False tokenization == the SQL-parity tokenizer, including on
    text the camel tokenizer would split differently."""
    texts = ["FooBar HTTPServer x1y2", "don't stop-me now", "ABCdef"]
    for t in texts:
        assert tokenize(t, stem=False, camel=False) == simple_tokens(t), t
    # the flag actually changes behavior where camelCase exists
    assert tokenize("FooBar", stem=False, camel=True) == ["foo", "bar"]
    assert tokenize("FooBar", stem=False, camel=False) == ["foobar"]


@pytest.fixture(scope="module")
def phrase_corpus(spark):
    texts = [
        "big data table scan big data table",
        "data table data table data table",
        "table data table data",
        "data and table apart data x table",
        "no relevant words here at all",
        "data table",
    ]
    rows = [("r", f"{i:04d}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["repo", "path", "content"])
    return texts, df


@pytest.fixture(scope="module")
def phrase_index(spark, phrase_corpus):
    from index_spark.operators.build import build_index

    _, df = phrase_corpus
    docs, index, stats = build_index(df, stem=False, positions=True,
                                     shard_size=4)
    return index.persist(), stats


def _naive_phrase(texts, phrase, k=10):
    terms = phrase.split()
    out = []
    for i, t in enumerate(texts):
        toks = tokenize(t, stem=False)
        n = sum(
            1 for p in range(len(toks) - len(terms) + 1)
            if toks[p: p + len(terms)] == terms)
        if n:
            out.append((i, n))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def test_phrase_engine_vs_naive(phrase_index, phrase_corpus):
    from index_spark.operators.phrase import phrase_search

    texts, _ = phrase_corpus
    index, stats = phrase_index
    for phrase in ["data table", "big data table", "data table data",
                   "table data", "absent phrase"]:
        got = [(r["doc_id"], r["n_matches"])
               for r in phrase_search(index, stats, phrase,
                                      stem=False).collect()]
        assert got == _naive_phrase(texts, phrase), phrase


def test_single_term_phrase_is_tf(phrase_index, phrase_corpus):
    from index_spark.operators.phrase import phrase_search

    texts, _ = phrase_corpus
    index, stats = phrase_index
    got = dict(
        (r["doc_id"], r["n_matches"])
        for r in phrase_search(index, stats, "data", stem=False).collect())
    for i, t in enumerate(texts):
        tf = tokenize(t, stem=False).count("data")
        if tf:
            assert got[i] == tf


def test_proximity_engine_vs_naive(phrase_index, phrase_corpus):
    from index_spark.operators.phrase import proximity_search

    texts, _ = phrase_corpus
    index, stats = phrase_index
    for ta, tb, w in [("data", "table", 1), ("data", "table", 3),
                      ("table", "data", 2), ("data", "data", 4)]:
        got = [(r["doc_id"], r["n_matches"])
               for r in proximity_search(index, stats, ta, tb, window=w,
                                         stem=False).collect()]
        exp = []
        for i, t in enumerate(texts):
            toks = tokenize(t, stem=False)
            n = sum(1 for a, x in enumerate(toks) if x == ta
                    for b in range(a + 1, min(a + w + 1, len(toks)))
                    if toks[b] == tb)
            if n:
                exp.append((i, n))
        exp.sort(key=lambda x: (-x[1], x[0]))
        assert got == exp[:10], (ta, tb, w, got, exp)


def test_positions_survive_merge(phrase_index, phrase_corpus):
    """merge_shards concatenates pos blobs; decoded per-doc positions must
    be identical to the sharded index's."""
    from index_spark.operators.merge import merge_shards
    from index_spark.operators.phrase import decode_positions

    texts, _ = phrase_corpus
    index, _ = phrase_index
    merged = merge_shards(index)
    row = merged.where(F.col("term") == "data").collect()[0]
    import index_spark.functions.varbyte as vb

    docs = np.cumsum(vb.decode(row["doc_blob"]).astype(np.int64))
    tfs = vb.decode(row["tf_blob"]).astype(np.int64)
    pos = decode_positions(row["tf_blob"], row["pos_blob"])
    off = 0
    for doc, tf in zip(docs, tfs):
        expected = [p for p, tok in enumerate(tokenize(texts[doc], stem=False))
                    if tok == "data"]
        assert list(pos[off: off + tf]) == expected, doc
        off += tf


def test_search_works_on_merged_index(spark, phrase_index):
    """BM25 search over merge_shards output (one row per term, no shard
    column) must be rank-identical to search over the sharded index."""
    from index_spark.operators.build import stats_from_index
    from index_spark.operators.merge import merge_shards
    from index_spark.operators.query import search

    index, _ = phrase_index
    stats = stats_from_index(index)
    merged = merge_shards(index)
    a = [(r["doc_id"], round(r["score"], 9)) for r in
         search(index, None, stats, "data table", stem=False).collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in
         search(merged, None, stats, "data table", stem=False).collect()]
    assert a == b and len(a) > 0


def test_phrase_on_zoned_index_pins_one_zone(spark, phrase_corpus):
    """phrase_search over a zoned positions index must not conflate the
    zones' position streams: body-zone phrase results equal the unzoned
    build's."""
    from index_spark.operators.build import build_index, build_zoned_index
    from index_spark.operators.phrase import phrase_search

    texts, df = phrase_corpus
    df = df.withColumn("ztext", df["content"])  # second zone = same text
    _, zidx, _ = build_zoned_index(df, [("body", "content"),
                                        ("dup", "ztext")],
                                   stem=False, positions=True, shard_size=4)
    _, plain, _ = build_index(df, stem=False, positions=True, shard_size=4)
    a = [(r["doc_id"], r["n_matches"]) for r in
         phrase_search(zidx, None, "data table", stem=False,
                       zone="body").collect()]
    b = [(r["doc_id"], r["n_matches"]) for r in
         phrase_search(plain, None, "data table", stem=False).collect()]
    assert a == b and len(a) > 0


from hypothesis import given, settings
from hypothesis import strategies as st

_DOC = st.text(
    alphabet=st.sampled_from("ab1 _-éÉ\x00\n\tZ"), max_size=60)


@settings(max_examples=60, deadline=None)
@given(st.lists(_DOC, max_size=8))
def test_stream_positions_property(texts):
    """Positions from the byte-stream kernel == per-doc enumerate() of
    tokenize(), over adversarial docs (unicode, NUL, camel, empties)."""
    buf, bounds = _stream(texts)
    out = term_counts_stream(buf, bounds, stem=False, positions=True)
    vocab, d, t, cnt, lens, pos = out
    got = {}
    off = 0
    for di, ti, c in zip(d, t, cnt):
        got[(int(di), vocab[ti])] = list(pos[off: off + c])
        off += c
    for di, text in enumerate(texts):
        naive = {}
        for p, tok in enumerate(tokenize(text, stem=False)):
            naive.setdefault(tok, []).append(p)
        assert len(tokenize(text, stem=False)) == lens[di]
        for tok, plist in naive.items():
            assert got[(di, tok)] == plist, (di, tok)
    assert len(got) == sum(
        len(set(tokenize(t, stem=False))) for t in texts)


def test_search_many_matches_per_query(spark, phrase_index):
    """Batch multi-query search == per-query search, per query (shared
    decode must not perturb scores or ranking)."""
    from index_spark.operators.build import stats_from_index
    from index_spark.operators.query import search, search_many

    index, _ = phrase_index
    stats = stats_from_index(index)
    queries = {0: "data table", 1: "big scan", 2: "table", 3: "absent zz"}
    batch = search_many(index, stats, queries, k=5, stem=False).collect()
    got = {}
    for r in batch:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 9)))
    for qid, q in queries.items():
        exp = [(i + 1, r["doc_id"], round(r["score"], 9))
               for i, r in enumerate(
                   search(index, None, stats, q, k=5, stem=False).collect())]
        assert sorted(got.get(qid, [])) == exp, (qid, q)


def test_fused_and_shuffle_positions_byte_identical(spark, phrase_corpus):
    """positions=True on the fused Arrow path and the shuffle path
    (postings -> build_sharded_index) must produce byte-identical merged
    pos blobs."""
    from index_spark.operators.build import (
        assign_doc_ids, build_index, build_sharded_index, postings,
        tokenized_docs)
    from index_spark.operators.merge import merge_shards

    _, df = phrase_corpus
    _, fused, _ = build_index(df, stem=False, positions=True, shard_size=4)
    with_ids = assign_doc_ids(df)
    post = postings(tokenized_docs(with_ids, stem=False), positions=True)
    shuffled = build_sharded_index(post, shard_size=4)

    a = {r["term"]: (bytes(r["doc_blob"]), bytes(r["tf_blob"]),
                     bytes(r["pos_blob"]))
         for r in merge_shards(fused).collect() if r["term"] != "%"}
    b = {r["term"]: (bytes(r["doc_blob"]), bytes(r["tf_blob"]),
                     bytes(r["pos_blob"]))
         for r in merge_shards(shuffled).collect()}
    assert a == b and len(a) > 0


def test_streaming_ingest_with_positions(spark, phrase_corpus, tmp_path):
    """A streamed chunk built with positions answers phrase queries."""
    from index_spark.operators.phrase import phrase_search
    from index_spark.plans.checkpoint import load_index, load_stats
    from index_spark.streaming.ingest import ingest_batch

    texts, df = phrase_corpus
    out = str(tmp_path / "stream_pos_idx")
    rep = ingest_batch(spark, df, out, shard_size=4, stem=False,
                       positions=True)
    assert rep["n_docs"] == len(texts) and rep["positions"]
    index = load_index(spark, out)
    stats = load_stats(out)
    got = [(r["doc_id"], r["n_matches"]) for r in
           phrase_search(index, stats, "data table", stem=False).collect()]
    assert got == _naive_phrase(texts, "data table")


def _naive_sloppy(texts, phrase, gap, k=10):
    """Exists-a-chain DP: occurrence p of term j is viable iff some
    viable occurrence of term j+1 sits in (p, p+gap]."""
    terms = phrase.split()
    out = []
    for i, t in enumerate(texts):
        toks = tokenize(t, stem=False)
        occ = {}
        for p, tok in enumerate(toks):
            occ.setdefault(tok, []).append(p)
        if any(tt not in occ for tt in terms):
            continue
        viable = occ[terms[-1]]
        for tt in reversed(terms[:-1]):
            viable = [p for p in occ[tt]
                      if any(p < v <= p + gap for v in viable)]
            if not viable:
                break
        if viable:
            out.append((i, len(viable)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def test_sloppy_phrase_engine_vs_naive(phrase_index, phrase_corpus):
    from index_spark.operators.phrase import sloppy_phrase_search

    texts, _ = phrase_corpus
    index, stats = phrase_index
    for phrase, gap in [("data table", 2), ("data table", 3),
                        ("big data table", 2), ("data x table", 1),
                        ("data table", 1), ("table scan", 4),
                        ("absent words", 2)]:
        got = [(r["doc_id"], r["n_matches"])
               for r in sloppy_phrase_search(index, stats, phrase,
                                             gap=gap,
                                             stem=False).collect()]
        assert got == _naive_sloppy(texts, phrase, gap), (phrase, gap)


def test_sloppy_gap1_equals_exact_phrase(phrase_index):
    from index_spark.operators.phrase import (
        phrase_search,
        sloppy_phrase_search,
    )

    index, stats = phrase_index
    for phrase in ["data table", "big data table", "data table data"]:
        a = [(r["doc_id"], r["n_matches"])
             for r in phrase_search(index, stats, phrase,
                                    stem=False).collect()]
        b = [(r["doc_id"], r["n_matches"])
             for r in sloppy_phrase_search(index, stats, phrase, gap=1,
                                           stem=False).collect()]
        assert a == b, phrase
