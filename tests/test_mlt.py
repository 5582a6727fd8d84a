"""More-like-this: tf*idf term extraction from a source doc, OR search,
self excluded — pinned against a naive oracle restatement."""

import math

import pytest

from index_spark.operators.build import build_index
from index_spark.operators.query import more_like_this, search
from tests.oracle import OracleIndex
from tests.test_fuzzy import oracle_or_terms

SHARD_SIZE = 64


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    corpus_df = spark.createDataFrame(tiny_corpus)
    docs, index, stats = build_index(corpus_df, stem=True,
                                     shard_size=SHARD_SIZE)
    docs, index = docs.persist(), index.persist()
    docs.count(), index.count()
    oracle = OracleIndex(
        list(tiny_corpus[["repo", "path", "content"]].itertuples(index=False)),
        stem=True)
    corpus_ids = spark.createDataFrame(
        [(i, tc.content) for i, tc in enumerate(
            sorted(tiny_corpus[["repo", "path", "content"]]
                   .itertuples(index=False),
                   key=lambda r: (r.repo, r.path)))],
        ["doc_id", "content"])
    return docs, index, stats, oracle, corpus_ids


def naive_mlt_terms(oracle: OracleIndex, doc_id: int, top_terms=10):
    scored = []
    for t, posts in oracle.tf.items():
        tf = posts.get(doc_id)
        if tf:
            scored.append((-tf * oracle.idf(t), t))
    scored.sort()
    return sorted(t for _, t in scored[:top_terms])


def test_mlt_rank_identity(built):
    docs, index, stats, oracle, corpus_ids = built
    for src in [0, 7, 42]:
        terms = naive_mlt_terms(oracle, src)
        expected = [(d, s) for d, s in
                    oracle_or_terms(oracle, terms, k=10 ** 9)
                    if d != src][:10]
        got = more_like_this(index, docs, stats, corpus_ids, src, k=10,
                             shard_size=SHARD_SIZE).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in expected], src
        for r, (ed, es) in zip(got, expected):
            assert r["score"] == pytest.approx(es, abs=1e-9), (src, ed)


def test_mlt_self_included_when_asked(built):
    """Without exclude_self the source doc itself ranks (usually #1 —
    it contains every query term at its own tf)."""
    docs, index, stats, oracle, corpus_ids = built
    src = 3
    got = more_like_this(index, docs, stats, corpus_ids, src, k=10,
                         shard_size=SHARD_SIZE,
                         exclude_self=False).collect()
    assert src in [r["doc_id"] for r in got]


def test_mlt_missing_doc_empty(built):
    docs, index, stats, _, corpus_ids = built
    out = more_like_this(index, docs, stats, corpus_ids, 10 ** 6, k=10,
                         shard_size=SHARD_SIZE).collect()
    assert out == []
