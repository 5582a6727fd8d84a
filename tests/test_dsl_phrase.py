"""Quoted-phrase DSL: ``"exact phrase"`` gates matches positionally,
``-"exact phrase"`` excludes positional matches.

Checked rank- and score-identically against a naive restatement over the
raw token sequences (the reference's positional model, index.h:215-224,
exists exactly for this class of query), on the sharded index, the
segmented merged index, and composed with term exclusions + tombstones.
"""

import math
from collections import Counter

import pytest

from index_spark.functions.text import tokenize
from index_spark.operators.build import build_index
from index_spark.operators.merge import merge_shards
from index_spark.operators.query import parse_query, search_dsl

SHARD_SIZE = 4

TEXTS = [
    "alpha beta gamma delta epsilon",        # 0: "beta gamma" @1
    "beta alpha gamma beta gamma zeta",      # 1: "beta gamma" @3
    "gamma beta alpha zeta eta",             # 2: adjacent only reversed
    "alpha alpha beta beta gamma gamma",     # 3: "beta gamma" @3
    "delta epsilon zeta eta theta",          # 4: none of the hot terms
    "beta gamma beta gamma beta gamma",      # 5: 3 matches
    "alpha delta beta zeta gamma",           # 6: terms present, apart
]

DSL_PHRASE_QUERIES = [
    '"beta gamma"',                 # pure phrase
    '"beta gamma" alpha',           # phrase + bare (scores, no gate)
    '+alpha "beta gamma"',          # required term + phrase
    '"beta gamma" -delta',          # phrase + term exclusion
    'alpha -"beta gamma"',          # bare + neg phrase (OR mode)
    '+alpha -"beta gamma"',         # required + neg phrase (AND mode)
    '"alpha beta" "beta gamma"',    # two positive phrases
    '"zzz yyy"',                    # absent phrase => empty
    '"beta gamma" -"alpha delta"',  # both polarities
    '"gamma" beta',                 # single-term phrase folds to +gamma
    '-"beta gamma"',                # nothing positive => empty
]


def _has_phrase(toks: list[str], ph: list[str]) -> bool:
    m = len(ph)
    return any(toks[p:p + m] == ph for p in range(len(toks) - m + 1))


def naive_dsl(texts: list[str], q: str, k: int = 10,
              banned: set[int] | None = None):
    """Literal restatement of the full DSL over raw token sequences."""
    req, opt, exc, phrases, neg_phrases = parse_query(q, stem=False)
    toks = [tokenize(t, stem=False) for t in texts]
    n_docs = len(texts)
    doc_len = [len(ts) for ts in toks]
    avgdl = sum(doc_len) / n_docs
    tf = [Counter(ts) for ts in toks]

    def idf(t: str) -> float:
        d = sum(1 for c in tf if t in c)
        return math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0)

    if req:
        hits = {d for d in range(n_docs) if all(tf[d].get(t) for t in req)}
    else:
        hits = {d for d in range(n_docs) if any(tf[d].get(t) for t in opt)}
    for ph in phrases:
        hits = {d for d in hits if _has_phrase(toks[d], ph)}
    hits -= {d for d in range(n_docs) if any(t in tf[d] for t in exc)}
    hits -= {d for d in range(n_docs)
             if any(_has_phrase(toks[d], ph) for ph in neg_phrases)}
    hits -= banned or set()
    scores = {}
    for d in hits:
        s = 0.0
        for t in sorted(set(req) | set(opt)):  # pinned sum order
            f = tf[d].get(t)
            if f:
                s += idf(t) * f / (f + 1.2 * (
                    1.0 - 0.75 + 0.75 * doc_len[d] / avgdl))
        scores[d] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.fixture(scope="module")
def built(spark):
    rows = [("r", f"{i:04d}", t) for i, t in enumerate(TEXTS)]
    df = spark.createDataFrame(rows, ["repo", "path", "content"])
    docs, index, stats = build_index(df, stem=False, positions=True,
                                     shard_size=SHARD_SIZE)
    index = index.persist()
    index.count()
    return docs, index, stats


def _check(index, docs, stats, queries, **kw):
    for q in queries:
        expected = naive_dsl(TEXTS, q, k=10)
        got = search_dsl(index, docs, stats, q, k=10, stem=False,
                         **kw).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in expected], q
        for r, (ed, es) in zip(got, expected):
            assert r["score"] == pytest.approx(es, abs=1e-9), (q, ed)


def test_parse_query_phrases():
    req, opt, exc, ph, nph = parse_query(
        '+alpha "beta gamma" bare -"delta epsilon" -neg "solo"',
        stem=False)
    assert req == ["alpha", "beta", "gamma", "solo"]  # phrase terms gate
    assert opt == ["bare"]
    assert exc == ["neg"]
    assert ph == [["beta", "gamma"]]
    assert nph == [["delta", "epsilon"]]
    # duplicate phrases collapse; empty quotes vanish
    _, _, _, ph2, _ = parse_query('"a b" "a b" ""', stem=False)
    assert ph2 == [["a", "b"]]


def test_dsl_phrases_rank_identity(built):
    docs, index, stats = built
    _check(index, docs, stats, DSL_PHRASE_QUERIES)


def test_dsl_phrases_on_segmented_merged_index(built):
    docs, index, stats = built
    merged = merge_shards(index, segment_bytes=64).persist()
    merged.count()
    _check(merged, docs, stats, DSL_PHRASE_QUERIES)
    merged.unpersist()


def test_dsl_phrase_with_tombstones(spark, built):
    docs, index, stats = built
    # doc 5 is the top "beta gamma" match — tombstone it away
    tomb = spark.createDataFrame([(5,)], "doc_id long")
    for q in ['"beta gamma"', 'alpha -"beta gamma"']:
        expected = naive_dsl(TEXTS, q, k=10, banned={5})
        got = search_dsl(index, docs, stats, q, k=10, stem=False,
                         tombstones=tomb, shard_size=SHARD_SIZE).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in expected], q


def test_dsl_phrase_requires_positional_index(spark):
    rows = [("r", f"{i:04d}", t) for i, t in enumerate(TEXTS)]
    df = spark.createDataFrame(rows, ["repo", "path", "content"])
    docs, index, stats = build_index(df, stem=False, positions=False,
                                     shard_size=SHARD_SIZE)
    # pos_blob is in the schema either way (b"" without positions) — the
    # kernel's length check is the guard, surfacing from the first task
    with pytest.raises(Exception, match="positions=True"):
        search_dsl(index, docs, stats, '"beta gamma"',
                   stem=False).collect()


def test_dsl_phrase_gate_vs_plain_and(built):
    """The phrase gate only ever narrows the same query's AND result:
    same scores on surviving docs, survivors = positional matches."""
    docs, index, stats = built
    with_phrase = {r["doc_id"]: r["score"] for r in search_dsl(
        index, docs, stats, '"beta gamma"', k=10, stem=False).collect()}
    plain_and = {r["doc_id"]: r["score"] for r in search_dsl(
        index, docs, stats, "+beta +gamma", k=10, stem=False).collect()}
    assert set(with_phrase) <= set(plain_and)
    for d, s in with_phrase.items():
        assert s == pytest.approx(plain_and[d], abs=1e-12)
    toks = [tokenize(t, stem=False) for t in TEXTS]
    assert set(with_phrase) == {
        d for d in range(len(TEXTS))
        if _has_phrase(toks[d], ["beta", "gamma"])}
