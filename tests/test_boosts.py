"""Function scoring: per-doc multiplicative boosts applied before the
per-shard top-k cut (query.py ``boosts=``)."""

import pytest
from pyspark.sql import functions as F

from index_spark.operators.build import build_index
from index_spark.operators.query import search


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    corpus = spark.createDataFrame(tiny_corpus)
    docs, index, stats = build_index(corpus, stem=True, shard_size=32)
    return docs, index.persist(), stats


def _boosts(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, boost double")


def test_all_ones_boost_is_identity(spark, built):
    docs, index, stats = built
    ones = _boosts(spark, [(i, 1.0) for i in range(150)])
    plain = search(index, docs, stats, "import numpy", k=10,
                   shard_size=32).collect()
    boosted = search(index, docs, stats, "import numpy", k=10,
                     shard_size=32, boosts=ones).collect()
    assert [(r.doc_id, r.score) for r in plain] == \
           [(r.doc_id, r.score) for r in boosted]
    assert plain  # non-trivial


def _full_reranked(spark, built, query, boost_map, k, **kw):
    # brute-force oracle: unboosted scores for EVERY matching doc,
    # reweighted driver-side, re-ranked
    docs, index, stats = built
    full = search(index, docs, stats, query, k=10 ** 6,
                  shard_size=32, **kw).collect()
    rer = sorted(((r.doc_id, r.score * boost_map.get(r.doc_id, 1.0))
                  for r in full), key=lambda t: (-t[1], t[0]))[:k]
    return [(d, round(s, 9)) for d, s in rer]


@pytest.mark.parametrize("mode", ["or", "and"])
def test_boost_matches_full_rerank(spark, built, mode):
    docs, index, stats = built
    # boost a spread of docs across shards, including fractional
    # weights (demotions) — exercises both kernels' _apply_boost
    bmap = {i: (3.0 if i % 3 == 0 else 0.25) for i in range(0, 150, 7)}
    got = search(index, docs, stats, "import return", k=8, mode=mode,
                 shard_size=32,
                 boosts=_boosts(spark, list(bmap.items()))).collect()
    want = _full_reranked(spark, built, "import return", bmap, 8, mode=mode)
    assert [(r.doc_id, round(r.score, 9)) for r in got] == want
    assert got


def test_boost_promotes_outside_unboosted_topk(spark, built):
    # the defining property: a doc OUTSIDE the unboosted top-k enters
    # once its weight is large enough (boost applies before the cut)
    docs, index, stats = built
    plain = search(index, docs, stats, "import numpy", k=3,
                   shard_size=32).collect()
    full = search(index, docs, stats, "import numpy", k=10 ** 6,
                  shard_size=32).collect()
    outsider = full[10].doc_id
    assert outsider not in {r.doc_id for r in plain}
    got = search(index, docs, stats, "import numpy", k=3, shard_size=32,
                 boosts=_boosts(spark, [(outsider, 1000.0)])).collect()
    assert got[0].doc_id == outsider


def test_boost_composes_with_tombstones_and_restrict(spark, built):
    docs, index, stats = built
    full = search(index, docs, stats, "import numpy", k=10 ** 6,
                  shard_size=32).collect()
    top, second = full[0].doc_id, full[1].doc_id
    tomb = spark.createDataFrame([(top,)], "doc_id long")
    # a boosted-but-tombstoned doc stays dead
    got = search(index, docs, stats, "import numpy", k=3, shard_size=32,
                 tombstones=tomb,
                 boosts=_boosts(spark, [(top, 1000.0)])).collect()
    assert top not in {r.doc_id for r in got}
    # restrict to two docs, boost the weaker one above the stronger
    allow = spark.createDataFrame([(top,), (second,)], "doc_id long")
    got = search(index, docs, stats, "import numpy", k=2, shard_size=32,
                 restrict=allow,
                 boosts=_boosts(spark, [(second, 1000.0)])).collect()
    assert [r.doc_id for r in got] == [second, top]


# ---------------------------------------------------------------------------
# synonym expansion (search_synonyms) — shares the built fixture
# ---------------------------------------------------------------------------

from index_spark.operators.query import search_synonyms  # noqa: E402


def test_synonyms_or_equals_expanded_query(spark, built):
    # OR-mode expansion is exactly a search over the expanded term set
    docs, index, stats = built
    got = search_synonyms(index, docs, stats, "import",
                          {"import": ["return"]}, k=10,
                          shard_size=32).collect()
    want = search(index, docs, stats, "import return", k=10,
                  shard_size=32).collect()
    assert [(r.doc_id, r.score) for r in got] == \
           [(r.doc_id, r.score) for r in want]
    assert got


def test_synonyms_and_gates_per_original_term(spark, built):
    # a nonsense original term with a REAL synonym is satisfiable via
    # the synonym; without the synonym the conjunction is empty
    docs, index, stats = built
    got = search_synonyms(index, docs, stats, "import zzqq",
                          {"zzqq": ["return"]}, k=5, mode="and",
                          shard_size=32).collect()
    assert got
    empty = search(index, docs, stats, "import zzqq", k=5, mode="and",
                   shard_size=32).collect()
    assert empty == []


def test_synonyms_ignore_non_query_keys_and_stem(spark, built):
    # synonym keys/values ride the caller's stem flag; keys not in the
    # query are ignored (identical to the plain query)
    docs, index, stats = built
    got = search_synonyms(index, docs, stats, "import",
                          {"unrelated": ["return"]}, k=5,
                          shard_size=32).collect()
    want = search(index, docs, stats, "import", k=5,
                  shard_size=32).collect()
    assert [(r.doc_id, r.score) for r in got] == \
           [(r.doc_id, r.score) for r in want]


def test_synonym_multiword_key_rejected(spark, built):
    docs, index, stats = built
    with pytest.raises(ValueError, match="one term"):
        search_synonyms(index, docs, stats, "import",
                        {"two words": ["x"]}, k=5, shard_size=32)


# ---------------------------------------------------------------------------
# deep pagination (search_after cursor)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["or", "and"])
def test_after_pages_tile_the_full_ranking(spark, built, mode):
    docs, index, stats = built
    full = search(index, docs, stats, "import return", k=10 ** 6,
                  shard_size=32, mode=mode).collect()
    assert len(full) > 12
    pages, cursor = [], None
    for _ in range(3):
        page = search(index, docs, stats, "import return", k=5,
                      shard_size=32, mode=mode, after=cursor).collect()
        pages.extend(page)
        cursor = (page[-1].score, page[-1].doc_id)
    assert [(r.doc_id, r.score) for r in pages] == \
           [(r.doc_id, r.score) for r in full[:15]]


def test_after_composes_with_boosts(spark, built):
    # pagination over the BOOSTED ranking: page 2 continues the
    # reweighted order, not the raw one
    docs, index, stats = built
    bmap = {i: 4.0 for i in range(0, 150, 11)}
    bdf = _boosts(spark, list(bmap.items()))
    p1 = search(index, docs, stats, "import return", k=5, shard_size=32,
                boosts=bdf).collect()
    p2 = search(index, docs, stats, "import return", k=5, shard_size=32,
                boosts=bdf, after=(p1[-1].score, p1[-1].doc_id)).collect()
    want = _full_reranked(spark, built, "import return", bmap, 10)
    assert [(r.doc_id, round(r.score, 9)) for r in p1 + p2] == want


def test_query_engine_boosts_and_after(spark, built):
    # the prepared serving path honors boosts and the cursor the same
    # as the one-shot API
    from index_spark.operators.query import QueryEngine
    docs, index, stats = built
    eng = QueryEngine(index, stats, shard_size=32)
    bmap = {i: 4.0 for i in range(0, 150, 11)}
    bdf = _boosts(spark, list(bmap.items()))
    p1 = eng.search("import return", k=5, boosts=bdf)
    p2 = eng.search("import return", k=5, boosts=bdf,
                    after=(p1[-1][1], p1[-1][0]))
    want = _full_reranked(spark, built, "import return", bmap, 10)
    assert [(d, round(s, 9)) for d, s in p1 + p2] == want


# ---------------------------------------------------------------------------
# wildcard term queries (wildcard_expand / search_wildcard)
# ---------------------------------------------------------------------------

from index_spark.operators.query import (search_wildcard,  # noqa: E402
                                         wildcard_expand)


def test_wildcard_expand_glob_semantics(spark, built):
    docs, index, stats = built
    exp = wildcard_expand(index, ["im*", "?mport", "zz*", "im?ort"])
    assert "import" in exp["im*"]
    assert exp["?mport"] == ["import"]
    assert exp["im?ort"] == ["import"]
    assert exp["zz*"] == []


def test_wildcard_expand_respects_cap_by_df(spark, built):
    # cap keeps the HIGHEST-df matches (df desc, term asc pinned order)
    docs, index, stats = built
    full = wildcard_expand(index, ["*"], max_expansions=10 ** 6)["*"]
    capped = wildcard_expand(index, ["*"], max_expansions=3)["*"]
    assert len(capped) == 3 and set(capped) <= set(full)


def test_search_wildcard_or_equals_expanded_search(spark, built):
    docs, index, stats = built
    exp = wildcard_expand(index, ["im*"])
    got = search_wildcard(index, docs, stats, "return im*", k=10,
                          shard_size=32).collect()
    want = search(index, docs, stats, " ".join(["return"] + exp["im*"]),
                  k=10, stem=False, shard_size=32).collect()
    assert [(r.doc_id, r.score) for r in got] == \
           [(r.doc_id, r.score) for r in want]
    assert got


def test_search_wildcard_and_gates_per_pattern(spark, built):
    docs, index, stats = built
    # a no-match pattern empties the conjunction
    assert search_wildcard(index, docs, stats, "return zzq*", k=5,
                           mode="and", shard_size=32).collect() == []
    got = search_wildcard(index, docs, stats, "return im*", k=5,
                          mode="and", shard_size=32).collect()
    assert got
