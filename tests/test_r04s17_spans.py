"""Round-4 session-17b surface: intervals query, span_or,
span_containing / span_within, script_score."""

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def span_ix(spark):
    from index_spark.operators.build import build_index

    texts = [
        (0, "data x table y query end"),        # ordered chain, gaps 2
        (1, "query data table tail"),           # query before -> no chain
        (2, "data table spark data table"),     # 2 phrases + spark
        (3, "data y y y y y y y y y table query"),  # gaps 9 > 8
        (4, "table data query close by"),       # unordered pair only
        (5, "spark spark spark"),               # or-clause only
    ]
    corpus = spark.createDataFrame(
        [("r", f"d{i}", t) for i, t in texts],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     positions=True, shard_size=16)
    return docs, index.persist(), stats


def _d(df):
    return {r.doc_id: r.n_matches for r in df.collect()}


# --------------------------------------------------------------- intervals

def test_intervals_ordered_chain(span_ix):
    from index_spark.operators.phrase import intervals_search

    docs, index, stats = span_ix
    out = _d(intervals_search(index, stats, "data table query",
                              max_gaps=8, k=10, stem=False, camel=False,
                              shard_size=16))
    # doc 0: data..table..query with 2 gap tokens. doc 1: order broken.
    # doc 2: no query. doc 3: 9 gaps > 8. doc 4: table before data.
    assert out == {0: 1}


def test_intervals_gap_boundary(span_ix):
    from index_spark.operators.phrase import intervals_search

    docs, index, stats = span_ix
    out = _d(intervals_search(index, stats, "data table query",
                              max_gaps=9, k=10, stem=False, camel=False,
                              shard_size=16))
    assert out == {0: 1, 3: 1}  # doc 3 admitted exactly at the bound


def test_intervals_phrase_is_zero_gaps(span_ix):
    from index_spark.operators.phrase import intervals_search

    docs, index, stats = span_ix
    out = _d(intervals_search(index, stats, "data table", max_gaps=0,
                              k=10, stem=False, camel=False,
                              shard_size=16))
    # doc 2 has two adjacent starts; doc 1's 'data table' tail is one
    assert out == {2: 2, 1: 1}


def test_intervals_validation(span_ix):
    from index_spark.operators.phrase import intervals_search

    docs, index, stats = span_ix
    with pytest.raises(ValueError, match="max_gaps"):
        intervals_search(index, stats, "data table", max_gaps=-1)
    with pytest.raises(ValueError, match="2 analyzed"):
        intervals_search(index, stats, "data")


# ----------------------------------------------------------------- span_or

def test_span_or_union_counts(span_ix):
    from index_spark.operators.phrase import span_or_search

    docs, index, stats = span_ix
    out = _d(span_or_search(index, stats, ["data table", "spark"],
                            k=10, stem=False, camel=False,
                            shard_size=16))
    # doc 2: two phrase starts + one 'spark'; doc 5: three 'spark';
    # doc 1: one adjacent phrase (doc 0's 'data x table' is not one)
    assert out == {2: 3, 5: 3, 1: 1}


def test_span_or_missing_clause_skipped(span_ix):
    from index_spark.operators.phrase import span_or_search

    docs, index, stats = span_ix
    out = _d(span_or_search(index, stats, ["zzz absent", "spark"],
                            k=10, stem=False, camel=False,
                            shard_size=16))
    assert out == {5: 3, 2: 1}


# ------------------------------------------------- containing / within

def test_span_containing_counts_big_spans(span_ix):
    from index_spark.operators.phrase import span_containing_search

    docs, index, stats = span_ix
    out = _d(span_containing_search(index, stats, "data", "table",
                                    "query", slop=3, k=10, stem=False,
                                    camel=False, shard_size=16))
    # doc 4: 'table data query' — span [0, 1] does NOT contain pos 2?
    # table@0, data@1, query@2: span [0,1], query at 2 outside.
    # doc 1: query@0 data@1 table@2 -> span [1,2], query outside.
    # no doc has query strictly inside a pair window here
    assert out == {}


def test_span_containing_endpoint_exclusive_distinct(spark):
    from index_spark.operators.build import build_index
    from index_spark.operators.phrase import (
        span_containing_search,
        span_within_search,
    )

    corpus = spark.createDataFrame(
        [("r", "d0", "data query table and data far table"),
         ("r", "d1", "data table query")],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     positions=True, shard_size=16)
    cont = _d(span_containing_search(index, stats, "data", "table",
                                     "query", slop=2, k=10, stem=False,
                                     camel=False, shard_size=16))
    # d0: data@0 table@2 span [0,2] holds query@1 -> 1 big span
    # d1: data@0 table@1 span [0,1]; query@2 outside
    assert cont == {0: 1}
    within = _d(span_within_search(index, stats, "query", "data",
                                   "table", slop=2, k=10, stem=False,
                                   camel=False, shard_size=16))
    assert within == {0: 1}


def test_span_within_counts_each_little_once(spark):
    from index_spark.operators.build import build_index
    from index_spark.operators.phrase import (
        span_containing_search,
        span_within_search,
    )

    # one little 'query' covered by TWO overlapping big spans
    corpus = spark.createDataFrame(
        [("r", "d0", "data query table query data")],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     positions=True, shard_size=16)
    # spans (slop 2): data@0-table@2 [0,2]; table@2-data@4 [2,4]
    cont = _d(span_containing_search(index, stats, "data", "table",
                                     "query", slop=2, k=10, stem=False,
                                     camel=False, shard_size=16))
    assert cont == {0: 2}   # both big spans hold a query
    within = _d(span_within_search(index, stats, "query", "data",
                                   "table", slop=2, k=10, stem=False,
                                   camel=False, shard_size=16))
    assert within == {0: 2}  # query@1 in [0,2]; query@3 in [2,4]


def test_span_pair_validation(span_ix):
    from index_spark.operators.phrase import span_containing_search

    docs, index, stats = span_ix
    with pytest.raises(ValueError, match="distinct"):
        span_containing_search(index, stats, "data", "data", "query")
    with pytest.raises(ValueError, match="slop"):
        span_containing_search(index, stats, "data", "table", "query",
                               slop=0)
    with pytest.raises(ValueError, match="one term"):
        span_containing_search(index, stats, "data table", "x", "q")


# ----------------------------------------------------------- script_score

def test_script_score_formula(span_ix):
    from index_spark.operators.query import script_score_search

    docs, index, stats = span_ix
    feats = docs.select("doc_id", "doc_len")
    base = script_score_search(index, stats, "data table", feats,
                               "score", k=10, stem=False, camel=False,
                               shard_size=16, round_at=4).collect()
    scripted = script_score_search(
        index, stats, "data table", feats,
        "score * ln(1 + doc_len / 10.0)", k=10, stem=False,
        camel=False, shard_size=16, round_at=4).collect()
    lens = {r.doc_id: r.doc_len for r in feats.collect()}
    base_d = {r.doc_id: r.score for r in base}
    for r in scripted:
        expect = base_d[r.doc_id] * math.log(1 + lens[r.doc_id] / 10.0)
        assert abs(r.score - expect) < 5e-3


def test_script_score_missing_feature_null(span_ix):
    from index_spark.operators.query import script_score_search

    docs, index, stats = span_ix
    feats = docs.filter("path = 'd0'").select(
        "doc_id", F.lit(2.0).alias("boost"))
    out = script_score_search(index, stats, "data table", feats,
                              "score * coalesce(boost, 1.0)", k=10,
                              stem=False, camel=False, shard_size=16,
                              round_at=4).collect()
    assert len(out) >= 2  # featureless docs still rank via coalesce


def test_script_score_rejects_score_feature(span_ix):
    from index_spark.operators.query import script_score_search

    docs, index, stats = span_ix
    feats = docs.select("doc_id", F.lit(1.0).alias("score"))
    with pytest.raises(ValueError, match="'score' column"):
        script_score_search(index, stats, "data", feats, "score * 2",
                            stem=False, camel=False)


def test_multi_phrase_alternatives(spark):
    from index_spark.operators.build import build_index
    from index_spark.operators.phrase import (
        multi_phrase_search,
        phrase_search,
    )

    corpus = spark.createDataFrame(
        [("r", "d0", "data table rows"),
         ("r", "d1", "data index rows"),
         ("r", "d2", "data rows table"),     # not adjacent
         ("r", "d3", "data table data index")],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     positions=True, shard_size=16)
    out = {r.doc_id: r.n_matches for r in multi_phrase_search(
        index, stats, [["data"], ["table", "index"]], k=10,
        stem=False, camel=False, shard_size=16).collect()}
    assert out == {0: 1, 1: 1, 3: 2}
    # single-alternative slots degrade to the exact phrase kernel
    ref = {(r.doc_id, r.n_matches) for r in phrase_search(
        index, stats, "data table", k=10, stem=False, camel=False,
        shard_size=16).collect()}
    got = {(r.doc_id, r.n_matches) for r in multi_phrase_search(
        index, stats, ["data", "table"], k=10, stem=False,
        camel=False, shard_size=16).collect()}
    assert got == ref
    with pytest.raises(ValueError, match=">= 2 slots"):
        multi_phrase_search(index, stats, [["data"]])
    with pytest.raises(ValueError, match="one term"):
        multi_phrase_search(index, stats, [["data table"], ["rows"]])
