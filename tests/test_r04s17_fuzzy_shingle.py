"""Round-4 session-17c surface: Damerau–Levenshtein fuzzy
(transpositions=True, all three expansion paths) and the ES
``index_phrases`` shingle acceleration."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def fuzzy_ix(spark):
    from index_spark.operators.build import build_index

    texts = [
        (0, "the table holds data rows"),
        (1, "a stable data table"),
        (2, "data data table table"),
    ]
    corpus = spark.createDataFrame(
        [("r", f"d{i}", t) for i, t in texts],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     positions=True, shard_size=16)
    return docs, index.persist(), stats


# ------------------------------------------------------ damerau distance

def test_damerau_distance_pinned_vectors():
    from index_spark.operators.query import damerau_distance

    # transposition costs 1 (Lucene semantics), 2 in plain Levenshtein
    assert damerau_distance("tabel", "table") == 1
    assert damerau_distance("ab", "ba") == 1
    # unrestricted variant (the DuckDB-restatable metric): 'ca'->'abc'
    # is 2 (OSA would say 3)
    assert damerau_distance("ca", "abc") == 2
    assert damerau_distance("", "abc") == 3
    assert damerau_distance("same", "same") == 0


def test_damerau_matches_duckdb_fuzz():
    import random

    import duckdb

    from index_spark.operators.query import damerau_distance

    con = duckdb.connect()
    random.seed(11)
    for _ in range(300):
        a = "".join(random.choices("abcde", k=random.randint(0, 6)))
        b = "".join(random.choices("abcde", k=random.randint(0, 6)))
        want = con.sql(
            f"select damerau_levenshtein('{a}','{b}')").fetchone()[0]
        assert damerau_distance(a, b) == want, (a, b)


# --------------------------------------------------- transposition paths

def test_fuzzy_expand_transpositions_all_paths(fuzzy_ix):
    from index_spark.operators.query import fuzzy_expand
    from index_spark.plans.dictionary import dictionary_from_index
    from index_spark.plans.trigram import trigram_postings

    docs, index, stats = fuzzy_ix
    dic = dictionary_from_index(index)
    tri = trigram_postings(dic)
    # 'tabel' is a transposition of 'table': invisible to lev<=1,
    # found by DL<=1 on every path
    assert fuzzy_expand(None, ["tabel"], max_dist=1,
                        dictionary=dic) == {"tabel": []}
    for kw in ({"dictionary": dic}, {"trigram": tri}, {}):
        src = None if kw else index
        got = fuzzy_expand(index if not kw else None, ["tabel"],
                           max_dist=1, transpositions=True, **kw)
        assert got == {"tabel": ["table"]}, kw


def test_search_fuzzy_transpositions(fuzzy_ix):
    from index_spark.operators.query import search_fuzzy
    from index_spark.plans.dictionary import dictionary_from_index

    docs, index, stats = fuzzy_ix
    dic = dictionary_from_index(index)
    out = search_fuzzy(index, docs, stats, "tabel", k=10, max_dist=1,
                       transpositions=True, stem=False, camel=False,
                       shard_size=16, dictionary=dic).collect()
    assert {r.doc_id for r in out} == {0, 1, 2}
    empty = search_fuzzy(index, docs, stats, "tabel", k=10, max_dist=1,
                         stem=False, camel=False, shard_size=16,
                         dictionary=dic).collect()
    assert empty == []


# ------------------------------------------------------- index_phrases

def test_indexed_phrase_matches_positional(fuzzy_ix, spark):
    from index_spark.operators.build import build_index
    from index_spark.operators.phrase import (
        indexed_phrase_search,
        phrase_search,
        shingle_corpus,
    )

    docs, index, stats = fuzzy_ix
    corpus = spark.createDataFrame(
        [("r", "d0", "the table holds data rows"),
         ("r", "d1", "a stable data table"),
         ("r", "d2", "data data table table")],
        "repo string, path string, content string")
    ref = {(r.doc_id, r.n_matches) for r in phrase_search(
        index, stats, "data table", k=100, stem=False, camel=False,
        shard_size=16).collect()}
    d2, ix2, st2 = build_index(shingle_corpus(corpus), stem=False,
                               camel=False, shard_size=16)
    got = {(r.doc_id, r.n_matches) for r in indexed_phrase_search(
        ix2, st2, "data table", k=100).collect()}
    assert got == ref and got == {(1, 1), (2, 1)}


def test_indexed_phrase_bigram_only(fuzzy_ix):
    from index_spark.operators.phrase import indexed_phrase_search

    docs, index, stats = fuzzy_ix
    with pytest.raises(ValueError, match="2-token"):
        indexed_phrase_search(index, stats, "one two three")


def test_phrase_term_is_analyzer_safe():
    from index_spark.functions.text import tokenize
    from index_spark.operators.phrase import phrase_term

    t = phrase_term("data", "table")
    assert len(t) == 16
    assert tokenize(t, stem=False, camel=False) == [t]
    assert phrase_term("data", "table") == t          # deterministic
    assert phrase_term("dat", "atable") != t          # separator matters


def test_fuzzy_prefix_length_prunes(fuzzy_ix):
    from index_spark.operators.query import fuzzy_expand
    from index_spark.plans.dictionary import dictionary_from_index

    docs, index, stats = fuzzy_ix
    dic = dictionary_from_index(index)
    # 'sable' is lev-1 from 'stable' and 'table'; prefix_length=1
    # keeps only the s-candidates
    free = fuzzy_expand(None, ["sable"], max_dist=1, dictionary=dic)
    pinned = fuzzy_expand(None, ["sable"], max_dist=1, dictionary=dic,
                          prefix_length=1)
    assert set(free["sable"]) == {"stable", "table"}
    assert pinned == {"sable": ["stable"]}
    # index path agrees
    assert fuzzy_expand(index, ["sable"], max_dist=1,
                        prefix_length=1) == {"sable": ["stable"]}
    # a query term shorter than the prefix is exact-only
    short = fuzzy_expand(None, ["a"], max_dist=1, dictionary=dic,
                         prefix_length=2)
    assert short == {"a": ["a"]}
    with pytest.raises(ValueError, match="prefix_length"):
        fuzzy_expand(None, ["x"], dictionary=dic, prefix_length=-1)
