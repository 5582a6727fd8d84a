"""Lucene/ES query_string boolean grammar over the per-term BM25
relation (parser + compositional evaluator)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def qs_ix(spark):
    from index_spark.operators.build import build_index

    texts = [
        (0, "data table join"),        # both disjuncts could match
        (1, "data table"),             # left disjunct only
        (2, "scan the rows"),          # right disjunct (no filter)
        (3, "scan with filter"),       # right disjunct killed by NOT
        (4, "data alone"),             # matches nothing
    ]
    corpus = spark.createDataFrame(
        [("r", f"d{i}", t) for i, t in texts],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=16)
    return docs, index.persist(), stats


def test_parse_precedence_and_adjacency():
    from index_spark.operators.query import parse_query_string

    ast = parse_query_string("a AND b OR c", stem=False, camel=False)
    assert ast == ("or", [("and", [("term", "a"), ("term", "b")]),
                          ("term", "c")])
    # adjacency is the OR default_operator; NOT binds tightest
    ast2 = parse_query_string("a NOT b", stem=False, camel=False)
    assert ast2 == ("or", [("term", "a"), ("not", ("term", "b"))])
    # lowercase keywords are terms (Lucene rule)
    ast3 = parse_query_string("a and b", stem=False, camel=False)
    assert ast3 == ("or", [("term", "a"), ("term", "and"),
                           ("term", "b")])
    with pytest.raises(ValueError, match="unbalanced"):
        parse_query_string("(a OR b", stem=False, camel=False)
    with pytest.raises(ValueError, match="misplaced"):
        parse_query_string("AND b", stem=False, camel=False)


def test_query_string_boolean_match_sets(qs_ix):
    from index_spark.operators.query import query_string_search

    docs, index, stats = qs_ix
    out = {r.doc_id for r in query_string_search(
        index, stats, "(data AND table) OR (scan NOT filter)", k=10,
        stem=False, camel=False).collect()}
    # 0,1 via data AND table; 2 via scan; 3 excluded by NOT filter;
    # 4 has data but not table
    assert out == {0, 1, 2}


def test_query_string_and_scores_sum(qs_ix):
    from index_spark.operators.query import (
        per_term_scores,
        query_string_search,
    )

    docs, index, stats = qs_ix
    S = {(r.term, r.doc_id): r.score for r in per_term_scores(
        index, stats, ["data", "table"]).collect()}
    out = {r.doc_id: r.score for r in query_string_search(
        index, stats, "data AND table", k=10, stem=False,
        camel=False).collect()}
    for d in out:
        assert abs(out[d] - (S[("data", d)] + S[("table", d)])) < 1e-9


def test_query_string_pure_negation_raises(qs_ix):
    from index_spark.operators.query import query_string_search

    docs, index, stats = qs_ix
    with pytest.raises(ValueError, match="pure negation"):
        query_string_search(index, stats, "NOT data", stem=False,
                            camel=False)
    with pytest.raises(ValueError, match="non-negated"):
        query_string_search(index, stats, "NOT data NOT table",
                            stem=False, camel=False)
    with pytest.raises(ValueError, match="NOT NOT"):
        query_string_search(index, stats, "data NOT NOT table",
                            stem=False, camel=False)


def test_cli_qs_flag(spark, tiny_corpus, tmp_path, capsys):
    from main import main

    import json as _json

    from index_spark.plans.checkpoint import build_chunked

    ordered = tiny_corpus.sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    out = str(tmp_path / "qs_store")
    build_chunked(spark, spark.createDataFrame(ordered), out,
                  docs_per_chunk=64, shard_size=128)
    main(["--cores", "8", "query", "--index-dir", out,
          "--query", "import AND return", "-k", "5", "--qs"])
    rows = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows and all("doc_id" in r and "score" in r for r in rows)
    with pytest.raises(SystemExit, match="boolean grammar"):
        main(["--cores", "8", "query", "--index-dir", out,
              "--query", "import AND return", "--qs", "--mode", "and"])


# ------------------------------------------------------- simple_query_string


def test_sqs_parse_grammar_and_leniency():
    from index_spark.operators.query import parse_simple_query_string as p

    assert p("data + table | scan", stem=False, camel=False) == \
        ("or", [("and", [("term", "data"), ("term", "table")]),
                ("term", "scan")])
    # leading '-' negates the next atom, including a group
    assert p("data -(scan | merge)", stem=False, camel=False) == \
        ("or", [("term", "data"),
                ("not", ("or", [("term", "scan"), ("term", "merge")]))])
    # PHRASE flag off: quotes strip, tokens join at the default op
    assert p('"data table" -scan', stem=False, camel=False) == \
        ("or", [("term", "data"), ("term", "table"),
                ("not", ("term", "scan"))])
    # trailing '*' is a prefix leaf (unstemmed text)
    assert p("ta* + data", stem=False, camel=False) == \
        ("and", [("prefix", "ta"), ("term", "data")])
    # default_operator=and: adjacency joins conjunctively
    assert p("a b", default_operator="and", stem=False, camel=False) == \
        ("and", [("term", "a"), ("term", "b")])
    # leniency: broken operators/parens never raise
    assert p("(((", stem=False, camel=False) is None
    assert p(")a(", stem=False, camel=False) == ("term", "a")
    assert p("+ | -", stem=False, camel=False) is None
    assert p("a + ", stem=False, camel=False) == ("term", "a")


def test_sqs_match_sets_and_score_parity(qs_ix):
    from index_spark.operators.query import (
        query_string_search,
        simple_query_string_search,
    )

    docs, index, stats = qs_ix
    # same boolean as the query_string test, in simple syntax
    got = {r.doc_id for r in simple_query_string_search(
        index, stats, "(data + table) | (scan -filter)", k=10,
        stem=False, camel=False).collect()}
    assert got == {0, 1, 2}
    # equal-AST queries score identically across the two grammars
    a = simple_query_string_search(index, stats, "data + table", k=10,
                                   stem=False, camel=False).collect()
    b = query_string_search(index, stats, "data AND table", k=10,
                            stem=False, camel=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sqs_prefix_constant_score(qs_ix):
    from index_spark.operators.query import simple_query_string_search

    docs, index, stats = qs_ix
    # ta* expands to {table}; docs 0,1 match at constant 1.0
    out = {r.doc_id: r.score for r in simple_query_string_search(
        index, stats, "ta*", k=10, stem=False, camel=False).collect()}
    assert out == {0: 1.0, 1: 1.0}
    # empty rewrite matches nothing; pure negation matches nothing
    assert simple_query_string_search(
        index, stats, "zz*", stem=False, camel=False).count() == 0
    assert simple_query_string_search(
        index, stats, "-data", stem=False, camel=False).count() == 0
