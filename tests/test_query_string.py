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
