"""Round-4 session-19 surface: TermRangeQuery (constant-score rewrite),
SpanMultiTermQueryWrapper (prefix-expanded phrase slot), and the
expansion primitive's Lucene top-terms order."""

from collections import Counter

import pytest


TEXTS = [
    (0, "data table scan and data tablet rows"),
    (1, "data tab stop then data table again"),
    (2, "tablet tab table data"),
    (3, "scan merge filter rows"),
    (4, "data query data table table"),
]


@pytest.fixture(scope="module")
def pos_ix(spark):
    from index_spark.operators.build import build_index

    corpus = spark.createDataFrame(
        [("r", f"d{i}", t) for i, t in TEXTS],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     positions=True, shard_size=16)
    return docs, index.persist(), stats


def _range_expected(lo, hi):
    per_doc = Counter()
    for i, t in TEXTS:
        per_doc[i] = len({w for w in t.split() if lo <= w < hi})
    return {d: float(n) for d, n in per_doc.items() if n}


def test_term_range_matches_brute_force(pos_ix):
    from index_spark.operators.query import term_range_search

    _, index, _ = pos_ix
    out = term_range_search(index, "ta", "tb", k=10)
    got = {r["doc_id"]: r["score"] for r in out.collect()}
    assert got == _range_expected("ta", "tb")


def test_term_range_open_and_exclusive_bounds(pos_ix):
    from index_spark.operators.query import term_range_search

    _, index, _ = pos_ix
    # open lower bound: every term < "e" (doc marker % is excluded)
    out = term_range_search(index, None, "e", k=10)
    got = {r["doc_id"]: r["score"] for r in out.collect()}
    exp = {i: float(len({w for w in t.split() if w < "e"}))
           for i, t in TEXTS}
    assert got == {d: n for d, n in exp.items() if n}
    # exclusive lower: term > "data" drops "data" itself
    out2 = term_range_search(index, "data", "e", include_lower=False,
                             k=10).collect()
    assert not out2  # nothing strictly between "data" and "e"
    with pytest.raises(ValueError):
        term_range_search(index, None, None)


def test_expand_prefix_lucene_order(pos_ix):
    from index_spark.operators.phrase import expand_prefix_terms

    _, index, _ = pos_ix
    # df: table=4 docs, tab=2, tablet=2 -> top-2 = table, then tab
    # (df desc, term asc tie-break)
    assert expand_prefix_terms(index, "ta", max_expansions=2) == \
        sorted(["table", "tab"])
    assert expand_prefix_terms(index, "ta", max_expansions=1) == ["table"]
    assert expand_prefix_terms(index, "zz") == []


def test_span_multi_prefix_slot(pos_ix):
    from index_spark.operators.phrase import span_multi_search

    _, index, stats = pos_ix
    out = span_multi_search(index, stats, ["data", {"prefix": "ta"}],
                            k=10, stem=False, camel=False,
                            shard_size=16)
    got = {r["doc_id"]: r["n_matches"] for r in out.collect()}
    # brute force: "data" followed by any ta* token
    exp = Counter()
    for i, t in TEXTS:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            if a == "data" and b.startswith("ta"):
                exp[i] += 1
    assert got == dict(exp)


def test_span_multi_empty_expansion_matches_nothing(pos_ix):
    from index_spark.operators.phrase import span_multi_search

    _, index, stats = pos_ix
    out = span_multi_search(index, stats, ["data", {"prefix": "zz"}],
                            k=10, stem=False, camel=False, shard_size=16)
    assert out.count() == 0


def test_span_multi_max_expansions_gate(pos_ix):
    from index_spark.operators.phrase import span_multi_search

    _, index, stats = pos_ix
    # max_expansions=1 keeps only the highest-df expansion ("table"):
    # "data tab"/"data tablet" adjacencies no longer match
    out = span_multi_search(index, stats, ["data", {"prefix": "ta"}],
                            k=10, stem=False, camel=False,
                            max_expansions=1, shard_size=16)
    got = {r["doc_id"]: r["n_matches"] for r in out.collect()}
    exp = Counter()
    for i, t in TEXTS:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            if a == "data" and b == "table":
                exp[i] += 1
    assert got == dict(exp)


def test_span_multi_literal_only_degrades_to_multi_phrase(pos_ix):
    from index_spark.operators.phrase import (
        multi_phrase_search,
        span_multi_search,
    )

    _, index, stats = pos_ix
    a = span_multi_search(index, stats, ["data", ["table", "tab"]],
                          k=10, stem=False, camel=False,
                          shard_size=16).collect()
    b = multi_phrase_search(index, stats, [["data"], ["table", "tab"]],
                            k=10, stem=False, camel=False,
                            shard_size=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
