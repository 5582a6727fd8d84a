"""Typo-tolerant retrieval: fuzzy_expand / search_fuzzy vs a naive
dynamic-programming Levenshtein restatement over the oracle dictionary."""

import pytest

from index_spark.functions.text import tokenize
from index_spark.operators.build import build_index
from index_spark.operators.query import fuzzy_expand, search, search_fuzzy
from tests.oracle import OracleIndex

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
    return docs, index, stats, oracle


def lev(a: str, b: str) -> int:
    """Textbook Levenshtein DP (insert/delete/substitute, unit cost)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def naive_expand(oracle: OracleIndex, qterms, max_dist=1, max_expansions=8):
    out = {}
    for q in qterms:
        cand = [(t, len(p)) for t, p in oracle.tf.items()
                if abs(len(t) - len(q)) <= max_dist and lev(t, q) <= max_dist]
        cand.sort(key=lambda x: (-x[1], x[0]))
        out[q] = [t for t, _ in cand[:max_expansions]]
    return out


def oracle_or_terms(oracle: OracleIndex, terms, k=10):
    scores = {}
    for t in sorted(set(terms)):  # pinned ascending sum order
        posts = oracle.tf.get(t)
        if not posts:
            continue
        idf = oracle.idf(t)
        for d, tf in posts.items():
            dl = oracle.doc_len[d]
            scores[d] = scores.get(d, 0.0) + idf * tf / (
                tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / oracle.avgdl))
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_fuzzy_expand_matches_naive(built):
    docs, index, stats, oracle = built
    for qs in [["imort"], ["retur", "clas"], ["import"], ["zzzzzzz"]]:
        got = fuzzy_expand(index, qs, max_dist=1, max_expansions=8)
        assert got == naive_expand(oracle, qs), qs


def test_fuzzy_expand_cap_and_order(built):
    """Cap binds and keeps the highest-df neighbors."""
    docs, index, stats, oracle = built
    full = naive_expand(oracle, ["a"], max_dist=1, max_expansions=10 ** 9)
    if len(full["a"]) > 3:
        got = fuzzy_expand(index, ["a"], max_dist=1, max_expansions=3)
        assert got["a"] == full["a"][:3]


def test_search_fuzzy_rank_identity(built):
    docs, index, stats, oracle = built
    for q in ["imort retur", "clas", "uniq7toke"]:
        qterms = sorted(set(tokenize(q, stem=True)))
        exp = naive_expand(oracle, qterms)
        terms = sorted({t for v in exp.values() for t in v})
        expected = oracle_or_terms(oracle, terms)
        got = search_fuzzy(index, docs, stats, q, k=10,
                           shard_size=SHARD_SIZE).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in expected], q
        for r, (ed, es) in zip(got, expected):
            assert r["score"] == pytest.approx(es, abs=1e-9), (q, ed)


def test_search_fuzzy_no_neighbors_empty(built):
    docs, index, stats, _ = built
    out = search_fuzzy(index, docs, stats, "qqqqqqqqqqqq", k=10,
                       shard_size=SHARD_SIZE).collect()
    assert out == []


def test_search_fuzzy_exact_term_included(built):
    """A term present in the dictionary expands to itself (distance 0)
    plus neighbors — fuzzy results are a superset-or-equal scoring set
    of the exact query."""
    docs, index, stats, oracle = built
    exact = {r["doc_id"] for r in
             search(index, docs, stats, "import", k=1000,
                    shard_size=SHARD_SIZE).collect()}
    fuzzy = {r["doc_id"] for r in
             search_fuzzy(index, docs, stats, "import", k=1000,
                          shard_size=SHARD_SIZE).collect()}
    assert exact <= fuzzy


def test_suggest_corrections(built):
    from index_spark.operators.query import suggest_corrections

    docs, index, stats, oracle = built
    # 'import' is known -> no row; 'imort' is absent -> its df-max
    # distance-1 neighbor
    rows = suggest_corrections(index, "import imort").collect()
    exp = naive_expand(oracle, ["imort"], max_expansions=1)["imort"]
    if exp:
        assert len(rows) == 1
        r = rows[0]
        assert (r["qterm"], r["suggestion"]) == ("imort", exp[0])
        assert r["df"] == len(oracle.tf[exp[0]])
    else:
        assert rows == []
    # fully-known query -> empty
    assert suggest_corrections(index, "import return").collect() == []


def test_search_fuzzy_and_groups(built):
    """Conjunctive fuzzy = AND across ORIGINAL terms, OR within each
    term's expansion group: a doc must contain >=1 variant of EVERY
    original term; every matched variant still contributes with its own
    idf (same per-term scoring as the OR path, narrowed candidates)."""
    docs, index, stats, oracle = built
    q = "imort retur"
    qterms = sorted(set(tokenize(q, stem=True)))
    exp = naive_expand(oracle, qterms)
    assert all(exp[t] for t in qterms), "fixture must expand both terms"
    group_docs = []
    for t in qterms:
        s = set()
        for v in exp[t]:
            s |= set(oracle.tf.get(v, {}))
        group_docs.append(s)
    allowed = set.intersection(*group_docs)
    assert allowed, "fixture must have conjunctive fuzzy matches"
    terms = sorted({t for v in exp.values() for t in v})
    expected = [(d, s) for d, s in oracle_or_terms(oracle, terms, k=10 ** 9)
                if d in allowed][:10]
    got = search_fuzzy(index, docs, stats, q, k=10, mode="and",
                       shard_size=SHARD_SIZE).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]
    for r, (ed, es) in zip(got, expected):
        assert r["score"] == pytest.approx(es, abs=1e-9), ed
    # and it's a strict narrowing of the OR path on this fixture
    or_ids = [r["doc_id"] for r in
              search_fuzzy(index, docs, stats, q, k=10, mode="or",
                           shard_size=SHARD_SIZE).collect()]
    assert set(r["doc_id"] for r in got) <= set(
        d for d, _ in oracle_or_terms(oracle, terms, k=10 ** 9))
    del or_ids


def test_search_fuzzy_and_unmatchable_term_empty(built):
    """An original term with NO dictionary neighborhood can never be
    satisfied under mode='and' -> empty (same contract as plain AND with
    a missing term)."""
    docs, index, stats, _ = built
    out = search_fuzzy(index, docs, stats, "import qqqqqqqqqqqq", k=10,
                       mode="and", shard_size=SHARD_SIZE).collect()
    assert out == []


def test_search_fuzzy_exclude_stems_with_caller_flags(built):
    """`exclude` tokenizes with the CALLER's stem/camel flags (the inner
    search runs stem=False): on a stem-built index, excluding an
    inflected form must hit the stemmed dictionary term."""
    docs, index, stats, oracle = built
    from index_spark.functions.porter import stem_word

    assert stem_word("imports") == "import"
    base = search_fuzzy(index, docs, stats, "retur", k=1000,
                        shard_size=SHARD_SIZE).collect()
    ex_inflected = search_fuzzy(index, docs, stats, "retur", k=1000,
                                exclude="imports",
                                shard_size=SHARD_SIZE).collect()
    ex_exact = search_fuzzy(index, docs, stats, "retur", k=1000,
                            exclude="import",
                            shard_size=SHARD_SIZE).collect()
    as_rows = lambda rs: [(r["doc_id"], r["score"]) for r in rs]
    assert as_rows(ex_inflected) == as_rows(ex_exact)
    import_docs = set(oracle.tf.get("import", {}))
    assert all(r["doc_id"] not in import_docs for r in ex_inflected)
    if any(d for d, _ in as_rows(base) if d in import_docs):
        assert as_rows(ex_inflected) != as_rows(base)
