"""Round-4 session-11 surfaces: LM Jelinek-Mercer and Lucene
ClassicSimilarity ranking, ctags-lite symbol extraction + symbol
search, import-graph edges, the ES composite (after-key paginated)
aggregation, and T5 span corruption — each pinned against a
hand-computed python reference."""

import math

import pytest
from pyspark.sql import functions as F

from index_spark.functions.text import tokenize
from index_spark.operators.analytics import composite_facet
from index_spark.operators.build import build_index
from index_spark.operators.chunk import span_corrupt
from index_spark.operators.codesearch import (
    extract_symbols,
    import_edges,
    symbol_search,
)
from index_spark.operators.query import classic_search, lm_jelinek_mercer_search


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    corpus = spark.createDataFrame(tiny_corpus)
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=32)
    return tiny_corpus, docs.persist(), index.persist(), stats


QUERY = "import return def"
LAM = 0.2


def _corpus_model(tiny_corpus, query):
    qterms = sorted(set(tokenize(query, stem=False, camel=False)))
    toks = [tokenize(r.content, stem=False, camel=False)
            for r in tiny_corpus.itertuples(index=False)]
    return qterms, toks


def _lmjm_oracle(tiny_corpus, query, lam):
    qterms, toks = _corpus_model(tiny_corpus, query)
    c_total = sum(len(t) for t in toks)
    cf = {q: sum(t.count(q) for t in toks) for q in qterms}
    scores = {}
    for d, t in enumerate(toks):
        s, matched = 0.0, False
        for q in qterms:
            tf = t.count(q)
            if tf == 0 or cf[q] == 0:
                continue
            matched = True
            p = cf[q] / c_total
            s += math.log1p(((1.0 - lam) * tf / len(t)) / (lam * p))
        if matched:
            scores[d] = s
    return scores


def _classic_oracle(tiny_corpus, query):
    qterms, toks = _corpus_model(tiny_corpus, query)
    n = len(toks)
    df = {q: sum(q in t for t in toks) for q in qterms}
    scores = {}
    for d, t in enumerate(toks):
        s, matched = 0.0, 0
        for q in qterms:
            tf = t.count(q)
            if tf == 0 or df[q] == 0:
                continue
            matched += 1
            idf = 1.0 + math.log(n / (df[q] + 1.0))
            s += math.sqrt(tf) * idf * idf / math.sqrt(len(t))
        if matched:
            scores[d] = s * (matched / len(qterms))
    return scores


# ---------------------------------------------------- Jelinek-Mercer

def test_lmjm_matches_hand_oracle(built):
    tiny_corpus, _, index, stats = built
    want = _lmjm_oracle(tiny_corpus, QUERY, LAM)
    got = {r.doc_id: r.score for r in
           lm_jelinek_mercer_search(index, stats, QUERY, lam=LAM,
                                    k=10_000, stem=False,
                                    camel=False).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9), d


def test_lmjm_edges_and_validation(built):
    tiny_corpus, _, index, stats = built
    assert lm_jelinek_mercer_search(index, stats, "zzz_absent", lam=LAM,
                                    stem=False, camel=False).count() == 0
    assert lm_jelinek_mercer_search(index, stats, "", lam=LAM,
                                    stem=False, camel=False).count() == 0
    for bad in (0.0, 1.0, -0.2, 1.5):
        with pytest.raises(ValueError, match="lam"):
            lm_jelinek_mercer_search(index, stats, "import", lam=bad)
    with pytest.raises(ValueError, match="total_tokens"):
        lm_jelinek_mercer_search(index, {"n_docs": 1, "avgdl": 1.0},
                                 "import")


def test_lmjm_lam_is_a_real_knob(built):
    tiny_corpus, _, index, stats = built
    lo = {r.doc_id: r.score for r in
          lm_jelinek_mercer_search(index, stats, QUERY, lam=0.01,
                                   k=10_000, stem=False,
                                   camel=False).collect()}
    hi = {r.doc_id: r.score for r in
          lm_jelinek_mercer_search(index, stats, QUERY, lam=0.99,
                                   k=10_000, stem=False,
                                   camel=False).collect()}
    assert set(lo) == set(hi)  # same matched-terms-only match set
    assert any(abs(lo[d] - hi[d]) > 1e-6 for d in lo)


# ------------------------------------------------ ClassicSimilarity

def test_classic_matches_hand_oracle(built):
    tiny_corpus, _, index, stats = built
    want = _classic_oracle(tiny_corpus, QUERY)
    got = {r.doc_id: r.score for r in
           classic_search(index, stats, QUERY, k=10_000, stem=False,
                          camel=False).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9), d


def test_classic_coord_rewards_coverage(spark):
    # two docs with identical per-term arithmetic, one matching both
    # query terms, one matching a single term twice: coord must
    # separate them (this is the property BM25's plain sum lacks)
    rows = [("r", "a", "cat dog"), ("r", "b", "cat cat"),
            ("r", "c", "bird bird")]
    corpus = spark.createDataFrame(rows, "repo string, path string, "
                                         "content string")
    _, index, stats = build_index(corpus, stem=False, camel=False,
                                  shard_size=8)
    got = {r.doc_id: r.score for r in
           classic_search(index, stats, "cat dog", k=10, stem=False,
                          camel=False).collect()}
    # doc 0 (cat dog): coord 1; doc 1 (cat cat): coord 1/2
    n = stats["n_docs"]
    idf_cat = 1.0 + math.log(n / (2 + 1.0))
    idf_dog = 1.0 + math.log(n / (1 + 1.0))
    want0 = (idf_cat ** 2 + idf_dog ** 2) / math.sqrt(2)
    want1 = 0.5 * math.sqrt(2) * idf_cat ** 2 / math.sqrt(2)
    assert got[0] == pytest.approx(want0, rel=1e-9)
    assert got[1] == pytest.approx(want1, rel=1e-9)
    assert 2 not in got  # matched-terms-only
    with pytest.raises(ValueError, match="n_docs"):
        classic_search(index, {"avgdl": 1.0, "total_tokens": 4}, "cat")


# ------------------------------------------------------------ symbols

CODE_DOCS = [
    (0, "def parse_config(x):\n    pass\ndef parse_config(y):\n"
        "    return y\nclass Loader:\n    pass"),
    (1, "func (s *Server) ParseConfig() error {\n}\n"
        "function renderAll(y) {\n}\nstruct Point {\n}"),
    (2, "nothing to see here; functional prose about classy defaults"),
    (3, None),
]


@pytest.fixture(scope="module")
def code_docs(spark):
    return spark.createDataFrame(CODE_DOCS, "doc_id long, text string")


def test_extract_symbols_kinds_and_counts(code_docs):
    rows = {(r.doc_id, r.kind, r.symbol): r.n_defs
            for r in extract_symbols(code_docs).collect()}
    assert rows == {
        (0, "function", "parse_config"): 2,  # duplicate defs counted
        (0, "class", "Loader"): 1,
        (1, "function", "ParseConfig"): 1,   # go method-receiver form
        (1, "function", "renderAll"): 1,
        (1, "struct", "Point"): 1,
    }
    # prose with 'functional'/'classy'/'defaults' words emits nothing:
    # the patterns anchor on the keyword + identifier shape


def test_extract_symbols_plan_is_jvm_only(code_docs):
    plan = extract_symbols(code_docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_symbol_search_weights_and_prefix(code_docs):
    syms = extract_symbols(code_docs)
    # exact: case-insensitive; class weight 3 beats function weight 2,
    # duplicate definitions multiply
    got = {r.doc_id: r.score
           for r in symbol_search(syms, "parse_config loader", k=10)
           .collect()}
    assert got == {0: 2.0 * 2 + 3.0}
    got = {r.doc_id: r.score
           for r in symbol_search(syms, "parseconfig", k=10).collect()}
    assert got == {1: 2.0}
    # prefix mode: 'parse' hits both docs' parse* functions
    got = {r.doc_id: r.score
           for r in symbol_search(syms, "parse", k=10,
                                  prefix=True).collect()}
    assert got == {0: 4.0, 1: 2.0}
    assert symbol_search(syms, "  ", k=10).count() == 0


def test_import_edges_forms_and_dedup(spark):
    rows = [
        ("repoA", "import numpy\nimport numpy\n  import pandas\n"
                  "from repoA import x\nimportx = 3\nnot import os"),
        ("repoB", "from collections import OrderedDict\nimport repoA"),
        ("repoC", None),
    ]
    docs = spark.createDataFrame(rows, "repo string, text string")
    got = {(r.src, r.dst) for r in import_edges(docs).collect()}
    assert got == {
        ("repoA", "numpy"),       # duplicates collapse
        ("repoA", "pandas"),      # indented import matches (^\s*)
        ("repoB", "collections"),
        ("repoB", "repoA"),
        # self-import repoA->repoA dropped; 'importx'/'not import'
        # never match (\s+ after the keyword, ^ anchor)
    }


# --------------------------------------------------------- composite

def test_composite_facet_pages_tile(spark):
    rows = [(i, f"l{i % 3}", f"s{i % 5}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, "
                                     "source string")
    full = [(r.lang, r.source, r.n_docs)
            for r in composite_facet(df, ["lang", "source"],
                                     size=1000).collect()]
    assert full == sorted(full)  # ordered by the key tuple
    # walk with size=4 pages; cursoring must tile the full listing
    pages, after = [], None
    while True:
        page = composite_facet(df, ["lang", "source"], size=4,
                               after=after).collect()
        if not page:
            break
        pages.extend((r.lang, r.source, r.n_docs) for r in page)
        after = (page[-1].lang, page[-1].source)
    assert pages == full


def test_composite_facet_nulls_and_validation(spark):
    df = spark.createDataFrame(
        [(0, "en", "a"), (1, None, "b"), (2, "fr", None)],
        "doc_id long, lang string, source string")
    got = [(r.lang, r.source) for r in
           composite_facet(df, ["lang", "source"], size=10).collect()]
    assert got == [("en", "a")]  # NULL keys excluded, ES-style
    with pytest.raises(ValueError, match="after cursor"):
        composite_facet(df, ["lang", "source"], after=("en",))
    with pytest.raises(ValueError, match="at least one"):
        composite_facet(df, [])


# ------------------------------------------------- T5 span corruption

def test_span_corrupt_pinned_example(spark):
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog again and"
             " again"), (1, ""), (2, None)],
        "doc_id long, text string")
    rows = {r.doc_id: tuple(r)[1:] for r in
            span_corrupt(docs, rate=0.4, salt="t5").collect()}
    # pinned against the DuckDB window-function restatement (the
    # driver oracle): draws 2,5,6 mask -> spans {2} and {5,6}
    assert rows[0] == (12, 3, 2,
                       "the quick <extra_id_0> fox jumps <extra_id_1> "
                       "lazy dog again and again",
                       "<extra_id_0> brown <extra_id_1> over the")
    assert rows[1] == (0, 0, 0, "", "")
    assert rows[2] == (0, 0, 0, "", "")
    with pytest.raises(ValueError, match="rate"):
        span_corrupt(docs, rate=0.0)
    with pytest.raises(ValueError, match="rate"):
        span_corrupt(docs, rate=1.0)


def test_span_corrupt_roundtrip_and_determinism(spark, tiny_corpus):
    docs = spark.createDataFrame(tiny_corpus).select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("text")).limit(40).cache()
    out = span_corrupt(docs, rate=0.25, salt="rt").collect()
    # reference tokens via the SQL-parity spec the operator pins
    # (lower -> [a-z0-9]+ runs; NOT the engine tokenizer, whose UTF-8
    # normalization would fold 'naïve' -> 'naive' instead of 'na've')
    import re
    orig = {r.doc_id: [t for t in re.split("[^a-z0-9]+", r.text.lower())
                       if t]
            for r in docs.collect()}
    for r in out:
        # splice target spans back into the input -> original tokens
        spans = {}
        cur = None
        for tok in r.target_text.split():
            if tok.startswith("<extra_id_"):
                cur = tok
                spans[cur] = []
            else:
                spans[cur].append(tok)
        rebuilt = []
        for tok in r.input_text.split():
            rebuilt.extend(spans[tok] if tok.startswith("<extra_id_")
                           else [tok])
        assert rebuilt == orig[r.doc_id], r.doc_id
        assert r.n_spans == len(spans)
        assert r.n_masked == sum(len(v) for v in spans.values())
    # partitioning-invariant (the md5 draw depends only on doc_id:pos)
    again = span_corrupt(docs.repartition(7), rate=0.25, salt="rt") \
        .collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


# ------------------------------------------------------ grep context

def test_grep_context_windows(spark):
    from index_spark.operators.codesearch import grep_lines

    docs = spark.createDataFrame(
        [(0, "hit one\nplain a\nplain b\nhit two\nplain c"),
         (1, "plain\nplain\nplain"),
         (2, "hit at top\nplain")],
        "doc_id long, text string")
    got = [(r.doc_id, r.line_no, r.is_match)
           for r in grep_lines(docs, "hit", context=1).collect()]
    # doc 0: windows around lines 1 and 4 (union, no duplicates);
    # doc 1: no matches, nothing; doc 2: window clamps at line 1
    assert got == [(0, 1, True), (0, 2, False), (0, 3, False),
                   (0, 4, True), (0, 5, False),
                   (2, 1, True), (2, 2, False)]
    # context=0 keeps the original 3-column match-only shape
    plain = grep_lines(docs, "hit")
    assert plain.columns == ["doc_id", "line_no", "line"]
    assert plain.count() == 3
    with pytest.raises(ValueError, match="context"):
        grep_lines(docs, "hit", context=-1)


# -------------------------------------------------- quantile buckets

def test_quantile_buckets_hand_example(spark):
    from index_spark.operators.sample import quantile_buckets

    df = spark.createDataFrame([(i, float(i)) for i in range(1, 9)]
                               + [(9, None)],
                               "doc_id long, v double")
    got = {r.doc_id: r.bucket
           for r in quantile_buckets(df, "v", n_buckets=4).collect()}
    # quartile boundaries of 1..8 are 2.75 / 4.5 / 6.25
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 3, 8: 3,
                   9: None}


def test_quantile_buckets_ties_and_validation(spark):
    from index_spark.operators.sample import quantile_buckets

    const = spark.createDataFrame([(i, 5.0) for i in range(6)],
                                  "doc_id long, v double")
    got = {r.bucket for r in
           quantile_buckets(const, "v", n_buckets=4).collect()}
    assert got == {0}  # boundary ties take the LOWER bucket
    with pytest.raises(ValueError, match="n_buckets"):
        quantile_buckets(const, "v", n_buckets=1)
    with pytest.raises(ValueError, match="already exists"):
        quantile_buckets(const, "v", out_col="v")
    # bucket assignment is map-only once boundaries are known: the
    # output plan carries no exchange
    out = quantile_buckets(const, "v", n_buckets=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------- Matryoshka serving

def test_mrl_topk_rerank_fixes_truncated_order(spark):
    from index_spark.operators.similarity import mrl_topk

    # prefix (dim=2) ranks doc 2 above doc 1; the full 4-dim cosine
    # reverses them — rerank must surface the true order
    rows = [(0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.9, 0.0]),   # weak prefix, strong suffix
            (2, [1.0, 0.0, -1.0, 0.0])]  # perfect prefix, bad suffix
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [1.0, 0.0, 0.9, 0.0]
    trunc = [r.vec_id for r in
             mrl_topk(emb, q, dim=2, k=3).collect()]
    assert trunc[0] in (0, 2) and trunc == sorted(
        trunc, key=lambda d: trunc.index(d))  # truncated pass ignores dims 3+
    rer = [r.vec_id for r in
           mrl_topk(emb, q, dim=2, k=3, rerank_candidates=3).collect()]
    assert rer[0] == 1  # full-dim winner surfaces after rerank
    # truncated cosine values match a numpy slice computation
    import numpy as np
    got = {r.vec_id: r.cos for r in mrl_topk(emb, q, dim=2, k=3).collect()}
    for vid, v in rows:
        a, b = np.asarray(v[:2]), np.asarray(q[:2])
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert got[vid] == pytest.approx(round(want, 4), abs=1e-9)
    with pytest.raises(ValueError, match="dim"):
        mrl_topk(emb, q, dim=0)
    with pytest.raises(ValueError, match="qvec"):
        mrl_topk(emb, [], dim=2)
    # both passes are JVM folds — no Python in the plan
    plan = mrl_topk(emb, q, dim=2, k=3, rerank_candidates=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
