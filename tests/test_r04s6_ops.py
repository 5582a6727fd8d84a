"""Round-4 session-6 surfaces: minimum_should_match count gating,
sort-by-attribute retrieval, stats facets, and int8 scalar-quantized
ANN — each pinned against a brute-force or hand-computed reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from index_spark.functions.text import tokenize
from index_spark.operators.analytics import facet_stats, sort_search
from index_spark.operators.build import build_index
from index_spark.operators.query import search
from index_spark.operators.similarity import (
    cosine_topk,
    quantize_bounds,
    scalar_quantize,
    sq_topk,
)


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    corpus = spark.createDataFrame(tiny_corpus)
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=32, positions=True)
    return tiny_corpus, docs.persist(), index.persist(), stats


QUERY = "import return def"


def _term_sets(tiny_corpus, terms):
    """doc_id -> set of query terms present (tokenizer-faithful)."""
    out = {}
    for i, row in enumerate(tiny_corpus.itertuples(index=False)):
        toks = set(tokenize(row.content, stem=False, camel=False))
        out[i] = {t for t in terms if t in toks}
    return out


# ------------------------------------------------------- min_should_match

def test_min_match_counts_gate_the_match_set(built):
    tiny_corpus, docs, index, stats = built
    qterms = sorted(set(tokenize(QUERY, stem=False, camel=False)))
    present = _term_sets(tiny_corpus, qterms)
    big = 10_000
    for m in (1, 2, 3):
        got = {r.doc_id for r in search(index, docs, stats, QUERY, k=big,
                                        stem=False, camel=False,
                                        shard_size=32, min_match=m)
               .collect()}
        want = {d for d, s in present.items() if len(s) >= m}
        assert got == want, f"min_match={m}"


def test_min_match_scores_are_full_or_scores(built):
    # gating filters the match set but never rescales: a surviving doc's
    # score equals its plain OR-mode score bit-for-bit
    _, docs, index, stats = built
    or_scores = {r.doc_id: r.score
                 for r in search(index, docs, stats, QUERY, k=10_000,
                                 stem=False, camel=False, shard_size=32)
                 .collect()}
    m2 = search(index, docs, stats, QUERY, k=10_000, stem=False,
                camel=False, shard_size=32, min_match=2).collect()
    assert m2 and all(or_scores[r.doc_id] == r.score for r in m2)


def test_min_match_n_equals_and_mode(built):
    _, docs, index, stats = built
    n = len(set(tokenize(QUERY, stem=False, camel=False)))
    mm = search(index, docs, stats, QUERY, k=50, stem=False, camel=False,
                shard_size=32, min_match=n).collect()
    am = search(index, docs, stats, QUERY, k=50, stem=False, camel=False,
                shard_size=32, mode="and").collect()
    assert [(r.doc_id, r.score) for r in mm] == \
        [(r.doc_id, r.score) for r in am]


def test_min_match_above_term_count_is_empty(built):
    _, docs, index, stats = built
    assert search(index, docs, stats, QUERY, k=10, stem=False,
                  camel=False, shard_size=32, min_match=99).count() == 0


def test_min_match_validation(built):
    _, docs, index, stats = built
    with pytest.raises(ValueError, match="mode='or'"):
        search(index, docs, stats, QUERY, mode="and", min_match=2,
               shard_size=32).collect()
    with pytest.raises(ValueError, match=">= 1"):
        search(index, docs, stats, QUERY, min_match=0,
               shard_size=32).collect()


def test_min_match_composes_with_exclude(built):
    tiny_corpus, docs, index, stats = built
    qterms = sorted(set(tokenize(QUERY, stem=False, camel=False)))
    present = _term_sets(tiny_corpus, qterms)
    banned = {i for i, row in enumerate(tiny_corpus.itertuples(index=False))
              if "class" in set(tokenize(row.content, stem=False,
                                         camel=False))}
    got = {r.doc_id for r in search(index, docs, stats, QUERY, k=10_000,
                                    stem=False, camel=False, shard_size=32,
                                    min_match=2, exclude="class").collect()}
    want = {d for d, s in present.items() if len(s) >= 2 and d not in banned}
    assert got == want


# --------------------------------------------------------- sort-by-field

def test_sort_search_matches_bruteforce(built, spark):
    tiny_corpus, docs, index, stats = built
    qterms = sorted(set(tokenize(QUERY, stem=False, camel=False)))
    present = _term_sets(tiny_corpus, qterms)
    lens = {i: len(row.content)
            for i, row in enumerate(tiny_corpus.itertuples(index=False))}
    meta = spark.createDataFrame(
        [(i, lens[i]) for i in lens], "doc_id long, n_chars long")
    got = [(r.doc_id, r.n_chars)
           for r in sort_search(index, meta, QUERY, by="n_chars", k=7,
                                stem=False, camel=False).collect()]
    match = [d for d, s in present.items() if s]
    want = sorted(((d, lens[d]) for d in match),
                  key=lambda x: (-x[1], x[0]))[:7]
    assert got == want
    # ascending flips the order
    got_asc = [(r.doc_id, r.n_chars)
               for r in sort_search(index, meta, QUERY, by="n_chars", k=7,
                                    ascending=True, stem=False,
                                    camel=False).collect()]
    want_asc = sorted(((d, lens[d]) for d in match),
                      key=lambda x: (x[1], x[0]))[:7]
    assert got_asc == want_asc


# ------------------------------------------------------------ stats facet

def test_facet_stats_matches_bruteforce(built, spark):
    tiny_corpus, docs, index, stats = built
    qterms = sorted(set(tokenize(QUERY, stem=False, camel=False)))
    present = _term_sets(tiny_corpus, qterms)
    rows = [(i, row.lang, len(row.content))
            for i, row in enumerate(tiny_corpus.itertuples(index=False))]
    meta = spark.createDataFrame(rows, "doc_id long, lang string, "
                                       "n_chars long")
    got = {r.lang: (r.n_docs, r.min_value, r.max_value, r.avg_value,
                    r.sum_value)
           for r in facet_stats(index, meta, QUERY, value="n_chars",
                                by="lang", stem=False, camel=False)
           .collect()}
    match = {d for d, s in present.items() if s}
    want = {}
    for lang in {r[1] for r in rows}:
        vals = [r[2] for r in rows if r[1] == lang and r[0] in match]
        if vals:
            want[lang] = (len(vals), min(vals), max(vals),
                          round(sum(vals) / len(vals), 4), sum(vals))
    assert got == want
    # ungrouped: one global row
    g = facet_stats(index, meta, QUERY, value="n_chars",
                    stem=False, camel=False).collect()
    allv = [r[2] for r in rows if r[0] in match]
    assert len(g) == 1 and (g[0].n_docs, g[0].min_value, g[0].max_value,
                            g[0].sum_value) == \
        (len(allv), min(allv), max(allv), sum(allv))


# ---------------------------------------------------- scalar-quantized ANN

@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(200, 16)).astype(np.float32)
    rows = [(i, [float(v) for v in x[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.persist(), x


def test_quantize_bounds_are_exact_minmax(emb):
    df, x = emb
    lo, hi = quantize_bounds(df)
    np.testing.assert_array_equal(lo, x.astype(np.float64).min(axis=0))
    np.testing.assert_array_equal(hi, x.astype(np.float64).max(axis=0))


def test_codes_match_numpy_reference(emb):
    df, x = emb
    lo, hi = quantize_bounds(df)
    got = {r.vec_id: np.array(r.codes)
           for r in scalar_quantize(df, lo, hi).collect()}
    xd = x.astype(np.float64)
    rng_ = hi - lo
    ref = np.clip(np.floor((xd - lo) / rng_ * 255), 0, 255).astype(np.int64)
    for i in range(len(xd)):
        np.testing.assert_array_equal(got[i], ref[i], err_msg=f"vec {i}")
    # codes occupy the full int8 range at the extremes
    assert all((ref.min(axis=0) == 0) & (ref.max(axis=0) >= 254))


def test_constant_dimension_encodes_zero(spark):
    rows = [(0, [1.5, 2.0]), (1, [1.5, 3.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lo, hi = quantize_bounds(df)
    codes = {r.vec_id: list(r.codes)
             for r in scalar_quantize(df, lo, hi).collect()}
    assert codes[0][0] == 0 and codes[1][0] == 0  # hi == lo -> 0
    assert codes[0][1] == 0 and codes[1][1] == 255


def test_sq_topk_approximates_and_rerank_recovers_exact(emb):
    df, x = emb
    lo, hi = quantize_bounds(df)
    codes = scalar_quantize(df, lo, hi).persist()
    qvec = [float(v) for v in x[3]]
    exact = [r.vec_id for r in cosine_topk(df, qvec, k=10).collect()]
    approx = [r.vec_id for r in sq_topk(codes, lo, hi, qvec, k=10)
              .collect()]
    # 16-dim SQ8 keeps high recall@10 on gaussian data
    assert len(set(exact) & set(approx)) >= 8
    rr = cosine_topk(df, qvec, k=10).collect()
    rk = sq_topk(codes, lo, hi, qvec, k=10, rerank=50, emb=df).collect()
    # reranked scores are the exact cosine values
    exact_cos = {r.vec_id: r.cos for r in rr}
    assert all(exact_cos.get(r.vec_id) == r.cos for r in rk)


def test_sq_topk_rerank_requires_emb(emb):
    df, _ = emb
    lo, hi = quantize_bounds(df)
    codes = scalar_quantize(df, lo, hi)
    with pytest.raises(ValueError, match="full-precision"):
        sq_topk(codes, lo, hi, [0.0] * 16, rerank=10)


# ------------------------------------------------------------- FIM samples

def test_fim_tiles_reconstruct_the_document(spark):
    from index_spark.operators.chunk import fim_split
    rows = [(i, f"doc {i} " + "abcdefghij" * (1 + i % 5)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.fim, r.sample)
           for r in fim_split(df, rate=1.0).collect()}
    texts = dict(rows)
    assert all(f for f, _ in out.values())  # rate=1.0 selects every doc
    for d, (f, s) in out.items():
        assert s.startswith("<PRE>")
        pre, rest = s[len("<PRE>"):].split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        assert pre + mid + suf == texts[d], f"doc {d} does not tile"


def test_fim_rate_and_passthrough(spark):
    from index_spark.operators.chunk import fim_split
    rows = [(i, "x" * 50) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = fim_split(df, rate=0.3).collect()
    n_fim = sum(1 for r in out if r.fim)
    assert abs(n_fim / 1000 - 0.3) < 0.05  # md5 draw ~ uniform
    assert all(r.sample == "x" * 50 for r in out if not r.fim)
    # deterministic across invocations and partitionings
    again = {r.doc_id: r.sample
             for r in fim_split(df.repartition(7), rate=0.3).collect()}
    assert all(again[r.doc_id] == r.sample for r in out)


def test_fim_empty_text_still_emits(spark):
    from index_spark.operators.chunk import fim_split
    df = spark.createDataFrame([(0, "")], "doc_id long, text string")
    r = fim_split(df, rate=1.0).collect()[0]
    assert r.fim and r.sample == "<PRE><SUF><MID>"


# ---------------------------------------------------------- rescore window

def test_rescore_matches_bruteforce(built):
    import math

    from index_spark.operators.query import rescore_search
    tiny_corpus, docs, index, stats = built
    W, K, weight, pwin = 40, 10, 0.7, 4
    q = "import return def"
    base = search(index, docs, stats, q, k=W, stem=False, camel=False,
                  shard_size=32).collect()
    # python proximity counts over the candidates
    def pairs(text):
        toks = tokenize(text, stem=False, camel=False)
        pa = [i for i, t in enumerate(toks) if t == "import"]
        pb = [i for i, t in enumerate(toks) if t == "return"]
        return sum(1 for a in pa for b in pb if 0 < b - a <= pwin)
    texts = {i: r.content
             for i, r in enumerate(tiny_corpus.itertuples(index=False))}
    want = sorted(
        ((r.doc_id, r.score + weight * math.log(1 + pairs(texts[r.doc_id])))
         for r in base), key=lambda x: (-x[1], x[0]))[:K]
    got = [(r.doc_id, r.score)
           for r in rescore_search(index, docs, stats, q, "import",
                                   "return", k=K, rescore_window=W,
                                   weight=weight, proximity_window=pwin,
                                   stem=False, camel=False,
                                   shard_size=32).collect()]
    assert [d for d, _ in got] == [d for d, _ in want]
    assert all(abs(a - b) < 1e-9 for (_, a), (_, b) in zip(got, want))


def test_rescore_weight_zero_is_plain_topk(built):
    from index_spark.operators.query import rescore_search
    _, docs, index, stats = built
    q = "import return def"
    plain = [(r.doc_id, r.score)
             for r in search(index, docs, stats, q, k=10, stem=False,
                             camel=False, shard_size=32).collect()]
    rz = [(r.doc_id, r.score)
          for r in rescore_search(index, docs, stats, q, "import",
                                  "return", k=10, rescore_window=40,
                                  weight=0.0, stem=False, camel=False,
                                  shard_size=32).collect()]
    assert rz == plain


def test_rescore_prunes_positional_scan_to_candidate_shards(built):
    from index_spark.operators.query import rescore_search
    _, docs, index, stats = built
    out = rescore_search(index, docs, stats, "import return def",
                         "import", "return", k=5, rescore_window=8,
                         stem=False, camel=False, shard_size=32)
    assert out.count() == 5  # materializes end-to-end with the pruning
