"""Session-21 operators: DFI / IB / Axiomatic similarity modules,
BBQ-style 1-bit asymmetric ANN, rank-biased precision, Zipf's-law fit,
context-filtered completion suggest."""

import numpy as np
import pytest
from pyspark.sql import functions as F

TEXTS = ["data table scan join", "data data data filter",
         "table sort merge", "group agg window data table"]


def _tiny_index(spark, texts=TEXTS):
    from index_spark.operators.build import build_index

    corpus = spark.createDataFrame(
        [("r", f"doc{i:04d}", t) for i, t in enumerate(texts)],
        "repo string, path string, content string")
    return build_index(corpus, stem=False, camel=False, shard_size=64)


# ---------------------------------------------------------------------------
# DFI
# ---------------------------------------------------------------------------

def test_dfi_matches_numpy_reference(spark):
    from index_spark.operators.query import dfi_search

    _, index, stats = _tiny_index(spark)
    out = {r.doc_id: r.score
           for r in dfi_search(index, stats, "data table", k=10,
                               stem=False, camel=False).collect()}
    toks = [t.split() for t in TEXTS]
    t_total = float(sum(len(t) for t in toks))
    assert stats["total_tokens"] == t_total
    for d, tk in enumerate(toks):
        exp, matched = 0.0, False
        for q in ("data", "table"):
            tf = float(tk.count(q))
            if tf == 0:
                continue
            matched = True
            cf = float(sum(t2.count(q) for t2 in toks))
            e = (cf + 1.0) * len(tk) / (t_total + 1.0)
            if tf > e:
                exp += np.log2((tf - e) / np.sqrt(e) + 1.0)
        if matched:
            assert out[d] == pytest.approx(exp, abs=1e-9)
        else:
            assert d not in out


def test_dfi_zero_gate_and_measures(spark):
    from index_spark.operators.query import dfi_search

    # "x" appears once in every doc: tf == expected-ish; craft a case
    # where tf <= expected so the contribution gates to exactly zero
    texts = ["x y", "x x x x x x z"]
    _, index, stats = _tiny_index(spark, texts)
    out = {r.doc_id: r.score
           for r in dfi_search(index, stats, "x", k=10, stem=False,
                               camel=False).collect()}
    # doc0: tf=1, e=(7+1)*2/(9+1)=1.6 -> tf<=e -> 0; doc1: tf=6,
    # e=8*7/10=5.6 -> positive
    assert out[0] == 0.0
    assert out[1] > 0.0
    for m in ("saturated", "chisquared"):
        o2 = {r.doc_id: r.score
              for r in dfi_search(index, stats, "x", measure=m, k=10,
                                  stem=False, camel=False).collect()}
        assert o2[0] == 0.0 and o2[1] > 0.0
    with pytest.raises(ValueError, match="independence measure"):
        dfi_search(index, stats, "x", measure="bogus")
    with pytest.raises(ValueError, match="total_tokens"):
        dfi_search(index, {"n_docs": 2, "avgdl": 3.0}, "x")


# ---------------------------------------------------------------------------
# IB
# ---------------------------------------------------------------------------

def test_ib_ll_matches_numpy_reference(spark):
    from index_spark.operators.query import ib_search

    _, index, stats = _tiny_index(spark)
    out = {r.doc_id: r.score
           for r in ib_search(index, stats, "data table", k=10,
                              stem=False, camel=False).collect()}
    toks = [t.split() for t in TEXTS]
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks) / n
    for d, tk in enumerate(toks):
        exp, matched = 0.0, False
        for q in ("data", "table"):
            tf = float(tk.count(q))
            if tf == 0:
                continue
            matched = True
            df = float(sum(1 for t2 in toks if q in t2))
            lv = (df + 1.0) / (n + 1.0)
            tfn = tf * np.log2(1.0 + avgdl / len(tk))
            exp += np.log((tfn + lv) / lv)
        if matched:
            assert out[d] == pytest.approx(exp, abs=1e-9)
        else:
            assert d not in out


def test_ib_spl_ttf_and_validation(spark):
    from index_spark.operators.query import ib_search

    _, index, stats = _tiny_index(spark)
    spl = {r.doc_id: r.score
           for r in ib_search(index, stats, "data", distribution="spl",
                              k=10, stem=False, camel=False).collect()}
    toks = [t.split() for t in TEXTS]
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks) / n
    df = 3.0
    lv = (df + 1.0) / (n + 1.0)
    tf = 3.0  # doc1
    tfn = tf * np.log2(1.0 + avgdl / 4.0)
    want = -np.log((lv ** (tfn / (tfn + 1.0)) - lv) / (1.0 - lv))
    assert spl[1] == pytest.approx(want, abs=1e-9)
    # ttf lambda: cf("data")=5 >= N=4 -> lambda >= 1 -> SPL degenerates
    # loudly, while LL stays well-defined (ln((tfn+lv)/lv), lv=6/5)
    with pytest.raises(ValueError, match="lambda >= 1"):
        ib_search(index, stats, "data", distribution="spl", lam="ttf",
                  stem=False, camel=False).collect()
    ll_ttf = {r.doc_id: r.score
              for r in ib_search(index, stats, "data", lam="ttf", k=10,
                                 stem=False, camel=False).collect()}
    lv = 6.0 / 5.0
    tfn = 3.0 * np.log2(1.0 + avgdl / 4.0)
    assert ll_ttf[1] == pytest.approx(np.log((tfn + lv) / lv), abs=1e-9)
    with pytest.raises(ValueError, match="distribution"):
        ib_search(index, stats, "data", distribution="zipf")
    with pytest.raises(ValueError, match="lambda"):
        ib_search(index, stats, "data", lam="idf")


# ---------------------------------------------------------------------------
# Axiomatic
# ---------------------------------------------------------------------------

def test_axiomatic_f2exp_matches_numpy_reference(spark):
    from index_spark.operators.query import axiomatic_search

    _, index, stats = _tiny_index(spark)
    out = {r.doc_id: r.score
           for r in axiomatic_search(index, stats, "data table", k=10,
                                     stem=False, camel=False).collect()}
    toks = [t.split() for t in TEXTS]
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks) / n
    for d, tk in enumerate(toks):
        exp, matched = 0.0, False
        for q in ("data", "table"):
            tf = float(tk.count(q))
            if tf == 0:
                continue
            matched = True
            df = float(sum(1 for t2 in toks if q in t2))
            exp += ((n + 1.0) / df) ** 0.35 \
                * tf / (tf + 0.5 + 0.5 * len(tk) / avgdl)
        if matched:
            assert out[d] == pytest.approx(exp, abs=1e-9)
        else:
            assert d not in out


def test_axiomatic_f2log_and_validation(spark):
    from index_spark.operators.query import axiomatic_search

    _, index, stats = _tiny_index(spark)
    out = {r.doc_id: r.score
           for r in axiomatic_search(index, stats, "data",
                                     variant="f2log", k=10, stem=False,
                                     camel=False).collect()}
    n, avgdl = 4.0, 16.0 / 4.0
    want = np.log((n + 1.0) / 3.0) * 3.0 / (3.0 + 0.5 + 0.5 * 4.0 / avgdl)
    assert out[1] == pytest.approx(want, abs=1e-9)
    with pytest.raises(ValueError, match="variant"):
        axiomatic_search(index, stats, "data", variant="f3exp")
    with pytest.raises(ValueError, match="s must be positive"):
        axiomatic_search(index, stats, "data", s=0.0)


# ---------------------------------------------------------------------------
# BBQ
# ---------------------------------------------------------------------------

def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")


def test_bbq_encode_bits_and_corrections(spark):
    from index_spark.operators.similarity import bbq_encode

    rng = np.random.RandomState(7)
    vecs = rng.randn(5, 40)  # > 32 dims -> two words
    rows = {r.vec_id: r for r in
            bbq_encode(_emb_df(spark, vecs)).collect()}
    for i, v in enumerate(vecs):
        v32 = v.astype(np.float32).astype(np.float64)
        r = rows[i]
        assert len(r.words) == 2
        for d in range(40):
            w, j = divmod(d, 32)
            bit = (r.words[w] >> j) & 1
            assert bit == (1 if v32[d] >= 0 else 0)
        assert r.l1 == pytest.approx(np.abs(v32).sum(), rel=1e-12)
        assert r.norm == pytest.approx(np.sqrt((v32 ** 2).sum()),
                                       rel=1e-12)


def test_bbq_topk_recovers_exact_order(spark):
    from index_spark.operators.similarity import bbq_topk, cosine_topk

    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 64)
    emb = _emb_df(spark, vecs)
    q = [float(x) for x in vecs[3]]
    # oversample covering the whole relation -> rescore is exhaustive
    # -> identical to exact cosine top-k
    got = [(r.vec_id, r.cos) for r in
           bbq_topk(emb, q, k=5, oversample=12).collect()]
    want = [(r.vec_id, r.cos) for r in
            cosine_topk(emb, q, k=5).collect()]
    assert got == want
    assert got[0][0] == 3 and got[0][1] == pytest.approx(1.0)
    # tight oversample still finds the (distinctive) self vector
    top1 = bbq_topk(emb, q, k=1, oversample=3).collect()
    assert top1[0].vec_id == 3


def test_bbq_restrict_and_validation(spark):
    from index_spark.operators.similarity import bbq_topk

    rng = np.random.RandomState(13)
    vecs = rng.randn(20, 16)
    emb = _emb_df(spark, vecs)
    allow = spark.createDataFrame([(i,) for i in (2, 5, 9)],
                                  "vec_id long")
    got = bbq_topk(emb, [float(x) for x in vecs[5]], k=3,
                   oversample=10, restrict=allow).collect()
    assert [r.vec_id for r in got][0] == 5
    assert {r.vec_id for r in got} <= {2, 5, 9}
    with pytest.raises(ValueError, match="zero query"):
        bbq_topk(emb, [0.0] * 16)


def test_bbq_guards_dim_k_oversample(spark):
    from index_spark.operators.similarity import bbq_encode, bbq_topk

    rng = np.random.RandomState(19)
    vecs = rng.randn(10, 16)
    emb = _emb_df(spark, vecs)
    q16 = [float(x) for x in vecs[0]]
    # dimension mismatch fails loudly instead of NULL-padded cosines
    with pytest.raises(ValueError, match="dimension"):
        bbq_topk(emb, q16[:8], k=3)
    with pytest.raises(ValueError, match="dimension"):
        bbq_topk(emb, q16 + [1.0], k=3)
    # codes encoded at a different dim are rejected before the scan
    codes64 = bbq_encode(_emb_df(spark, rng.randn(10, 64)))
    with pytest.raises(ValueError, match="different dimension"):
        bbq_topk(emb, q16, k=3, codes=codes64)
    # k / oversample typos raise instead of returning empty
    with pytest.raises(ValueError, match="k must be"):
        bbq_topk(emb, q16, k=0)
    with pytest.raises(ValueError, match="oversample"):
        bbq_topk(emb, q16, k=3, oversample=0)
    with pytest.raises(ValueError, match="empty embedding"):
        bbq_topk(emb.filter("vec_id < 0"), q16, k=3)


def test_bbq_precomputed_codes_path(spark):
    from index_spark.operators.similarity import bbq_encode, bbq_topk

    rng = np.random.RandomState(17)
    vecs = rng.randn(30, 32)
    emb = _emb_df(spark, vecs)
    codes = bbq_encode(emb)
    q = [float(x) for x in vecs[7]]
    a = [(r.vec_id, r.cos) for r in
         bbq_topk(emb, q, k=4, oversample=8).collect()]
    b = [(r.vec_id, r.cos) for r in
         bbq_topk(emb, q, k=4, oversample=8, codes=codes).collect()]
    assert a == b


# ---------------------------------------------------------------------------
# RBP
# ---------------------------------------------------------------------------

def test_rbp_hand_example(spark):
    from index_spark.operators.evaluate import rbp_metric

    res = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3),
         (1, 20, 1), (1, 21, 2)],
        "query_id int, doc_id int, rank int")
    qrels = spark.createDataFrame(
        [(0, 10, 2.0), (0, 12, 1.0), (1, 99, 1.0)],
        "query_id int, doc_id int, rel double")
    out = {r.query_id: r for r in
           rbp_metric(res, qrels, k=10, p=0.5).collect()}
    # q0: ranks 1 and 3 relevant -> 0.5 * (0.5^0 + 0.5^2) = 0.625
    assert out[0].rbp == pytest.approx(0.625)
    assert out[1].rbp == 0.0
    assert out[0].residual == pytest.approx(0.5 ** 10, abs=1e-6)
    with pytest.raises(ValueError, match="persistence"):
        rbp_metric(res, qrels, p=1.0)


# ---------------------------------------------------------------------------
# Zipf
# ---------------------------------------------------------------------------

def test_zipf_recovers_exponent(spark):
    from index_spark.operators.analytics import zipf_law

    # exact Zipf corpus: term t_r repeated floor(1000 / r) times
    words = []
    for r in range(1, 33):
        words += [f"t{r:02d}"] * (1000 // r)
    docs = spark.createDataFrame([(0, " ".join(words))],
                                 "doc_id long, text string")
    row = zipf_law(docs, top_n=32).collect()[0]
    assert row.n_points == 32
    assert row.s_exp == pytest.approx(1.0, abs=0.02)
    assert row.c_coef == pytest.approx(1000.0, rel=0.05)
    with pytest.raises(ValueError, match="top_n"):
        zipf_law(docs, top_n=1)
    with pytest.raises(ValueError, match="skip"):
        zipf_law(docs, skip=-1)


def test_zipf_skip_drops_head(spark):
    from index_spark.operators.analytics import zipf_law

    # head outlier at global rank 1; tail counts keyed off the GLOBAL
    # rank g (skip excludes points from the fit, ranks stay global)
    words = ["the"] * 5000
    for g in range(2, 18):
        words += [f"t{g:02d}"] * (1600 // g)
    docs = spark.createDataFrame([(0, " ".join(words))],
                                 "doc_id long, text string")
    # with the outlier head included the fit degrades; skipping rank 1
    # recovers the tail's s=1
    row = zipf_law(docs, top_n=16, skip=1).collect()[0]
    assert row.n_points == 16
    assert row.s_exp == pytest.approx(1.0, abs=0.03)


# ---------------------------------------------------------------------------
# context suggest
# ---------------------------------------------------------------------------

def test_context_suggest_max_boost_rule(spark):
    from index_spark.operators.query import (completion_catalog,
                                             context_suggest)

    docs = spark.createDataFrame(
        [(0, "en", "merge merger table"), (1, "en", "merge sort"),
         (2, "de", "merge mergen"), (3, "fr", "merci merge")],
        "doc_id long, lang string, text string")
    cat = completion_catalog(docs, "lang")
    # df(en, merge)=2, df(de, merge)=1, df(fr, merge)=1 (excluded)
    out = {r.term: r.score for r in
           context_suggest(cat, "mer", {"en": 1.0, "de": 3.0},
                           size=10).collect()}
    assert out["merge"] == 3.0       # max(2*1.0, 1*3.0), not the sum
    assert out["merger"] == 1.0
    assert out["mergen"] == 3.0
    assert "merci" not in out        # fr not in the query contexts
    ordered = [r.term for r in
               context_suggest(cat, "mer", {"en": 1.0, "de": 3.0},
                               size=2).collect()]
    assert ordered == ["merge", "mergen"]  # score desc, term asc
    with pytest.raises(ValueError, match="contexts"):
        context_suggest(cat, "mer", {})
    with pytest.raises(ValueError, match="prefix"):
        context_suggest(cat, "", {"en": 1.0})
