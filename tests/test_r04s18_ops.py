"""Round-4 session-18 surface: CommonTermsQuery, terms lookup,
function_score (field_value_factor / random_score / weight),
multi_match cross_fields (BlendedTermQuery stats), combined_fields
(merged pseudo-field BM25)."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

K1, B = 1.2, 0.75


# ---------------------------------------------------------------- fixtures

TEXTS = [
    (0, "dup data scan scan table", "alpha beta"),
    (1, "scan table table rows here", "alpha alpha gamma"),
    (2, "dup dup table merge", "beta"),
    (3, "data data data scan", "gamma delta"),
    (4, "unrelated words entirely", "alpha"),
]


@pytest.fixture(scope="module")
def flat_ix(spark):
    from index_spark.operators.build import build_index

    corpus = spark.createDataFrame(
        [("r", f"d{i}", t) for i, t, _ in TEXTS],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=16)
    return docs, index.persist(), stats


@pytest.fixture(scope="module")
def zoned_ix(spark):
    from index_spark.operators.build import build_zoned_index

    corpus = spark.createDataFrame(
        [("r", f"d{i}", t, s) for i, t, s in TEXTS],
        "repo string, path string, content string, src string")
    docs, index, stats = build_zoned_index(
        corpus, [("body", "content"), ("src", "src")],
        stem=False, camel=False, shard_size=16)
    return docs, index.persist(), stats


def _bm25_contrib(tf, df, n, dlen, avgdl):
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    return idf * tf / (tf + K1 * (1.0 - B + B * dlen / avgdl))


def _flat_stats():
    toks = [t.split() for _, t, _ in TEXTS]
    dls = [len(t) for t in toks]
    n, avgdl = len(toks), sum(dls) / len(toks)
    dfs = Counter()
    for t in toks:
        dfs.update(set(t))
    return toks, dls, n, avgdl, dfs


# ----------------------------------------------------------- common_terms

def test_common_terms_rare_selects(flat_ix):
    from index_spark.operators.query import common_terms_search

    _, index, stats = flat_ix
    # dup: df 2/5 = 0.4 <= 0.5 -> rare; scan: df 3/5 = 0.6 -> common
    out = common_terms_search(index, stats, "dup scan",
                              cutoff_frequency=0.5, k=10,
                              stem=False, camel=False).collect()
    got = {r.doc_id: r.score for r in out}
    # only docs containing 'dup' (0, 2) match; doc 1/3 have scan only
    assert set(got) == {0, 2}
    toks, dls, n, avgdl, dfs = _flat_stats()
    for d in (0, 2):
        tf = Counter(toks[d])
        want = _bm25_contrib(tf["dup"], dfs["dup"], n, dls[d], avgdl)
        if tf["scan"]:
            want += _bm25_contrib(tf["scan"], dfs["scan"], n, dls[d],
                                  avgdl)
        assert got[d] == pytest.approx(want)


def test_common_terms_all_common_degrades_to_or(flat_ix):
    from index_spark.operators.query import common_terms_search
    from index_spark.operators.query import search

    _, index, stats = flat_ix
    # cutoff 0 -> every term is common -> plain OR over all terms
    out = common_terms_search(index, stats, "dup scan",
                              cutoff_frequency=0.0, k=10,
                              stem=False, camel=False).collect()
    ref = search(index, None, stats, "dup scan", k=10,
                 stem=False, camel=False).collect()
    assert {r.doc_id: round(r.score, 9) for r in out} == \
           {r.doc_id: round(r.score, 9) for r in ref}


def test_common_terms_unknown_terms_empty(flat_ix):
    from index_spark.operators.query import common_terms_search

    _, index, stats = flat_ix
    assert common_terms_search(index, stats, "zzz qqq",
                               stem=False, camel=False).count() == 0


# ----------------------------------------------------------- terms lookup

def test_terms_lookup_counts_matched_terms(spark, flat_ix):
    from index_spark.operators.query import terms_lookup_search

    _, index, _ = flat_ix
    cw = spark.createDataFrame(
        [(i, t) for i, t, _ in TEXTS], "doc_id long, content string")
    # doc 2 terms by tf: dup(2), merge(1), table(1) -> top 3 =
    # dup, merge, table (tf desc, term asc)
    out = terms_lookup_search(index, cw, 2, top_terms=3, k=10,
                              stem=False, camel=False).collect()
    got = {r.doc_id: r.score for r in out}
    # doc0: dup+table=2; doc1: table=1; doc2: all 3; doc3: none
    assert got == {2: 3.0, 0: 2.0, 1: 1.0}


def test_terms_lookup_missing_doc_empty(spark, flat_ix):
    from index_spark.operators.query import terms_lookup_search

    _, index, _ = flat_ix
    cw = spark.createDataFrame(
        [(i, t) for i, t, _ in TEXTS], "doc_id long, content string")
    assert terms_lookup_search(index, cw, 99, stem=False,
                               camel=False).count() == 0


# ---------------------------------------------------------- function_score

def test_function_score_fvf_and_modes(spark, flat_ix):
    from index_spark.operators.query import function_score_search
    from index_spark.operators.query import search

    _, index, stats = flat_ix
    feats = spark.createDataFrame(
        [(0, 100.0), (1, 400.0), (3, 0.0)],
        "doc_id long, boostf double")
    base = {r.doc_id: r.score
            for r in search(index, None, stats, "data scan", k=10,
                            stem=False, camel=False).collect()}
    out = function_score_search(
        index, stats, "data scan",
        [{"kind": "field_value_factor", "field": "boostf",
          "factor": 1.0, "modifier": "sqrt", "missing": 9.0}],
        features=feats, boost_mode="multiply", score_mode="sum",
        k=10, stem=False, camel=False).collect()
    got = {r.doc_id: r.score for r in out}
    fv = {0: 10.0, 1: 20.0, 3: 0.0}
    for d, s in got.items():
        assert s == pytest.approx(base[d] * fv.get(d, 3.0))


def test_function_score_replace_and_random(flat_ix):
    from index_spark.operators.query import function_score_search

    _, index, stats = flat_ix
    out = function_score_search(
        index, stats, "data scan",
        [{"kind": "random_score", "seed": 3}],
        boost_mode="replace", k=10, stem=False, camel=False).collect()
    for r in out:
        want = ((r.doc_id % 4294967296) * 1103515245 + 3) % 4294967296
        assert r.score == pytest.approx(want / 4294967296.0)


def test_function_score_guards(spark, flat_ix):
    from index_spark.operators.query import function_score_search

    _, index, stats = flat_ix
    with pytest.raises(ValueError, match="features"):
        function_score_search(index, stats, "data",
                              [{"kind": "field_value_factor",
                                "field": "x"}],
                              stem=False, camel=False)
    feats = spark.createDataFrame([(0, 1.0)], "doc_id long, score double")
    with pytest.raises(ValueError, match="score"):
        function_score_search(index, stats, "data",
                              [{"kind": "field_value_factor",
                                "field": "score"}],
                              features=feats, stem=False, camel=False)
    with pytest.raises(ValueError, match="modifier"):
        function_score_search(index, stats, "data",
                              [{"kind": "field_value_factor",
                                "field": "boostf", "modifier": "log2p"}],
                              features=spark.createDataFrame(
                                  [(0, 1.0)], "doc_id long, boostf double"),
                              stem=False, camel=False)


# ------------------------------------------------------------ cross_fields

def _zoned_stats():
    body = [t.split() for _, t, _ in TEXTS]
    src = [s.split() for _, _, s in TEXTS]
    zones = {"body": body, "src": src}
    per = {}
    for z, toks in zones.items():
        dls = [len(t) for t in toks]
        dfs = Counter()
        for t in toks:
            dfs.update(set(t))
        per[z] = (toks, dls, sum(dls) / len(dls), dfs)
    n = len(TEXTS)
    return per, n


def test_cross_fields_brute_force(zoned_ix):
    from index_spark.operators.query import cross_fields_search

    _, index, stats = zoned_ix
    zw = {"body": 1.0, "src": 2.0}
    tb = 0.3
    out = cross_fields_search(index, stats, "table alpha",
                              zw, k=10, tie_breaker=tb,
                              stem=False, camel=False).collect()
    got = {r.doc_id: r.score for r in out}
    per, n = _zoned_stats()
    want = {}
    for d in range(n):
        total = 0.0
        for term in ("alpha", "table"):
            bdf = max(per[z][3].get(term, 0) for z in per)
            if bdf == 0:
                continue
            idf = math.log((n - bdf + 0.5) / (bdf + 0.5) + 1.0)
            contribs = []
            for z in per:
                toks, dls, avgdl, _ = per[z]
                tf = toks[d].count(term)
                if tf:
                    contribs.append(
                        zw[z] * idf * tf
                        / (tf + K1 * (1 - B + B * dls[d] / avgdl)))
            if contribs:
                total += max(contribs) + tb * (sum(contribs)
                                               - max(contribs))
        if total > 0:
            want[d] = total
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d])


# -------------------------------------------------------- combined_fields

def test_combined_fields_brute_force(zoned_ix):
    from index_spark.operators.query import combined_fields_search

    _, index, stats = zoned_ix
    zw = {"body": 1.0, "src": 2.0}
    out = combined_fields_search(index, stats, "table alpha", zw,
                                 k=10, stem=False, camel=False).collect()
    got = {r.doc_id: r.score for r in out}
    per, n = _zoned_stats()
    wdl = [sum(zw[z] * per[z][1][d] for z in per) for d in range(n)]
    avgdl = sum(wdl) / n
    want = {}
    for d in range(n):
        total = 0.0
        for term in ("alpha", "table"):
            df = sum(1 for i in range(n)
                     if any(term in per[z][0][i] for z in per))
            wtf = sum(zw[z] * per[z][0][d].count(term) for z in per)
            if wtf == 0 or df == 0:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            total += idf * wtf / (wtf + K1 * (1 - B + B * wdl[d] / avgdl))
        if total > 0:
            want[d] = total
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d])


def test_combined_fields_single_zone_is_bm25(spark):
    from index_spark.operators.build import build_zoned_index, build_index
    from index_spark.operators.query import (combined_fields_search,
                                             search)

    corpus = spark.createDataFrame(
        [("r", f"d{i}", t) for i, t, _ in TEXTS],
        "repo string, path string, content string")
    _, zidx, zstats = build_zoned_index(corpus, [("body", "content")],
                                        stem=False, camel=False,
                                        shard_size=16)
    _, fidx, fstats = build_index(corpus, stem=False, camel=False,
                                  shard_size=16)
    a = combined_fields_search(zidx, zstats, "data scan", {"body": 1.0},
                               k=10, stem=False, camel=False).collect()
    b = search(fidx, None, fstats, "data scan", k=10,
               stem=False, camel=False).collect()
    assert {r.doc_id: round(r.score, 9) for r in a} == \
           {r.doc_id: round(r.score, 9) for r in b}


# ----------------------------------------------------------------- ERR@k

def test_err_metric_hand_computed(spark):
    from index_spark.operators.evaluate import err_metric

    res = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
        "query_id long, doc_id long, rank long")
    qrels = spark.createDataFrame(
        [(1, 10, 1.0), (1, 12, 2.0), (2, 99, 2.0)],
        "query_id long, doc_id long, rel double")
    out = {r.query_id: r.err
           for r in err_metric(res, qrels, k=10).collect()}
    # g_max = 2 -> R(rel=1) = 1/4, R(rel=2) = 3/4, unjudged R = 0
    r1, r3 = 0.25, 0.75
    want1 = r1 / 1 + 0.0 / 2 + (1 - r1) * (1 - 0.0) * r3 / 3
    assert out[1] == pytest.approx(round(want1, 6))
    assert out[2] == 0.0  # no judged doc retrieved


def test_err_metric_rank_cut_and_pinned_gmax(spark):
    from index_spark.operators.evaluate import err_metric

    res = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, rank long")
    qrels = spark.createDataFrame(
        [(1, 11, 1.0)], "query_id long, doc_id long, rel double")
    # k=1 cuts the only relevant doc away
    out = err_metric(res, qrels, k=1).collect()
    assert out[0].err == 0.0
    # pinned max_grade overrides the data-derived one
    out2 = err_metric(res, qrels, k=10, max_grade=3.0).collect()
    assert out2[0].err == pytest.approx(round((1.0 / 8.0) / 2, 6))


# ------------------------------------------------------------- date_range

def test_date_range_facet_half_open_and_overlap(spark):
    from index_spark.operators.temporal import date_range_facet

    ev = spark.createDataFrame(
        [("2024-01-05 00:00:00", 1.0), ("2024-01-10 00:00:00", 2.0),
         ("2024-01-15 12:00:00", 4.0)],
        "ts string, value double").withColumn("ts", F.to_timestamp("ts"))
    out = {r.range: (r.doc_count, r.sum_value)
           for r in date_range_facet(
               ev, [(None, "2024-01-10"), ("2024-01-10", None),
                    ("2024-01-01", "2024-01-31")],
               value_col="value").collect()}
    # boundary row (Jan 10 midnight) is EXCLUDED from *-2024-01-10 and
    # INCLUDED in 2024-01-10-*; the wide range overlaps everything
    assert out["*-2024-01-10"] == (1, 1.0)
    assert out["2024-01-10-*"] == (2, 6.0)
    assert out["2024-01-01-2024-01-31"] == (3, 7.0)
    with pytest.raises(ValueError, match="ranges"):
        date_range_facet(ev, [])


# ------------------------------------------------------------ multi_terms

def test_multi_terms_facet_order_and_size(spark):
    from index_spark.operators.analytics import multi_terms_facet

    df = spark.createDataFrame(
        [("a", 1, 1.0)] * 3 + [("a", 2, 2.0)] * 3 + [("b", 1, 5.0)],
        "k1 string, k2 int, value double")
    out = multi_terms_facet(df, ["k1", "k2"], size=2,
                            value_col="value").collect()
    # both (a,1) and (a,2) have count 3 -> tie breaks on the key tuple
    assert [(r.k1, r.k2, r.doc_count, r.sum_value) for r in out] == \
           [("a", 1, 3, 3.0), ("a", 2, 3, 6.0)]
    with pytest.raises(ValueError, match="keys"):
        multi_terms_facet(df, [])


# -------------------------------------------------------- linear fusion

def test_comb_fuse_weights(spark):
    from index_spark.operators.hybrid import comb_fuse

    a = spark.createDataFrame([(1, 10.0), (2, 0.0)],
                              "doc_id long, score double")
    b = spark.createDataFrame([(2, 4.0), (3, 2.0), (4, 0.0)],
                              "doc_id long, score double")
    out = {r.doc_id: r.fused
           for r in comb_fuse([a, b], k=10, method="sum",
                              weights=[0.7, 0.3]).collect()}
    # a normalizes to {1: 1.0, 2: 0.0}; b to {2: 1.0, 3: 0.5, 4: 0.0}
    assert out == {1: 0.7, 2: 0.3, 3: 0.15, 4: 0.0}
    with pytest.raises(ValueError, match="weights"):
        comb_fuse([a, b], weights=[1.0])
