"""Session-21b operators: Lucene SmallFloat lossy norms + BM25 parity
kernel, significant_terms chi_square/mutual_information heuristics,
missing aggregation, Rocchio pseudo-relevance feedback."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# SmallFloat codec
# ---------------------------------------------------------------------------

def test_smallfloat_pinned_vectors():
    from index_spark.functions.norms import (byte4_to_int, int_to_byte4,
                                             quantize_norm)

    # 0..40 round-trip exactly: 0..23 are NUM_FREE_VALUES, 24..40 land
    # in the inner codec's exact range (x = i-24 <= 16)
    for i in range(41):
        assert quantize_norm(i) == i
    # first lossy value and floors above 24 + 4 significant bits
    assert quantize_norm(41) == 40
    assert quantize_norm(43) == 42
    assert quantize_norm(63) == 60     # 24 + q4(39) = 24 + 36
    assert quantize_norm(1000) == 984     # Lucene: 24 + int4(976) = 984
    assert quantize_norm(2048) == 1944
    # powers of two are NOT exact above 128 (x = 2^e - 24 needs > 4 bits)
    for e in range(3, 8):
        assert quantize_norm(1 << e) == 1 << e
    assert quantize_norm(256) == 248
    # encode/decode structure
    assert int_to_byte4(8) == 8 and byte4_to_int(8) == 8
    assert int_to_byte4(16) == 16 and byte4_to_int(16) == 16
    assert int_to_byte4(24) == 24 and byte4_to_int(24) == 24
    # byte 255 decodes to Lucene's max bucket: 24 + ((7|8) << 27)
    assert byte4_to_int(255) == 24 + (15 << 27)
    assert int_to_byte4(2**31 - 1) == 255
    with pytest.raises(ValueError):
        int_to_byte4(-1)
    with pytest.raises(ValueError):
        byte4_to_int(256)


def test_smallfloat_monotone_and_vectorized():
    from index_spark.functions.norms import quantize_norm, quantize_norms_np

    xs = np.arange(0, 5000)
    q = quantize_norms_np(xs.astype(np.float64))
    scalar = np.array([quantize_norm(int(i)) for i in xs])
    assert (q == scalar).all()
    assert (np.diff(q) >= 0).all()          # monotone
    assert (q <= xs).all()                  # floors, never rounds up
    with pytest.raises(ValueError):
        quantize_norms_np(np.array([-1.0]))


# ---------------------------------------------------------------------------
# lossy-norm BM25
# ---------------------------------------------------------------------------

def _tiny_index(spark, texts):
    from index_spark.operators.build import build_index

    corpus = spark.createDataFrame(
        [("r", f"doc{i:04d}", t) for i, t in enumerate(texts)],
        "repo string, path string, content string")
    return build_index(corpus, stem=False, camel=False, shard_size=64)


def test_bm25_lossy_equals_exact_below_16_tokens(spark):
    from index_spark.operators.query import bm25_lossy_search, search

    texts = ["data table scan", "data data filter sort",
             "table merge", "data table agg window group"]
    docs, index, stats = _tiny_index(spark, texts)
    a = {r.doc_id: r.score for r in bm25_lossy_search(
        index, stats, "data table", k=10, stem=False,
        camel=False).collect()}
    b = {r.doc_id: r.score for r in search(
        index, docs, stats, "data table", k=10, stem=False,
        camel=False, shard_size=64).collect()}
    assert set(a) == set(b)
    for d in a:
        assert a[d] == pytest.approx(b[d], abs=1e-9)


def test_bm25_lossy_quantizes_long_docs(spark):
    from index_spark.functions.norms import quantize_norm
    from index_spark.operators.query import bm25_lossy_search

    # doc0: 41 tokens (dl quantizes 41 -> 40, the first lossy bucket);
    # doc1: short
    texts = ["data " + "pad " * 40, "data x"]
    _, index, stats = _tiny_index(spark, texts)
    out = {r.doc_id: r.score for r in bm25_lossy_search(
        index, stats, "data", k=10, stem=False, camel=False).collect()}
    n, avgdl = 2.0, (41 + 2) / 2.0
    idf = np.log(1.0 + (n - 2 + 0.5) / (2 + 0.5))
    for d, dl in ((0, 41), (1, 2)):
        dlq = quantize_norm(dl)
        assert dlq == (40 if d == 0 else 2)
        want = idf * 1.0 / (1.0 + 1.2 * (1 - 0.75 + 0.75 * dlq / avgdl))
        assert out[d] == pytest.approx(want, abs=1e-9)


# ---------------------------------------------------------------------------
# significant_terms heuristics
# ---------------------------------------------------------------------------

def _sig_fixture(spark):
    texts = ["apple banana", "apple cherry", "banana cherry",
             "cherry date", "date egg", "egg fig"]
    docs, index, stats = _tiny_index(spark, texts)
    fg = spark.createDataFrame([(0,), (1,)], "doc_id long")
    return index, fg, stats


def test_significant_chi_square_hand_table(spark):
    from index_spark.operators.analytics import significant_terms

    index, fg, stats = _sig_fixture(spark)
    out = {r.term: r for r in significant_terms(
        index, fg, stats["n_docs"], top=20, min_fg_df=2,
        heuristic="chi_square").collect()}
    # 'apple': fg_df=2, df=2, n_fg=2, N=6
    # n11=2 n10=0 n01=0 n00=4 -> chi2 = 6*(2*4)^2 / (2*2*4*4) = 6.0
    assert out["apple"].chi2 == pytest.approx(6.0)
    assert out["apple"].fg_df == 2 and out["apple"].df == 2


def test_significant_nxy_rejects_inconsistent_n_docs(spark):
    from index_spark.operators.analytics import significant_terms
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    index, fg, stats = _sig_fixture(spark)
    # n_docs understating the corpus: cherry (df=3, fg_df=1) with
    # n_docs=2 drives n00 = 2-2-3+1 = -2 — silently scored 0 (chi2) or
    # NaN-logged (MI) before; must fail loudly
    for heuristic in ("chi_square", "mutual_information"):
        with pytest.raises((Py4JJavaError, PySparkException),
                           match="does not cover"):
            significant_terms(index, fg, 2, top=20, min_fg_df=1,
                              heuristic=heuristic).collect()
    # n_fg > n_docs is rejected before any job runs
    with pytest.raises(ValueError, match="superset"):
        significant_terms(index, fg, 1, top=20, min_fg_df=2,
                          heuristic="chi_square")


def test_significant_mutual_information_hand_table(spark):
    from index_spark.operators.analytics import significant_terms

    index, fg, stats = _sig_fixture(spark)
    out = {r.term: r for r in significant_terms(
        index, fg, stats["n_docs"], top=20, min_fg_df=2,
        heuristic="mutual_information").collect()}
    # apple cells: n11=2 n10=0 n01=0 n00=4, margins r1=2 r0=4 c1=2 c0=4
    want = (2 / 6) * np.log2(6 * 2 / (2 * 2)) \
        + (4 / 6) * np.log2(6 * 4 / (4 * 4))
    assert out["apple"].mi == pytest.approx(round(want, 6))
    with pytest.raises(ValueError, match="heuristic"):
        significant_terms(index, fg, stats["n_docs"], heuristic="gnd")


def test_significant_jlh_unchanged(spark):
    from index_spark.operators.analytics import significant_terms

    index, fg, stats = _sig_fixture(spark)
    out = significant_terms(index, fg, stats["n_docs"], top=5,
                            min_fg_df=2)
    assert out.columns == ["term", "fg_df", "df", "jlh"]
    top = out.collect()[0]
    # apple: fg_pct=1, bg_pct=2/6 -> jlh = (1 - 1/3) * 3 = 2.0
    assert top.term == "apple" and top.jlh == pytest.approx(2.0)


# ---------------------------------------------------------------------------
# missing agg
# ---------------------------------------------------------------------------

def test_missing_facet(spark):
    from index_spark.operators.analytics import missing_facet

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 2.0), ("b", None), ("b", None)],
        "grp string, v double")
    out = {r.bucket: r for r in missing_facet(df, "v", by="grp").collect()}
    assert out["a"].missing == 1 and out["a"].value_count == 1
    assert out["b"].missing == 2 and out["b"].value_count == 1
    assert all(r.missing + r.value_count == r.doc_count
               for r in out.values())
    g = missing_facet(df, "v").collect()
    assert len(g) == 1 and g[0].bucket == "_all" and g[0].missing == 3
    with pytest.raises(ValueError, match="unknown field"):
        missing_facet(df, "nope")


# ---------------------------------------------------------------------------
# Rocchio
# ---------------------------------------------------------------------------

def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")


def test_rocchio_matches_manual_q2(spark):
    from index_spark.operators.similarity import (cosine_topk,
                                                  rocchio_topk)

    rng = np.random.RandomState(23)
    vecs = rng.randn(40, 16)
    emb = _emb_df(spark, vecs)
    q = [float(x) for x in vecs[4]]
    got = [(r.vec_id, r.cos) for r in
           rocchio_topk(emb, q, k=6, r=3, nr=2).collect()]
    # manual: rank by round(cos, 6) on float32-at-rest vectors
    v32 = vecs.astype(np.float32).astype(np.float64)
    qd = np.asarray(q)
    cos = v32 @ qd / (np.linalg.norm(v32, axis=1) * np.linalg.norm(qd))
    order = sorted(range(40), key=lambda i: (-round(cos[i], 6), i))
    rel, non = order[:3], order[3:5]
    q2 = 1.0 * qd + 0.75 * v32[rel].mean(axis=0) \
        - 0.15 * v32[non].mean(axis=0)
    want = [(r.vec_id, r.cos) for r in
            cosine_topk(emb, [float(x) for x in q2], k=6).collect()]
    assert got == want


def test_rocchio_pulls_toward_relevant_cluster(spark):
    from index_spark.operators.similarity import rocchio_topk

    # cluster A around +e0, cluster B around +e1; query between, nearer A
    rng = np.random.RandomState(29)
    a = np.eye(8)[0] + 0.05 * rng.randn(10, 8)
    b = np.eye(8)[1] + 0.05 * rng.randn(10, 8)
    emb = _emb_df(spark, np.vstack([a, b]))
    q = [0.8, 0.6, 0, 0, 0, 0, 0, 0]
    out = [r.vec_id for r in
           rocchio_topk(emb, q, k=10, r=5, nr=0, gamma=0.0).collect()]
    assert set(out) == set(range(10))   # all of cluster A after feedback
    with pytest.raises(ValueError, match="r >= 1"):
        rocchio_topk(emb, q, r=0)
    with pytest.raises(ValueError, match="window has"):
        rocchio_topk(_emb_df(spark, a[:2]), [1.0] * 8, r=5)


# ---------------------------------------------------------------------------
# LTR features
# ---------------------------------------------------------------------------

def test_ltr_features_match_search_and_hand_counts(spark):
    from index_spark.operators.ltr import ltr_features
    from index_spark.operators.query import search

    texts = ["data table scan join", "data data data filter",
             "table sort merge", "group agg window data table"]
    docs, index, stats = _tiny_index(spark, texts)
    feats = ltr_features(index, stats, {0: "data table", 1: "merge"},
                         stem=False, camel=False).collect()
    f0 = {r.doc_id: r for r in feats if r.query_id == 0}
    top = {r.doc_id: r.score for r in search(
        index, docs, stats, "data table", k=10, stem=False,
        camel=False, shard_size=64).collect()}
    assert set(f0) == set(top)                  # candidates = matched
    for d, r in f0.items():
        assert r.bm25 == pytest.approx(round(top[d], 4), abs=2e-4)
    # doc0 "data table scan join": tf(data)=1 tf(table)=1
    assert f0[0].sum_tf == 2 and f0[0].n_matched == 2
    assert f0[0].coverage == 1.0 and f0[0].dl == 4
    # doc1 "data data data filter": only 'data'
    assert f0[1].sum_tf == 3 and f0[1].n_matched == 1
    assert f0[1].coverage == 0.5
    n, df_data = 4.0, 3.0
    idf = np.log(1.0 + (n - df_data + 0.5) / (df_data + 0.5))
    assert f0[1].sum_idf == pytest.approx(round(idf, 6))
    assert f0[1].max_idf == pytest.approx(round(idf, 6))
    f1 = {r.doc_id: r for r in feats if r.query_id == 1}
    assert set(f1) == {2} and f1[2].n_matched == 1


def test_ltr_oov_terms_count_in_coverage(spark):
    from index_spark.operators.ltr import ltr_features

    _, index, stats = _tiny_index(spark, ["data table", "filter x"])
    feats = {r.doc_id: r for r in ltr_features(
        index, stats, {7: "data zzzmissing"}, stem=False,
        camel=False).collect()}
    assert feats[0].coverage == 0.5             # 1 of 2 query terms
    assert ltr_features(index, stats, {1: ""}, stem=False,
                        camel=False).count() == 0


# ---------------------------------------------------------------------------
# RBO
# ---------------------------------------------------------------------------

def _run_df(spark, rows):
    return spark.createDataFrame(rows, "query_id int, doc_id int, rank int")


def test_rbo_hand_example_and_bounds(spark):
    from index_spark.operators.evaluate import rbo_metric

    a = _run_df(spark, [(0, 1, 1), (0, 2, 2), (0, 3, 3)])
    b = _run_df(spark, [(0, 2, 1), (0, 1, 2), (0, 3, 3)])
    out = rbo_metric(a, b, k=3, p=0.5).collect()[0]
    # X = [0, 2, 3] -> 0.5*(0 + 0.5*1 + 0.25*1) = 0.375
    assert out.rbo == pytest.approx(0.375)
    assert out.overlap_at_k == pytest.approx(1.0)
    # identical prefixes -> truncated max 1 - p^k
    same = rbo_metric(a, a, k=3, p=0.5).collect()[0]
    assert same.rbo == pytest.approx(1 - 0.5 ** 3)
    # disjoint -> 0; query present in only one run still scores
    c = _run_df(spark, [(0, 9, 1), (0, 8, 2), (0, 7, 3), (1, 5, 1)])
    dis = {r.query_id: r for r in rbo_metric(a, c, k=3, p=0.5).collect()}
    assert dis[0].rbo == 0.0 and dis[1].rbo == 0.0
    assert dis[0].overlap_at_k == 0.0
    with pytest.raises(ValueError, match="persistence"):
        rbo_metric(a, b, p=0.0)
    with pytest.raises(ValueError, match="k must"):
        rbo_metric(a, b, k=0)


# ---------------------------------------------------------------------------
# team-draft interleaving
# ---------------------------------------------------------------------------

def test_team_draft_disjoint_alternates_by_coin(spark):
    from index_spark.operators.evaluate import (_tdi_coin,
                                                team_draft_interleave)

    a = _run_df(spark, [(0, 10, 1), (0, 11, 2), (0, 12, 3)])
    b = _run_df(spark, [(0, 20, 1), (0, 21, 2), (0, 22, 3)])
    out = team_draft_interleave(a, b, k=6, seed=0).collect()
    assert [r.pos for r in out] == [1, 2, 3, 4, 5, 6]
    # disjoint runs: round r contributes (first, second) by the coin
    expect = []
    pa, pb = [10, 11, 12], [20, 21, 22]
    ia = ib = 0
    for rnd in range(3):
        order = ("a", "b") if _tdi_coin(0, rnd, 0) else ("b", "a")
        for t in order:
            if t == "a":
                expect.append((pa[ia], "a")); ia += 1
            else:
                expect.append((pb[ib], "b")); ib += 1
    assert [(r.doc_id, r.team) for r in out] == expect
    # teams contribute equally on disjoint runs
    assert sum(1 for r in out if r.team == "a") == 3
    # the coin actually varies: across rounds of a draft AND with seed
    coins = [_tdi_coin(0, rnd, 0) for rnd in range(20)]
    assert len(set(coins)) == 2
    assert any(_tdi_coin(q, 0, 0) != _tdi_coin(q, 0, 1)
               for q in range(8))


def test_team_draft_skips_duplicates_and_exhausts(spark):
    from index_spark.operators.evaluate import team_draft_interleave

    # identical rankings: every doc appears ONCE, teams still alternate
    a = _run_df(spark, [(0, 1, 1), (0, 2, 2), (0, 3, 3)])
    out = team_draft_interleave(a, a, k=10, seed=0).collect()
    assert [r.doc_id for r in out] == [1, 2, 3]      # no dup, stops
    assert len({r.doc_id for r in out}) == 3
    # k caps the list
    b = _run_df(spark, [(0, 9, 1), (0, 8, 2), (0, 7, 3)])
    capped = team_draft_interleave(a, b, k=2, seed=0).collect()
    assert len(capped) == 2
    import pytest as _pt
    with _pt.raises(ValueError, match="k must"):
        team_draft_interleave(a, b, k=0)


def test_team_draft_credit(spark):
    from index_spark.operators.evaluate import (team_draft_credit,
                                                team_draft_interleave)

    a = _run_df(spark, [(0, 10, 1), (0, 11, 2), (1, 30, 1)])
    b = _run_df(spark, [(0, 20, 1), (0, 21, 2), (1, 40, 1)])
    il = team_draft_interleave(a, b, k=4, seed=0)
    clicks = spark.createDataFrame([(0, 10), (0, 11), (0, 20)],
                                   "query_id int, doc_id int")
    out = {r.query_id: r for r in team_draft_credit(il, clicks).collect()}
    assert out[0].clicks_a == 2 and out[0].clicks_b == 1
    assert out[0].winner == "a"
    assert out[1].clicks_a == 0 and out[1].winner == "tie"


# ---------------------------------------------------------------------------
# champion lists
# ---------------------------------------------------------------------------

def test_champion_build_prunes_per_term(spark):
    from index_spark.operators.query import build_champion_lists

    texts = ["data data data x", "data data y", "data z", "w data"]
    _, index, stats = _tiny_index(spark, texts)
    ch = build_champion_lists(index, n=2)
    rows = sorted(
        [(r.term, r.doc_id, r.tf, r.df, r.dl)
         for r in ch.filter("term = 'data'").collect()])
    # df(data)=4 but only top-2 postings survive: doc0 tf=3, doc1 tf=2
    assert rows == [("data", 0, 3, 4, 4), ("data", 1, 2, 4, 3)]
    # singleton terms keep their single posting
    assert ch.filter("term = 'z'").count() == 1
    import pytest as _pt
    with _pt.raises(ValueError, match="n must"):
        build_champion_lists(index, n=0)


def test_champion_search_matches_full_bm25_when_unpruned(spark):
    from index_spark.operators.query import (build_champion_lists,
                                             search, search_champions)

    texts = ["data table scan", "data data filter", "table merge",
             "agg data table window"]
    docs, index, stats = _tiny_index(spark, texts)
    ch = build_champion_lists(index, n=64)     # no pruning
    a = {r.doc_id: r.score for r in search_champions(
        ch, stats, "data table", k=10, stem=False,
        camel=False).collect()}
    b = {r.doc_id: r.score for r in search(
        index, docs, stats, "data table", k=10, stem=False,
        camel=False, shard_size=64).collect()}
    assert set(a) == set(b)
    for d in a:
        # champion scores are reported at 4dp (pinned cut)
        assert a[d] == pytest.approx(b[d], abs=5e-5)


def test_champion_search_drops_pruned_postings(spark):
    from index_spark.operators.query import (build_champion_lists,
                                             search_champions)

    # 'data' tf: doc0=3, doc1=2, doc2=1 -> n=2 prunes doc2's posting
    texts = ["data data data", "data data x", "data y"]
    _, index, stats = _tiny_index(spark, texts)
    ch = build_champion_lists(index, n=2)
    out = {r.doc_id: r.score for r in search_champions(
        ch, stats, "data", k=10, stem=False, camel=False).collect()}
    assert set(out) == {0, 1}          # doc2 pruned entirely for 'data'
    assert search_champions(ch, stats, "", stem=False,
                            camel=False).count() == 0


# ---------------------------------------------------------------------------
# Good-Turing
# ---------------------------------------------------------------------------

def test_good_turing_hand_classes(spark):
    from index_spark.operators.analytics import good_turing

    # cf: a,b,c = 1 (n_1=3); d = 2 (n_2=1); e = 3 (n_3=1); N = 8
    docs = spark.createDataFrame(
        [(0, "a b c d d e e e")], "doc_id long, text string")
    out = {r.r: r for r in good_turing(docs, max_r=16).collect()}
    assert out[1].n_r == 3 and out[2].n_r == 1 and out[3].n_r == 1
    assert out[1].r_star == pytest.approx(round(2 * 1 / 3, 6))
    assert out[2].r_star == pytest.approx(3.0)
    assert out[3].r_star is None                  # no n_4 class
    assert out[1].mass_frac == pytest.approx(0.375)
    assert out[3].mass_frac == pytest.approx(0.375)
    # boundary: r = max_r still sees the real n_{r+1}
    b = {r.r: r for r in good_turing(docs, max_r=2).collect()}
    assert set(b) == {1, 2}
    assert b[2].r_star == pytest.approx(3.0)
    import pytest as _pt
    with _pt.raises(ValueError, match="max_r"):
        good_turing(docs, max_r=0)
    empty = spark.createDataFrame([(0, "")], "doc_id long, text string")
    with _pt.raises(ValueError, match="empty corpus"):
        good_turing(empty)
