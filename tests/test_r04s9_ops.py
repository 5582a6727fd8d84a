"""Round-4 session-9 surfaces: LM-Dirichlet query-likelihood ranking
and deterministic fractional-epoch upsampling — each pinned against a
hand-computed python reference."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from index_spark.functions.text import tokenize
from index_spark.operators.build import build_index
from index_spark.operators.query import lm_dirichlet_search
from index_spark.operators.sample import upsample_corpus


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    corpus = spark.createDataFrame(tiny_corpus)
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=32)
    return tiny_corpus, docs.persist(), index.persist(), stats


QUERY = "import return def"
MU = 500.0


def _lmd_oracle(tiny_corpus, query, mu):
    """Per-doc LM-Dirichlet scores straight off the corpus text."""
    qterms = sorted(set(tokenize(query, stem=False, camel=False)))
    toks = [tokenize(r.content, stem=False, camel=False)
            for r in tiny_corpus.itertuples(index=False)]
    c_total = sum(len(t) for t in toks)
    cf = {q: sum(t.count(q) for t in toks) for q in qterms}
    scores = {}
    for d, t in enumerate(toks):
        s, matched = 0.0, False
        for q in qterms:  # ascending-term order, like the kernel
            tf = t.count(q)
            if tf == 0 or cf[q] == 0:
                continue
            matched = True
            p = cf[q] / c_total
            s += math.log1p(tf / (mu * p)) + math.log(mu / (len(t) + mu))
        if matched:
            scores[d] = s
    return scores


# ------------------------------------------------------- LM-Dirichlet

def test_lmd_matches_hand_oracle(built):
    tiny_corpus, _, index, stats = built
    want = _lmd_oracle(tiny_corpus, QUERY, MU)
    got = {r.doc_id: r.score for r in
           lm_dirichlet_search(index, stats, QUERY, mu=MU, k=10_000,
                               stem=False, camel=False).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9), d


def test_lmd_topk_ranking_and_ties(built):
    tiny_corpus, _, index, stats = built
    want = _lmd_oracle(tiny_corpus, QUERY, MU)
    order = sorted(want, key=lambda d: (-want[d], d))[:10]
    got = [r.doc_id for r in
           lm_dirichlet_search(index, stats, QUERY, mu=MU, k=10,
                               stem=False, camel=False).collect()]
    assert got == order


def test_lmd_matched_terms_only_and_edges(spark, built):
    tiny_corpus, _, index, stats = built
    # docs matching no query term never score: probe with a term that
    # provably does NOT occur in every document
    present = [set(tokenize(r.content, stem=False, camel=False))
               for r in tiny_corpus.itertuples(index=False)]
    term = next(t for t in sorted(present[0])
                if sum(t in s for s in present) < len(present))
    want = _lmd_oracle(tiny_corpus, term, MU)
    got = lm_dirichlet_search(index, stats, term, mu=MU, k=10_000,
                              stem=False, camel=False).count()
    assert got == len(want) < len(tiny_corpus)
    # absent term / empty query -> empty
    assert lm_dirichlet_search(index, stats, "zzz_absent", mu=MU,
                               stem=False, camel=False).count() == 0
    assert lm_dirichlet_search(index, stats, "", mu=MU,
                               stem=False, camel=False).count() == 0
    with pytest.raises(ValueError, match="mu"):
        lm_dirichlet_search(index, stats, "import", mu=0.0)
    with pytest.raises(ValueError, match="total_tokens"):
        lm_dirichlet_search(index, {"n_docs": 1, "avgdl": 1.0}, "import")


def test_lmd_rank_shifts_with_mu(built):
    # mu is a real knob: tiny mu weights tf heavily, huge mu washes it
    # out toward collection frequencies — score SETS must differ
    tiny_corpus, _, index, stats = built
    lo = {r.doc_id: r.score for r in
          lm_dirichlet_search(index, stats, QUERY, mu=10.0, k=10_000,
                              stem=False, camel=False).collect()}
    hi = {r.doc_id: r.score for r in
          lm_dirichlet_search(index, stats, QUERY, mu=1e6, k=10_000,
                              stem=False, camel=False).collect()}
    assert set(lo) == set(hi)  # same match set
    assert any(abs(lo[d] - hi[d]) > 1e-6 for d in lo)


# ------------------------------------------------------- upsampling

def _u_hex(key, salt):
    return hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8]


def _want_copies(ids, rate, salt="epoch"):
    base = math.floor(rate)
    thr = format(min(int((rate - base) * 2**32), 2**32 - 1), "08x")
    out = {}
    for i in ids:
        n = base + (1 if (rate - base) > 0 and _u_hex(i, salt) < thr else 0)
        out[i] = n
    return out


def test_upsample_matches_hand_draw(spark):
    rows = [(i, "a" if i % 2 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = upsample_corpus(df, {"a": 2.5, "b": 0.4}, strata_col="src",
                          key_col="doc_id").collect()
    got = {}
    for r in out:
        got[r.doc_id] = got.get(r.doc_id, 0) + 1
        assert 0 <= r.copy < got[r.doc_id] + 2
    want_a = _want_copies([i for i in range(400) if i % 2], 2.5)
    want_b = _want_copies([i for i in range(400) if not i % 2], 0.4)
    for i in range(400):
        want = (want_a if i % 2 else want_b)[i]
        assert got.get(i, 0) == want, i
    # copy ordinals tile 0..n-1
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.copy)
    for i, cs in by_doc.items():
        assert sorted(cs) == list(range(len(cs))), i


def test_upsample_integral_and_default_rates(spark):
    df = spark.createDataFrame([(i, "x") for i in range(50)],
                               "doc_id long, src string")
    # rate exactly 1.0 -> exactly one copy 0 per row, schema + copy col
    out = upsample_corpus(df, {}, strata_col="src", key_col="doc_id",
                          default_rate=1.0)
    assert out.columns == ["doc_id", "src", "copy"]
    rows = out.collect()
    assert len(rows) == 50 and all(r.copy == 0 for r in rows)
    # rate exactly 3.0 -> exactly three copies per row, no draw
    n3 = upsample_corpus(df, {"x": 3.0}, strata_col="src",
                         key_col="doc_id").count()
    assert n3 == 150
    # rate 0 drops the stratum
    assert upsample_corpus(df, {"x": 0.0}, strata_col="src",
                           key_col="doc_id").count() == 0
    with pytest.raises(ValueError, match="non-negative"):
        upsample_corpus(df, {"x": -1.0}, strata_col="src")


def test_upsample_extra_copies_monotone_in_rate(spark):
    # raising a stratum's fractional part only ADDS extra copies (the
    # draw is rate-independent) — iterative mixture tuning keeps
    # supersets, same contract as sample_stratified
    df = spark.createDataFrame([(i, "x") for i in range(300)],
                               "doc_id long, src string")
    lo = {(r.doc_id, r.copy) for r in
          upsample_corpus(df, {"x": 1.3}, strata_col="src").collect()}
    hi = {(r.doc_id, r.copy) for r in
          upsample_corpus(df, {"x": 1.7}, strata_col="src").collect()}
    assert lo < hi


def test_upsample_plan_is_map_only(spark):
    df = spark.createDataFrame([(i, "x") for i in range(10)],
                               "doc_id long, src string")
    plan = upsample_corpus(df, {"x": 2.5}, strata_col="src") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------- global shuffle

def test_shuffle_order_is_the_md5_permutation(spark):
    from index_spark.operators.sample import shuffle_order

    ids = list(range(700))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.ord for r in
           shuffle_order(df, key_col="doc_id", salt="e1").collect()}
    want_order = sorted(ids, key=lambda i: (_u_hex(i, "e1"), i))
    assert got == {d: o for o, d in enumerate(want_order)}
    # ordinals are a permutation of 0..n-1
    assert sorted(got.values()) == list(range(700))


def test_shuffle_order_partitioning_invariant_and_salted(spark):
    from index_spark.operators.sample import shuffle_order

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    a = {r.doc_id: r.ord for r in
         shuffle_order(df, salt="e1").collect()}
    b = {r.doc_id: r.ord for r in
         shuffle_order(df.repartition(13), salt="e1").collect()}
    assert a == b  # layout-independent
    c = {r.doc_id: r.ord for r in
         shuffle_order(df, salt="e2").collect()}
    assert a != c  # a different epoch is a different permutation
    assert sorted(c.values()) == list(range(300))
    with pytest.raises(ValueError, match="group_nibbles"):
        shuffle_order(df, group_nibbles=0)


def test_shuffle_order_no_global_window_over_rows(spark):
    # the only unpartitioned window must run over the GROUP relation
    # (bounded by 16^g rows), never over the full corpus: every Window
    # whose ordering mentions the draw column must be partitioned
    from index_spark.operators.sample import shuffle_order

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    plan = shuffle_order(df)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "_u" in line and "row_number" in line:
            assert "partitionBy" in line.replace(" ", "") or \
                   "PartitionSpec" in line or "_g" in line


def test_engine_lmd_parity_with_oneshot(spark, built):
    # the serving-path method returns the one-shot path's exact result
    from index_spark.operators.query import QueryEngine

    tiny_corpus, _, index, stats = built
    eng = QueryEngine(index, stats, stem=False, camel=False,
                      shard_size=32).prepare()
    try:
        got = [(r.doc_id, r.score) for r in
               eng.lmd_topk_df(QUERY, k=10, mu=MU).collect()]
        want = [(r.doc_id, r.score) for r in
                lm_dirichlet_search(index, stats, QUERY, mu=MU, k=10,
                                    stem=False, camel=False).collect()]
        assert got == want
    finally:
        eng.release()


def test_upsample_and_shuffle_out_col_guards(spark):
    from index_spark.operators.sample import shuffle_order

    df = spark.createDataFrame([(1, "x", 9)],
                               "doc_id long, src string, copy long")
    with pytest.raises(ValueError, match="already exists"):
        upsample_corpus(df, {"x": 2.0}, strata_col="src")
    renamed = upsample_corpus(df, {"x": 2.0}, strata_col="src",
                              out_col="rep")
    assert renamed.columns == ["doc_id", "src", "copy", "rep"]
    assert renamed.count() == 2
    df2 = spark.createDataFrame([(1, 0)], "doc_id long, ord long")
    with pytest.raises(ValueError, match="already exists"):
        shuffle_order(df2)
    assert "ord2" in shuffle_order(df2, out_col="ord2").columns


def test_engine_lmd_cf_cache(spark, built):
    # the cf LRU means repeated queries run no stats job and stay exact
    from index_spark.operators.query import QueryEngine

    tiny_corpus, _, index, stats = built
    eng = QueryEngine(index, stats, stem=False, camel=False,
                      shard_size=32)
    want = [(r.doc_id, r.score) for r in
            lm_dirichlet_search(index, stats, QUERY, mu=MU, k=10,
                                stem=False, camel=False).collect()]
    first = [(r.doc_id, r.score) for r in
             eng.lmd_topk_df(QUERY, k=10, mu=MU).collect()]
    assert first == want
    cached = dict(eng._cf_cache)
    again = [(r.doc_id, r.score) for r in
             eng.lmd_topk_df(QUERY, k=10, mu=MU).collect()]
    assert again == want and dict(eng._cf_cache) == cached
    # absent terms cache as 0 and still return empty
    assert eng.lmd_topk_df("zzzabsent", k=5, mu=MU).count() == 0
    assert eng._cf_cache["zzzabsent"] == 0
