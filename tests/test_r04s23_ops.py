"""Session-23 operators: label propagation, ES moving_fn models,
Lucene DrillSideways faceting."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------

def _lp(spark, pairs, n_nodes, iters=4):
    from index_spark.operators.graph import label_propagation

    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    p = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {r.node: r.label
            for r in label_propagation(nodes, p, iters=iters).collect()}


def test_lp_two_triangles_stay_apart(spark):
    # two triangles bridged by one edge: a component merge the LP
    # majority vote must NOT make (the connected_components contrast)
    out = _lp(spark, [(0, 1), (1, 2), (0, 2),
                      (3, 4), (4, 5), (3, 5), (2, 3)], 6)
    assert out[0] == out[1] == out[2]
    assert out[3] == out[4] == out[5]
    assert out[0] != out[3]


def test_lp_synchronous_hand_trace(spark):
    # path 0-1-2, one iteration, synchronous from label=id:
    #   node0 nbrs {1} -> 1 ; node1 nbrs {0,2} tie -> min 0
    #   node2 nbrs {1} -> 1 ; node3 isolated keeps 3
    out = _lp(spark, [(0, 1), (1, 2)], 4, iters=1)
    assert out == {0: 1, 1: 0, 2: 1, 3: 3}


def test_lp_tie_breaks_to_smallest_label(spark):
    # node 2's neighbors carry labels {0, 1} with equal counts -> 0
    out = _lp(spark, [(0, 2), (1, 2)], 3, iters=1)
    assert out[2] == 0


def test_lp_validation_and_plan(spark):
    from index_spark.operators.graph import label_propagation

    nodes = spark.range(3).select(F.col("id").alias("node"))
    pairs = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="iters"):
        label_propagation(nodes, pairs, iters=0)
    spairs = spark.createDataFrame([("a", "b")],
                                   "doc_a string, doc_b string")
    with pytest.raises(TypeError, match="integral"):
        label_propagation(nodes, spairs)
    # the argmax is an aggregate, not a per-node window
    plan = label_propagation(nodes, pairs, iters=1) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# moving_fn
# ---------------------------------------------------------------------------

def _series(spark):
    rows = [("a", i, float(v))
            for i, v in enumerate([3, 1, 4, 1, 5, 9, 2, 6])] + \
           [("b", i, float(v)) for i, v in enumerate([2, 7, 1, 8])]
    return spark.createDataFrame(rows,
                                 "k string, bucket int, sum_value double")


def test_moving_fn_ewma_hand_values(spark):
    from index_spark.operators.temporal import moving_fn

    out = {(r.k, r.bucket): r.ewma for r in moving_fn(
        _series(spark), window=3, fn="ewma", alpha=0.3,
        by=["k"]).collect()}
    # shift=0 excludes the current bucket: first frame is empty
    assert out[("a", 0)] is None
    assert out[("a", 1)] == 3.0           # seeded with the only value
    assert out[("a", 2)] == 2.4           # 1*.3 + 3*.7
    assert out[("a", 3)] == 2.88          # 4*.3 + 2.4*.7
    assert out[("b", 1)] == 2.0


def test_moving_fn_linear_hand_values(spark):
    from index_spark.operators.temporal import moving_fn

    out = {(r.k, r.bucket): r.linear for r in moving_fn(
        _series(spark), window=3, fn="linear", by=["k"]).collect()}
    assert out[("a", 0)] is None
    assert out[("a", 2)] == pytest.approx(round((3 * 1 + 1 * 2) / 3, 6))
    assert out[("a", 4)] == pytest.approx((1 * 1 + 4 * 2 + 1 * 3) / 6)


def test_moving_fn_shift_includes_current(spark):
    from index_spark.operators.temporal import moving_fn

    out = {(r.k, r.bucket): r.sum for r in moving_fn(
        _series(spark), window=2, fn="sum", shift=1,
        by=["k"]).collect()}
    # shift=1 frame = [current-1, current]
    assert out[("a", 0)] == 3.0
    assert out[("a", 1)] == 4.0
    assert out[("a", 2)] == 5.0


def test_moving_fn_simple_fns_and_stddev(spark):
    from index_spark.operators.temporal import moving_fn

    out = {(r.k, r.bucket): (r.min, r2.max, r3.stddev)
           for r, r2, r3 in zip(
        moving_fn(_series(spark), window=3, fn="min",
                  by=["k"]).collect(),
        moving_fn(_series(spark), window=3, fn="max",
                  by=["k"]).collect(),
        moving_fn(_series(spark), window=3, fn="stddev",
                  by=["k"]).collect())}
    assert out[("a", 3)] == (1.0, 4.0,
                             pytest.approx(1.247219, abs=1e-6))
    assert out[("a", 0)] == (None, None, None)


def test_moving_fn_holt_matches_python_reference(spark):
    from index_spark.operators.temporal import moving_fn

    def holt(vals, a, b):
        if not vals:
            return None
        if len(vals) == 1:
            return round(vals[0], 6)
        s, bb = vals[1], vals[1] - vals[0]
        for x in vals[2:]:
            s2 = a * x + (1 - a) * (s + bb)
            bb = b * (s2 - s) + (1 - b) * bb
            s = s2
        return round(s, 6)

    out = {(r.k, r.bucket): r.holt for r in moving_fn(
        _series(spark), window=4, fn="holt", alpha=0.3, beta=0.2,
        by=["k"]).collect()}
    a_vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    for i in range(8):
        frame = a_vals[max(0, i - 4):i]
        assert out[("a", i)] == holt(frame, 0.3, 0.2), (i, frame)


def test_moving_fn_validation(spark):
    from index_spark.operators.temporal import moving_fn

    s = _series(spark)
    with pytest.raises(ValueError, match="window"):
        moving_fn(s, window=0)
    with pytest.raises(ValueError, match="shift"):
        moving_fn(s, window=3, shift=4)
    with pytest.raises(ValueError, match="alpha"):
        moving_fn(s, window=3, fn="ewma", alpha=0.0)
    with pytest.raises(ValueError, match="beta"):
        moving_fn(s, window=3, fn="holt", beta=1.5)
    with pytest.raises(ValueError, match="unknown fn"):
        moving_fn(s, window=3, fn="holt_winters_seasonal")


# ---------------------------------------------------------------------------
# drill_sideways
# ---------------------------------------------------------------------------

def _dims(spark):
    return spark.createDataFrame(
        [("en", "w"), ("en", "w"), ("en", "x"), ("de", "w"),
         ("de", "x"), ("fr", "w"), (None, "w")],
        "lang string, source string")


def test_drill_sideways_hand_counts(spark):
    from index_spark.operators.analytics import drill_sideways

    out = {(r.dim, r.value): r.n_docs for r in drill_sideways(
        _dims(spark), {"lang": "en", "source": "w"}).collect()}
    # lang counts under source=w only (own filter removed, NULL skipped)
    assert out[("lang", "en")] == 2
    assert out[("lang", "de")] == 1
    assert out[("lang", "fr")] == 1
    assert ("lang", None) not in out
    # source counts under lang=en only
    assert out[("source", "w")] == 2
    assert out[("source", "x")] == 1
    assert len(out) == 5


def test_drill_sideways_top_and_facet_cols(spark):
    from index_spark.operators.analytics import drill_sideways

    df = _dims(spark).withColumn(
        "tier", F.when(F.col("source") == "w", "hot").otherwise("cold"))
    rows = drill_sideways(df, {"lang": "en", "source": "w"},
                          facet_cols=["tier"], top=1).collect()
    by_dim = {r.dim: (r.value, r.n_docs) for r in rows}
    # top=1 per dim; lang ties (de=1, fr=1) below en=2
    assert by_dim["lang"] == ("en", 2)
    assert by_dim["source"] == ("w", 2)
    # unconstrained dim counts under ALL filters (lang=en AND source=w)
    assert by_dim["tier"] == ("hot", 2)
    assert len(rows) == 3


def test_drill_sideways_validation(spark):
    from index_spark.operators.analytics import drill_sideways

    with pytest.raises(ValueError, match="at least one"):
        drill_sideways(_dims(spark), {})
    with pytest.raises(ValueError, match="top"):
        drill_sideways(_dims(spark), {"lang": "en"}, top=0)


# ---------------------------------------------------------------------------
# cross-relation jaccard + fuzzy decontamination
# ---------------------------------------------------------------------------

def _tb(spark):
    train = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "completely different content entirely here now"),
         (2, "the quick brown fox leaps over the lazy dog"),
         (3, None)],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today"),
         (101, "unrelated benchmark question about chemistry"),
         # exact duplicate of bench 100's overlap region under a
         # SMALLER id: argmax ties break to the smallest bench id
         (99, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string")
    return train, bench


def test_cross_jaccard_modes_agree(spark):
    from index_spark.operators.dedup import cross_jaccard_pairs

    train, bench = _tb(spark)
    got = {}
    for m in ("naive", "prefix"):
        got[m] = sorted((r.left_id, r.right_id, r.jaccard) for r in
                        cross_jaccard_pairs(train, bench, n=3,
                                            threshold=0.3,
                                            mode=m).collect())
    assert got["naive"] == got["prefix"]
    assert (0, 99, 0.875) in got["naive"] and (0, 100, 0.875) in got["naive"]
    assert (2, 100, 0.3636) in got["naive"]
    # sub-threshold and NULL-text pairs never appear
    assert all(lid != 1 and lid != 3 for lid, _, _ in got["naive"])
    with pytest.raises(ValueError, match="threshold"):
        cross_jaccard_pairs(train, bench, threshold=0.0)


def test_cross_jaccard_same_ids_are_distinct_relations(spark):
    from index_spark.operators.dedup import cross_jaccard_pairs

    a = spark.createDataFrame([(5, "alpha beta gamma delta epsilon")],
                              "doc_id long, text string")
    b = spark.createDataFrame([(5, "alpha beta gamma delta epsilon")],
                              "doc_id long, text string")
    got = cross_jaccard_pairs(a, b, n=3, threshold=0.5).collect()
    # (5, 5) is a legitimate cross pair — no self-pair suppression
    assert [(r.left_id, r.right_id, r.jaccard) for r in got] == \
        [(5, 5, 1.0)]


def test_fuzzy_decontaminate_verdicts_and_tiebreak(spark):
    from index_spark.operators.contamination import fuzzy_decontaminate

    train, bench = _tb(spark)
    out = {r.doc_id: (r.bench_id, r.jaccard, r.contaminated)
           for r in fuzzy_decontaminate(train, bench, n=3,
                                        threshold=0.3).collect()}
    # doc 0 ties between bench 99 and 100 at J=0.875 -> smallest wins
    assert out[0] == (99, 0.875, True)
    # bench 99 duplicates bench 100, so doc 2 ties too -> 99 again
    assert out[2] == (99, 0.3636, True)
    # clean and NULL-text docs keep a row with a False verdict
    assert out[1] == (None, None, False)
    assert out[3] == (None, None, False)
    assert len(out) == 4


# ---------------------------------------------------------------------------
# word-break suggester
# ---------------------------------------------------------------------------

def _wb_index(spark):
    from index_spark.operators.build import build_index

    corpus = spark.createDataFrame(
        [("r", f"d{i}", "data table row scan sort key window stream "
          + ("sort key " if i < 3 else ""))
         for i in range(4)], "repo string, path string, content string")
    return build_index(corpus, stem=False, camel=False, shard_size=64)


def test_word_breaks_split_and_combine(spark):
    from index_spark.operators.query import suggest_word_breaks

    _, index, _ = _wb_index(spark)
    out = {(r.qterm, r.kind): (r.suggestion, r.score)
           for r in suggest_word_breaks(
               index, "datatable sortkey win dow xqzj",
               stem=False, camel=False).collect()}
    assert out[("datatable", "split")][0] == "data table"
    assert out[("sortkey", "split")][0] == "sort key"
    assert out[("win dow", "combine")] == ("window", 4)
    # unknown with no valid split yields nothing
    assert not any(q == "xqzj" for q, _ in out)
    # known tokens produce no split rows
    assert not any(q == "window" for q, _ in out)


def test_word_breaks_ranking_and_guards(spark):
    from index_spark.operators.query import suggest_word_breaks

    _, index, _ = _wb_index(spark)
    # 'sortkey': only one valid split; with min_part_len=1 more split
    # points probe but halves like 's'+'ortkey' are not dictionary
    # terms, so the ranking stays deterministic
    rows = suggest_word_breaks(index, "sortkey", min_part_len=1,
                               stem=False, camel=False).collect()
    assert [r.suggestion for r in rows] == ["sort key"]
    with pytest.raises(ValueError, match="min_part_len"):
        suggest_word_breaks(index, "x", min_part_len=0)
    with pytest.raises(ValueError, match="top"):
        suggest_word_breaks(index, "x", top=0)
    assert suggest_word_breaks(index, "  ", stem=False,
                               camel=False).count() == 0


def test_word_breaks_dictionary_path_identity(spark):
    from index_spark.operators.query import suggest_word_breaks
    from index_spark.plans.dictionary import dictionary_from_index

    _, index, _ = _wb_index(spark)
    d = dictionary_from_index(index)
    a = sorted(map(tuple, suggest_word_breaks(
        index, "datatable win dow", stem=False,
        camel=False).collect()))
    b = sorted(map(tuple, suggest_word_breaks(
        None, "datatable win dow", stem=False, camel=False,
        dictionary=d).collect()))
    assert a == b and a


# ---------------------------------------------------------------------------
# session-23 review-pass regressions
# ---------------------------------------------------------------------------

def test_lp_duplicate_node_ids_are_normalized(spark):
    from index_spark.operators.graph import label_propagation

    pairs = spark.createDataFrame([(0, 2), (1, 2)],
                                  "doc_a long, doc_b long")
    nodes = spark.createDataFrame([(0,), (1,), (2,), (1,)], "node long")
    out = label_propagation(nodes, pairs, iters=1).collect()
    # one row per node; node 1's duplicate must not double its vote
    assert len(out) == 3
    got = {r.node: r.label for r in out}
    assert got[2] == 0            # tie {0, 1} -> min, not 1-by-weight


def test_moving_fn_refuses_silent_column_overwrite(spark):
    from index_spark.operators.temporal import moving_fn

    rows = [("a", i, float(i)) for i in range(4)]
    s = spark.createDataFrame(rows, "k string, bucket int, sum_value double")
    once = moving_fn(s, window=2, fn="ewma", alpha=0.3, by=["k"])
    with pytest.raises(ValueError, match="already exists"):
        moving_fn(once, window=2, fn="ewma", alpha=0.5, by=["k"])
    # out_col= keeps both
    both = moving_fn(once, window=2, fn="ewma", alpha=0.5, by=["k"],
                     out_col="ewma5")
    assert {"ewma", "ewma5"} <= set(both.columns)


def test_bbq_ragged_relation_fails_loudly(spark):
    import numpy as np
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException
    from index_spark.operators.similarity import bbq_topk

    from index_spark.operators.similarity import bbq_encode

    rng = np.random.RandomState(23)
    good = [(i, [float(x) for x in rng.randn(16)]) for i in range(6)]
    short = [(6, [float(x) for x in rng.randn(8)])]
    emb = spark.createDataFrame(good + short,
                                "vec_id long, embedding array<float>")
    q = good[0][1]
    # inline-encode path: the encoder's element_at reads past the
    # 8-dim row — loud Spark error, never silent NULL ranking
    with pytest.raises((Py4JJavaError, PySparkException)):
        bbq_topk(emb, q, k=3, oversample=3).collect()
    # precomputed-codes path: first codes row is 16-dim so the driver
    # probe passes; the row-level scan guard catches the 1-word row
    emb16 = spark.createDataFrame(good,
                                  "vec_id long, embedding array<float>")
    emb8 = spark.createDataFrame(short,
                                 "vec_id long, embedding array<float>")
    codes = bbq_encode(emb16).unionByName(bbq_encode(emb8))
    with pytest.raises((Py4JJavaError, PySparkException),
                       match="ragged codes"):
        bbq_topk(emb16, q, k=3, oversample=3, codes=codes).collect()


# ---------------------------------------------------------------------------
# CJK bigram tokenization
# ---------------------------------------------------------------------------

def test_cjk_bigrams_analyzer_semantics(spark):
    from index_spark.functions.text import cjk_term_counts

    df = spark.createDataFrame(
        [(0, "hello 数据库系统 world"),       # one 5-char han run
         (1, "检索 x 索"),                    # run + isolated unigram
         (2, "plain ascii only"),             # no rows
         (3, "データベース 시스템"),           # katakana (incl. chōonpu) + hangul
         (4, None),                           # NULL text: no rows
         (5, "数据 数据")],                   # repeated bigram -> tf 2
        "doc_id long, text string")
    out = {(r.doc_id, r.term): r.tf
           for r in cjk_term_counts(df).collect()}
    assert out[(0, "数据")] == 1 and out[(0, "系统")] == 1
    assert out[(0, "据库")] == 1 and out[(0, "库系")] == 1
    assert sum(1 for d, _ in out if d == 0) == 4   # 5 chars -> 4 bigrams
    assert out[(1, "检索")] == 1 and out[(1, "索")] == 1
    assert not any(d in (2, 4) for d, _ in out)
    assert out[(3, "デー")] == 1 and out[(3, "ース")] == 1
    assert out[(3, "시스")] == 1 and out[(3, "스템")] == 1
    # bigrams never span separate runs (no cross-script or
    # cross-whitespace pairs)
    assert (3, "ス시") not in out and (5, "据数") not in out
    assert out[(5, "数据")] == 2


def test_cjk_bigrams_plan_is_pure_catalyst(spark):
    from index_spark.functions.text import cjk_term_counts

    df = spark.createDataFrame([(0, "数据库")], "doc_id long, text string")
    plan = cjk_term_counts(df)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cross_jaccard_randomized_mode_equivalence(spark):
    # seeded randomized sweep: prefix filtering must be EXACT (never
    # lose an above-threshold pair) on corpora with heavy stop-gram
    # overlap — the adversarial case for the shared-order prefix
    import random

    from index_spark.operators.dedup import cross_jaccard_pairs

    rng = random.Random(2023)
    vocab = ["the", "data", "big", "fast", "slow", "row", "col"]
    def doc():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))
    left = spark.createDataFrame(
        [(i, doc()) for i in range(25)], "doc_id long, text string")
    right = spark.createDataFrame(
        [(i, doc()) for i in range(20)], "doc_id long, text string")
    for t in (0.2, 0.5, 0.8):
        a = sorted(map(tuple, cross_jaccard_pairs(
            left, right, n=2, threshold=t, mode="naive").collect()))
        b = sorted(map(tuple, cross_jaccard_pairs(
            left, right, n=2, threshold=t, mode="prefix").collect()))
        assert a == b, t


# ---------------------------------------------------------------------------
# mixed latin+CJK index + search
# ---------------------------------------------------------------------------

def _cjk_corpus(spark):
    return spark.createDataFrame(
        [("r", "d0", "data table 数据库系统 row"),
         ("r", "d1", "data row scan 检索 join"),
         ("r", "d2", "plain ascii data table"),
         ("r", "d3", "数据库 检索 系统")],
        "repo string, path string, content string")


def test_build_cjk_index_lengths_and_ranking(spark):
    from index_spark.operators.build import build_cjk_index
    from index_spark.operators.query import search_cjk

    docs, index, stats = build_cjk_index(_cjk_corpus(spark),
                                         stem=False, camel=False,
                                         shard_size=64)
    # hand lengths: d0 3+4, d1 4+1, d2 4+0, d3 0+4 -> total 20
    assert stats["n_docs"] == 4 and stats["total_tokens"] == 20
    assert stats["avgdl"] == 5.0
    dls = {r.doc_id: r.doc_len for r in docs.collect()}
    assert dls == {0: 7, 1: 5, 2: 4, 3: 4}
    out = [r.doc_id for r in search_cjk(
        index, docs, stats, "数据库 table", k=4,
        stem=False, camel=False).collect()]
    # d0 has both streams' terms; d1 has neither 数据库 bigram nor table
    assert out[0] == 0 and 1 not in out
    got_and = [r.doc_id for r in search_cjk(
        index, docs, stats, "数据库 table", k=4, stem=False,
        camel=False, mode="and").collect()]
    assert got_and == [0]


def test_build_cjk_equals_plain_build_on_ascii_corpus(spark):
    from index_spark.operators.build import build_cjk_index, build_index
    from index_spark.operators.query import search

    corpus = spark.createDataFrame(
        [("r", f"d{i}", t) for i, t in enumerate(
            ["data table scan", "data data filter sort",
             "table merge", "data table agg window group"])],
        "repo string, path string, content string")
    d1, i1, s1 = build_cjk_index(corpus, stem=False, camel=False,
                                 shard_size=64)
    d2, i2, s2 = build_index(corpus, stem=False, camel=False,
                             shard_size=64, fused=False)
    assert s1 == s2
    a = [(r.doc_id, r.score) for r in search(
        i1, d1, s1, "data table", k=10, stem=False, camel=False,
        shard_size=64).collect()]
    b = [(r.doc_id, r.score) for r in search(
        i2, d2, s2, "data table", k=10, stem=False, camel=False,
        shard_size=64).collect()]
    assert a == b and a


def test_cjk_query_terms_and_qterms_hook(spark):
    from index_spark.functions.text import cjk_query_terms
    from index_spark.operators.build import build_cjk_index
    from index_spark.operators.query import search

    assert cjk_query_terms("数据库 DataTable", stem=False,
                           camel=False) == \
        ["datatable", "据库", "数据"]
    assert cjk_query_terms("数据库 DataTable", stem=False,
                           camel=True) == \
        ["data", "table", "据库", "数据"]
    assert cjk_query_terms("索") == ["索"]
    # the qterms hook bypasses string tokenization entirely
    docs, index, stats = build_cjk_index(_cjk_corpus(spark),
                                         stem=False, camel=False,
                                         shard_size=64)
    direct = [r.doc_id for r in search(
        index, docs, stats, "", qterms=["数据", "据库"], k=4,
        shard_size=64).collect()]
    assert set(direct) == {0, 3}


# ---------------------------------------------------------------------------
# moving_fn holt_winters (round 5)
# ---------------------------------------------------------------------------

def _hw_ref(l, a, b, g, p):
    """Independent loop implementation of the pinned additive model."""
    n = len(l)
    if n < 2 * p:
        return None
    s = sum(l[:p]) / p
    bb = sum((l[i + p] - l[i]) / p for i in range(p)) / p
    c = {i: l[i - 1] - s for i in range(1, p + 1)}
    for k in range(p + 1, n + 1):
        sn = a * (l[k - 1] - c[k - p]) + (1 - a) * (s + bb)
        c[k] = g * (l[k - 1] - s - bb) + (1 - g) * c[k - p]
        bb = b * (sn - s) + (1 - b) * bb
        s = sn
    return s + bb + c[n + 1 - p]


def test_holt_winters_matches_reference_loop(spark):
    from index_spark.operators.temporal import moving_fn

    vals = [float((i % 3) * 5 + i * 0.5 + (i * 37 % 11) / 7.0)
            for i in range(15)]
    df = spark.createDataFrame(
        [(0, i, v) for i, v in enumerate(vals)],
        "k int, bucket int, sum_value double")
    out = {r.bucket: r.holt_winters for r in moving_fn(
        df, window=7, fn="holt_winters", alpha=0.4, beta=0.2,
        gamma=0.3, period=3, by=["k"]).collect()}
    for i in range(15):
        exp = _hw_ref(vals[max(0, i - 7):i], 0.4, 0.2, 0.3, 3)
        if exp is None:
            assert out[i] is None, i
        else:
            assert abs(out[i] - round(exp, 6)) < 1e-9, i


def test_holt_winters_seasonal_signal_beats_holt(spark):
    """On a pure period-3 seasonal series the seasonal model's one-step
    forecast lands on the true value; trend-only holt cannot."""
    from index_spark.operators.temporal import moving_fn

    vals = [float([10, 0, 5][i % 3]) for i in range(12)]
    df = spark.createDataFrame(
        [(0, i, v) for i, v in enumerate(vals)],
        "k int, bucket int, sum_value double")
    hw = moving_fn(df, window=6, fn="holt_winters", alpha=0.5,
                   beta=0.1, gamma=0.5, period=3, by=["k"])
    both = moving_fn(hw, window=6, fn="holt", alpha=0.5, beta=0.1,
                     by=["k"]).collect()
    errs_hw = [abs(r.holt_winters - vals[r.bucket]) for r in both
               if r.holt_winters is not None]
    errs_h = [abs(r.holt - vals[r.bucket]) for r in both
              if r.holt_winters is not None]
    assert max(errs_hw) < 1e-6              # exact on pure seasonality
    assert min(errs_h) > 1.0                # trend-only misses by a lot


def test_holt_winters_guards(spark):
    from index_spark.operators.temporal import (holt_winters_case_sql,
                                                moving_fn)

    df = spark.createDataFrame([(0, 0, 1.0)],
                               "k int, bucket int, sum_value double")
    with pytest.raises(ValueError, match="gamma"):
        moving_fn(df, window=6, fn="holt_winters", gamma=0.0, period=3)
    with pytest.raises(ValueError, match="period"):
        holt_winters_case_sql(6, 0.3, 0.1, 0.1, period=1)
    with pytest.raises(ValueError, match="2\\*period"):
        holt_winters_case_sql(3, 0.3, 0.1, 0.1, period=2)
    with pytest.raises(ValueError, match="capped"):
        holt_winters_case_sql(20, 0.3, 0.1, 0.1, period=3)
