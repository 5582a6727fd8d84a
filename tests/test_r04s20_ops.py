"""Session-20 operators: unified highlighting, late-interaction maxsim,
change-point detection, the C4 cleaning battery, significant_text,
ip_prefix aggregation, bucket_correlation."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# highlight
# ---------------------------------------------------------------------------

def _hl_corpus(spark):
    rows = [
        # doc 1: hits in windows 0 and 2 (size 4), window 2 denser
        (1, "data x y z aa bb cc dd data table query ee"),
        # doc 2: no query terms at all
        (2, "aa bb cc dd ee ff"),
    ]
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_highlight_selects_and_orders_fragments(spark):
    from index_spark.operators.query import highlight

    topk = spark.createDataFrame([(1, 2.0), (2, 1.0)],
                                 "doc_id long, score double")
    out = highlight(topk, _hl_corpus(spark), "data table query",
                    fragment_size=4, n_fragments=2).collect()
    # doc 2 emits nothing (zero-hit windows are never selected)
    assert {r.doc_id for r in out} == {1}
    # doc 1 windows: [data x y z](1), [aa bb cc dd](0), [data table query ee](3)
    assert [(r.frag_no, r.hits, r.fragment) for r in out] == [
        (1, 1, "<em>data</em> x y z"),
        (2, 3, "<em>data</em> <em>table</em> <em>query</em> ee"),
    ]


def test_highlight_rank_prefers_denser_window(spark):
    from index_spark.operators.query import highlight

    topk = spark.createDataFrame([(1, 2.0)], "doc_id long, score double")
    out = highlight(topk, _hl_corpus(spark), "data table query",
                    fragment_size=4, n_fragments=1).collect()
    # only the densest window survives, and frag_no restarts at 1
    assert [(r.frag_no, r.hits) for r in out] == [(1, 3)]
    assert out[0].fragment.startswith("<em>data</em> <em>table</em>")


def test_highlight_guards(spark):
    from index_spark.operators.query import highlight

    topk = spark.createDataFrame([(1, 2.0)], "doc_id long, score double")
    assert highlight(topk, _hl_corpus(spark), "zzzmissing",
                     fragment_size=4).count() == 0
    # punctuation-only query tokenizes to nothing -> empty relation
    assert highlight(topk, _hl_corpus(spark), "...").count() == 0
    with pytest.raises(ValueError):
        highlight(topk, _hl_corpus(spark), "data", stem=True)
    with pytest.raises(ValueError):
        highlight(topk, _hl_corpus(spark), "data", fragment_size=0)


# ---------------------------------------------------------------------------
# maxsim (late interaction)
# ---------------------------------------------------------------------------

def test_maxsim_matches_numpy(spark):
    from index_spark.operators.similarity import (
        maxsim_topk, reshape_token_vectors,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 16).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>")
    q = [[0.5, -0.25, 1.0, 0.125], [0.75, 0.5, -0.5, 0.25]]
    out = maxsim_topk(reshape_token_vectors(df, 4), q, k=5).collect()

    toks = vecs.astype(np.float64).reshape(20, 4, 4)
    qm = np.asarray(q)                       # (2, 4)
    scores = (toks @ qm.T).max(axis=1).sum(axis=1)   # (20,)
    order = sorted(range(20), key=lambda i: (-round(scores[i], 4), i))[:5]
    assert [r.vec_id for r in out] == order
    for r in out:
        assert r.score == pytest.approx(scores[r.vec_id], abs=1e-4)


def test_maxsim_validation(spark):
    from index_spark.operators.similarity import (
        maxsim_topk, reshape_token_vectors,
    )

    df = spark.createDataFrame([(1, [1.0, 2.0])],
                               "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        maxsim_topk(reshape_token_vectors(df, 2), [])
    with pytest.raises(ValueError):
        reshape_token_vectors(df, 0)


# ---------------------------------------------------------------------------
# change_point
# ---------------------------------------------------------------------------

def test_change_point_finds_planted_step(spark):
    # 10 buckets at ~5.0, then 10 buckets at ~50.0 (small jitter so no
    # tie ambiguity); the standardized mean shift peaks at the jump
    vals = [5.0 + 0.01 * i for i in range(10)] + \
           [50.0 + 0.01 * i for i in range(10)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "bucket long, v double")
    from index_spark.operators.temporal import change_point

    row = change_point(df, value_col="v", order_col="bucket",
                       min_buffer=2).collect()[0]
    assert row.n_buckets == 20
    assert row.step_at == 10           # first bucket of the right segment
    assert row.step_mean_before == pytest.approx(5.045, abs=1e-6)
    assert row.step_mean_after == pytest.approx(50.045, abs=1e-6)
    # statistic at the true split: |Δmean| * sqrt(10*10/20)
    assert row.step_stat == pytest.approx(45.0 * np.sqrt(5.0), abs=1e-3)


def test_change_point_finds_planted_spike(spark):
    vals = [10.0] * 15
    vals[6] = 99.0
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "bucket long, v double")
    from index_spark.operators.temporal import change_point

    row = change_point(df, value_col="v", order_col="bucket").collect()[0]
    assert row.spike_at == 6
    assert row.spike_stat == pytest.approx(89.0)   # signed: spike, not dip


def test_change_point_short_series_omitted_and_by_keys(spark):
    from index_spark.operators.temporal import change_point

    rows = [("long", i, float(i >= 5) * 10) for i in range(10)] + \
           [("short", i, 1.0) for i in range(3)]
    df = spark.createDataFrame(rows, "k string, bucket long, v double")
    out = change_point(df, value_col="v", order_col="bucket", by="k",
                       min_buffer=2).collect()
    assert [r.k for r in out] == ["long"]          # short series omitted
    assert out[0].step_at == 5
    with pytest.raises(ValueError):
        change_point(df, value_col="v", min_buffer=0)


# ---------------------------------------------------------------------------
# c4_quality
# ---------------------------------------------------------------------------

def test_c4_battery_gates(spark):
    from index_spark.operators.curate import c4_quality

    good = ("the first sentence has plenty of words in it.\n"
            "the second sentence also has plenty of words here!\n"
            "does the third sentence have enough words as well?")
    rows = [
        (1, good),                                         # keeps all gates
        (2, good + "\nlorem ipsum dolor."),                # banned substring
        (3, good + "\ncode with a { brace."),              # banned substring
        (4, "short line.\n" + good),                       # <5 words dropped
        (5, good.replace(".", "").replace("!", "")
            .replace("?", "")),                            # no terminal punct
        (6, good + "\nthis javascript warning line would have six words."),
    ]
    out = {r.doc_id: r for r in
           c4_quality(spark.createDataFrame(
               rows, "doc_id long, text string")).collect()}

    assert out[1].keep and out[1].reason == "ok"
    assert out[1].n_kept_lines == 3 and out[1].n_sentences == 3
    assert out[1].clean_text == good
    assert out[2].reason == "banned:lorem ipsum" and not out[2].keep
    assert out[3].reason == "banned:{"
    # short line dropped but the rest still passes
    assert out[4].keep and out[4].n_lines == 4 and out[4].n_kept_lines == 3
    # no terminal punctuation => zero kept lines => too few sentences
    assert out[5].reason == "too_few_sentences"
    assert out[5].n_kept_lines == 0 and out[5].clean_text == ""
    # the javascript line is dropped, everything else keeps
    assert out[6].keep and out[6].n_kept_lines == 3


# ---------------------------------------------------------------------------
# significant_text
# ---------------------------------------------------------------------------

def test_significant_text_dedups_and_scores(spark):
    from index_spark.operators.analytics import significant_text

    rows = [
        (1, "alpha beta", "fg"),
        (2, "alpha beta", "fg"),      # exact duplicate: counts once
        (3, "alpha gamma", "fg"),
        (4, "beta delta", "bg"),
        (5, "delta gamma", "bg"),
        (6, "delta epsilon", "bg"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    out = {r.term: r for r in significant_text(
        df, "grp = 'fg'", top=10, min_fg_df=1).collect()}
    # after dedup: 5 docs total, 2 fg (ids 1, 3)
    assert out["alpha"].fg_df == 2 and out["alpha"].df == 2
    fg_pct, bg_pct = 2 / 2, 2 / 5
    assert out["alpha"].jlh == pytest.approx(
        (fg_pct - bg_pct) * (fg_pct / bg_pct), abs=1e-6)
    # delta never appears in fg -> filtered by min_fg_df
    assert "delta" not in out

    nodedup = {r.term: r for r in significant_text(
        df, "grp = 'fg'", top=10, min_fg_df=1,
        filter_duplicate_text=False).collect()}
    assert nodedup["alpha"].fg_df == 3 and nodedup["alpha"].df == 3

    with pytest.raises(ValueError):
        significant_text(df, "grp = 'nope'")


# ---------------------------------------------------------------------------
# ip_prefix + bucket_correlation
# ---------------------------------------------------------------------------

def test_ip_prefix_pinned_labels(spark):
    from index_spark.operators.analytics import ip_prefix_facet

    ips = [(10 << 24) + (1 << 16) + 5,          # 10.1.0.5
           (10 << 24) + (1 << 16) + 200,        # 10.1.0.200 same /16
           (10 << 24) + (2 << 16) + 1,          # 10.2.0.1
           (192 << 24) + (168 << 16) + 77]      # 192.168.0.77
    df = spark.createDataFrame([(x,) for x in ips], "ip long")
    out = [(r.prefix, r.n_rows)
           for r in ip_prefix_facet(df, "ip", 16).collect()]
    assert out == [("10.1.0.0/16", 2), ("10.2.0.0/16", 1),
                   ("192.168.0.0/16", 1)]
    # /32 = exact addresses; min_doc_count prunes singletons
    assert ip_prefix_facet(df, "ip", 32, min_doc_count=2).count() == 0
    with pytest.raises(ValueError):
        ip_prefix_facet(df, "ip", 0)


def test_bucket_correlation_known_values(spark):
    from index_spark.operators.analytics import bucket_correlation

    df = spark.createDataFrame([(i, float(2 * i + 3)) for i in range(8)],
                               "bucket long, n_events double")
    r = bucket_correlation(df, [float(i) for i in range(8)],
                           value_col="n_events").collect()[0]
    assert r.correlation == pytest.approx(1.0)
    r = bucket_correlation(df, [float(-i) for i in range(8)],
                           value_col="n_events").collect()[0]
    assert r.correlation == pytest.approx(-1.0)
    with pytest.raises(ValueError):
        bucket_correlation(df, [1.0, 2.0], value_col="n_events")
