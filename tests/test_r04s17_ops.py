"""Round-4 session-17 surface: ES pipeline aggs (bucket_script/
selector/sort, normalize, moving_percentiles, cumulative_cardinality),
metric aggs (weighted_avg, median_absolute_deviation, boxplot, t_test,
range, filters), and the query-side match_bool_prefix + span_not."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- fixtures

@pytest.fixture(scope="module")
def buckets(spark):
    # one series per key; series 'a' values 10, 20, 30, 40
    rows = [("a", f"2024-01-0{i+1}", float(v), 2 + i)
            for i, v in enumerate([10, 20, 30, 40])]
    rows += [("b", f"2024-01-0{i+1}", float(v), 5)
             for i, v in enumerate([4, 8])]
    df = spark.createDataFrame(rows, "key string, bucket string, "
                                     "sum_value double, n_events int")
    return df.withColumn("bucket", F.to_timestamp("bucket"))


@pytest.fixture(scope="module")
def positional_ix(spark):
    from index_spark.operators.build import build_index

    texts = [
        (0, "data table holds rows"),            # clean match
        (1, "query the data table now"),         # poisoned (pre=2)
        (2, "data table data table query"),      # 2nd match poisoned
        (3, "big data tabulation effort"),       # prefix-only doc
        (4, "table data reversed order"),        # no phrase
    ]
    corpus = spark.createDataFrame(
        [("r", f"d{i}", t) for i, t in texts],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     positions=True, shard_size=16)
    return docs, index.persist(), stats


# ----------------------------------------------------- bucket script/sort

def test_bucket_script_selector_sort(buckets):
    from index_spark.operators.temporal import bucket_script_pipeline

    out = bucket_script_pipeline(
        buckets, script={"per_event": "sum_value / n_events"},
        selector="n_events >= 3", sort_by="per_event", size=2).collect()
    # surviving per_event values: a -> 6.6667, 7.5, 8.0; b -> 0.8, 1.6
    assert [r.per_event for r in out] == [8.0, 7.5]
    assert all(r.n_events >= 3 for r in out)


def test_bucket_sort_requires_sort_by(buckets):
    from index_spark.operators.temporal import bucket_script_pipeline

    with pytest.raises(ValueError, match="sort_by"):
        bucket_script_pipeline(buckets, size=3)


# ------------------------------------------------------------- normalize

def test_normalize_methods(buckets):
    from index_spark.operators.temporal import normalize_buckets

    out = normalize_buckets(
        buckets, value_col="sum_value", by=["key"],
        methods=["rescale_0_1", "rescale_0_100", "percent_of_sum",
                 "mean", "z-score", "softmax"]).collect()
    a = [r for r in out if r.key == "a"]
    assert [r.rescale_0_1 for r in a] == [0.0, 0.3333, 0.6667, 1.0]
    assert [r.rescale_0_100 for r in a] == [0.0, 33.3333, 66.6667, 100.0]
    assert abs(sum(r.percent_of_sum for r in a) - 1.0) < 1e-3
    # ES 'mean' method: (x - mean) / (max - min); mean(a) = 25
    assert [r.mean for r in a] == [-0.5, -0.1667, 0.1667, 0.5]
    # z-score uses population stddev
    sd = np.std([10, 20, 30, 40])
    assert a[0]["z_score"] == round((10 - 25) / sd, 4)
    assert abs(sum(r.softmax for r in a) - 1.0) < 1e-3
    # softmax is dominated by the max value here
    assert a[3].softmax > 0.99


def test_normalize_unknown_method(buckets):
    from index_spark.operators.temporal import normalize_buckets

    with pytest.raises(ValueError, match="unknown normalize"):
        normalize_buckets(buckets, methods=["bogus"])


# --------------------------------------------------- moving percentiles

def test_moving_percentiles_trailing(buckets):
    from index_spark.operators.temporal import moving_percentiles

    out = moving_percentiles(buckets, value_col="sum_value", window=2,
                             percents=[0.5], by=["key"]).collect()
    a = [r.p50 for r in out if r.key == "a"]
    # partial first window = the value itself; then pair midpoints
    assert a == [10.0, 15.0, 25.0, 35.0]


def test_moving_percentiles_validation(buckets):
    from index_spark.operators.temporal import moving_percentiles

    with pytest.raises(ValueError, match="window"):
        moving_percentiles(buckets, window=0)
    with pytest.raises(ValueError, match="percent"):
        moving_percentiles(buckets, percents=[1.5])


# ----------------------------------------------- cumulative cardinality

def test_cumulative_cardinality(spark):
    from index_spark.operators.temporal import cumulative_cardinality

    rows = [("2024-01-01", 1), ("2024-01-01", 2),
            ("2024-01-02", 1), ("2024-01-02", 3),   # 1 repeats, 3 new
            ("2024-01-03", 1), ("2024-01-03", 2)]   # nothing new
    ev = spark.createDataFrame(rows, "ts string, user_id int") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = cumulative_cardinality(ev, key_col="user_id",
                                 interval="day").collect()
    assert [(r.new_keys, r.cumulative_distinct) for r in out] == \
        [(2, 2), (1, 3)]  # day 3 has no first-seen keys -> no row
    # the cumulative count at the last emitted bucket == global distinct
    assert out[-1].cumulative_distinct == 3


# ----------------------------------------------------------- metric aggs

def test_weighted_avg_skips_nulls(spark):
    from index_spark.operators.analytics import weighted_avg

    rows = [("x", 10.0, 1.0), ("x", 20.0, 3.0),
            ("x", None, 5.0), ("x", 99.0, None)]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    out = weighted_avg(df, "v", "w", by=["k"]).collect()[0]
    assert out.weighted_avg == round((10 + 60) / 4.0, 4)
    assert out.doc_count == 2


def test_median_absolute_deviation(spark):
    from index_spark.operators.analytics import median_absolute_deviation

    df = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 4, 100]],
                               "v double")
    out = median_absolute_deviation(df, "v").collect()[0]
    assert out.median == 3.0
    assert out.mad == 1.0  # |x-3| = {2,1,0,1,97} -> median 1


def test_boxplot_whiskers_clip_outlier(spark):
    from index_spark.operators.analytics import boxplot_agg

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 100.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = boxplot_agg(df, "v").collect()[0]
    assert out.min == 1.0 and out.max == 100.0
    q1, q3 = out.q1, out.q3
    assert q1 == np.percentile(vals, 25) and q3 == np.percentile(vals, 75)
    # upper whisker is the largest value inside q3 + 1.5 IQR (not 100)
    assert out.upper == 5.0 and out.lower == 1.0


def test_t_test_welch_and_pooled(spark):
    from index_spark.operators.analytics import t_test_agg

    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [2.0, 4.0, 6.0, 8.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    out = t_test_agg(df, "v", "g", "a", "b").collect()[0]
    va, vb_ = np.var(a, ddof=1), np.var(b, ddof=1)
    se2 = va / 5 + vb_ / 4
    t = (np.mean(a) - np.mean(b)) / math.sqrt(se2)
    dof = se2 ** 2 / ((va / 5) ** 2 / 4 + (vb_ / 4) ** 2 / 3)
    assert out.t_stat == round(t, 4) and out.dof == round(dof, 4)
    pooled = t_test_agg(df, "v", "g", "a", "b",
                        kind="homoscedastic").collect()[0]
    sp2 = (4 * va + 3 * vb_) / 7
    tp = (np.mean(a) - np.mean(b)) / math.sqrt(sp2 * (1 / 5 + 1 / 4))
    assert pooled.t_stat == round(tp, 4) and pooled.dof == 7.0
    with pytest.raises(ValueError, match="kind"):
        t_test_agg(df, "v", "g", "a", "b", kind="paired")


def test_range_facet_half_open_and_overlap(spark):
    from index_spark.operators.analytics import range_facet

    df = spark.createDataFrame([(float(v),) for v in [1, 5, 10, 20]],
                               "v double")
    out = {r.range: r.doc_count for r in range_facet(
        df, "v", [(None, 10.0), (5.0, None), (10.0, 10.0)]).collect()}
    assert out["*-10"] == 2          # 10 excluded (half-open)
    assert out["5-*"] == 3           # 5 included; overlaps the first
    assert out["10-10"] == 0         # empty half-open interval
    with pytest.raises(ValueError, match="non-empty"):
        range_facet(df, "v", [])


def test_filters_facet_other_bucket(spark):
    from index_spark.operators.analytics import filters_facet

    df = spark.createDataFrame(
        [("click", 10.0), ("error", 5.0), ("view", 1.0)],
        "t string, v double")
    out = {r.filter: (r.doc_count, r.sum_value) for r in filters_facet(
        df, {"err": "t = 'error'", "big": "v >= 5"},
        value_col="v", other_bucket=True).collect()}
    assert out["err"] == (1, 5.0)
    assert out["big"] == (2, 15.0)   # overlapping membership
    assert out["_other_"] == (1, 1.0)


# -------------------------------------------------- match_bool_prefix

def test_match_bool_prefix_scores(positional_ix):
    from index_spark.operators.query import match_bool_prefix_search

    docs, index, stats = positional_ix
    # prefix 'tabu' expands only to 'tabulation' (doc 3); every doc
    # contains 'data', so doc 3 = BM25(data) + 1.0 and the rest are
    # BM25(data) alone
    out = {r.doc_id: r.score for r in match_bool_prefix_search(
        index, stats, "data tabu", k=10, stem=False, camel=False,
        shard_size=16, round_at=4).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    top = max(out, key=lambda d: out[d])
    assert top == 3 and out[3] > 1.0
    for d in (0, 1, 2, 4):
        assert 0.0 < out[d] < 1.0  # no prefix constant on these


def test_match_bool_prefix_no_expansion(positional_ix):
    from index_spark.operators.query import match_bool_prefix_search

    docs, index, stats = positional_ix
    out = match_bool_prefix_search(index, stats, "data zzzz", k=10,
                                   stem=False, camel=False,
                                   shard_size=16).collect()
    # dead prefix -> fixed-term scores only ('data' is in every doc),
    # nothing constant-boosted
    assert {r.doc_id for r in out} == {0, 1, 2, 3, 4}
    assert all(r.score < 1.0 for r in out)


# --------------------------------------------------------------- span_not

def test_span_not_poisoned_matches(positional_ix):
    from index_spark.operators.phrase import span_not_search

    docs, index, stats = positional_ix
    out = {r.doc_id: r.n_matches for r in span_not_search(
        index, stats, "data table", "query", pre=2, post=2, k=10,
        stem=False, camel=False, shard_size=16).collect()}
    # doc 0: clean. doc 1: 'query' 2 before the start -> poisoned.
    # doc 2: two matches, only the second is within 2 of 'query'.
    assert out == {0: 1, 2: 1}


def test_span_not_zero_window_keeps_all(positional_ix):
    from index_spark.operators.phrase import span_not_search

    docs, index, stats = positional_ix
    out = {r.doc_id: r.n_matches for r in span_not_search(
        index, stats, "data table", "query", pre=0, post=0, k=10,
        stem=False, camel=False, shard_size=16).collect()}
    # disjoint terms can't overlap with zero tolerance
    assert out == {0: 1, 1: 1, 2: 2}


def test_span_not_requires_exclude(positional_ix):
    from index_spark.operators.phrase import span_not_search

    docs, index, stats = positional_ix
    with pytest.raises(ValueError, match="exclude"):
        span_not_search(index, stats, "data table", "", stem=False,
                        camel=False)


def test_normalize_constant_series_pinned_zero(spark):
    from index_spark.operators.temporal import normalize_buckets

    rows = [("c", f"2024-01-0{i+1}", 7.0) for i in range(3)]
    df = spark.createDataFrame(rows, "key string, bucket string, "
                                     "sum_value double") \
        .withColumn("bucket", F.to_timestamp("bucket"))
    out = normalize_buckets(df, value_col="sum_value", by=["key"],
                            methods=["rescale_0_1", "mean",
                                     "z-score"]).collect()
    for r in out:  # constant series: range/stddev are 0 -> pinned 0.0
        assert r.rescale_0_1 == 0.0 and r.mean == 0.0
        assert r["z_score"] == 0.0


def test_match_bool_prefix_rejects_and_mode(positional_ix):
    from index_spark.operators.query import match_bool_prefix_search

    docs, index, stats = positional_ix
    with pytest.raises(ValueError, match="mode='or' only"):
        match_bool_prefix_search(index, stats, "data tab", mode="and",
                                 stem=False, camel=False)


# ------------------------------------------- frequent item sets / metrics

def test_frequent_item_pairs_support(spark):
    from index_spark.operators.analytics import frequent_item_pairs

    rows = [(1, "a"), (1, "b"), (1, "b"),   # dup (1,b) must not inflate
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c"),
            (4, "c")]
    df = spark.createDataFrame(rows, "txn int, item string")
    out = {(r.item_a, r.item_b): (r.doc_count, r.support)
           for r in frequent_item_pairs(df, "txn", "item",
                                        min_support=0.5).collect()}
    # 4 transactions; (a,b) in 2 -> 0.5 passes; (a,c) in 1 -> pruned
    assert out == {("a", "b"): (2, 0.5)}
    with pytest.raises(ValueError, match="min_support"):
        frequent_item_pairs(df, "txn", "item", min_support=0.0)


def test_frequent_item_pairs_apriori_prune(spark):
    from index_spark.operators.analytics import frequent_item_pairs

    # 'z' appears once (support .25 < .5): Apriori prunes it before the
    # self-join, so no z-pair can appear even as doc_count >= 1
    rows = [(1, "a"), (1, "z"), (2, "a"), (3, "a"), (4, "a")]
    df = spark.createDataFrame(rows, "txn int, item string")
    out = frequent_item_pairs(df, "txn", "item",
                              min_support=0.25).collect()
    assert {(r.item_a, r.item_b) for r in out} == {("a", "z")}
    out2 = frequent_item_pairs(df, "txn", "item",
                               min_support=0.5).collect()
    assert out2 == []


def test_top_metrics_best_row(spark):
    from index_spark.operators.analytics import top_metrics

    rows = [("x", 1.0, 10.0), ("x", 5.0, 20.0), ("x", 3.0, 30.0),
            ("y", 2.0, 40.0)]
    df = spark.createDataFrame(rows, "k string, s double, m double")
    out = {r.k: (r.sort, r.m) for r in top_metrics(
        df, "k", "s", ["m"]).collect()}
    assert out == {"x": (5.0, 20.0), "y": (2.0, 40.0)}
    lo = {r.k: (r.sort, r.m) for r in top_metrics(
        df, "k", "s", ["m"], ascending=True).collect()}
    assert lo["x"] == (1.0, 10.0)


def test_rate_agg_actual_span(spark):
    from index_spark.operators.analytics import rate_agg

    # 3 events in January (31 days), 1 in February (29 days, 2024)
    rows = [("2024-01-05", 1.0), ("2024-01-10", 1.0),
            ("2024-01-20", 1.0), ("2024-02-10", 1.0)]
    ev = spark.createDataFrame(rows, "ts string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {str(r.bucket)[:7]: r.rate_per_day for r in rate_agg(
        ev, unit="day", interval="month").collect()}
    assert out["2024-01"] == round(3 / 31, 4)
    assert out["2024-02"] == round(1 / 29, 4)
    with pytest.raises(ValueError, match="unit"):
        rate_agg(ev, unit="fortnight")
