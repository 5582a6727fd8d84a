"""Session-16 operators: boosting query, pinned query,
distance_feature query, auto_date_histogram, stats_bucket."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


@pytest.fixture(scope="module")
def s16_index(spark):
    from index_spark.operators.build import build_index

    corpus = spark.createDataFrame(
        [("r", "d0", "data table data table data"),     # strong match
         ("r", "d1", "data table legacy deprecated"),   # match + negative
         ("r", "d2", "data here only"),                 # weak match
         ("r", "d3", "nothing relevant")],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=256)
    by_path = {r.path: r.doc_id for r in docs.collect()}
    return by_path, index.persist(), stats


# ------------------------------------------------------------- boosting

def test_boosting_demotes_not_excludes(spark, s16_index):
    from index_spark.operators.query import boosting_search, search

    by_path, index, stats = s16_index
    base = {r.doc_id: r.score
            for r in search(index, None, stats, "data table", k=10,
                            stem=False, camel=False).collect()}
    out = boosting_search(index, stats, "data table", "legacy",
                          negative_boost=0.2, k=10, stem=False,
                          camel=False).collect()
    got = {r.doc_id: r.score for r in out}
    d1 = by_path["d1"]
    # d1 still present (demoted, not excluded), at 0.2x its base score
    assert d1 in got
    assert abs(got[d1] - 0.2 * base[d1]) < 1e-9
    # non-matching-negative docs keep their base score
    d0 = by_path["d0"]
    assert abs(got[d0] - base[d0]) < 1e-12
    with pytest.raises(ValueError, match="negative_boost"):
        boosting_search(index, stats, "data", "x", negative_boost=1.5)


# --------------------------------------------------------------- pinned

def test_pinned_order_and_fill(spark, s16_index):
    from index_spark.operators.query import pinned_search

    by_path, index, stats = s16_index
    d3, d2 = by_path["d3"], by_path["d2"]
    out = pinned_search(index, stats, "data table", [d3, d2], k=4,
                        stem=False, camel=False).collect()
    # pins occupy ranks 1..2 in GIVEN order; d3 doesn't match -> 0.0
    assert [(r.rank, r.doc_id, r.pinned) for r in out[:2]] \
        == [(1, d3, True), (2, d2, True)]
    assert out[0].score == 0.0 and out[1].score > 0.0
    # organic fill excludes the pins and ranks by score
    organic = [r for r in out if not r.pinned]
    assert {r.doc_id for r in organic} == {by_path["d0"], by_path["d1"]}
    assert organic[0].doc_id == by_path["d0"]      # strongest organic
    with pytest.raises(ValueError, match="distinct"):
        pinned_search(index, stats, "data", [1, 1])


# ----------------------------------------------------- distance_feature

def test_distance_feature_geo_and_date(spark, s16_index):
    from index_spark.operators.query import (
        distance_feature_search,
        search,
    )

    by_path, index, stats = s16_index
    d0, d2 = by_path["d0"], by_path["d2"]
    # put the WEAK match at the origin, the strong one far away
    feats = spark.createDataFrame(
        [(d2, 0.0, 0.0), (d0, 0.0, 90.0)],
        "doc_id long, lat double, lon double")
    out = distance_feature_search(
        index, stats, "data table", feats, kind="geo",
        origin=(0.0, 0.0), pivot=100.0, boost=10.0, k=10,
        stem=False, camel=False).collect()
    got = {r.doc_id: r.score for r in out}
    base = {r.doc_id: r.score
            for r in search(index, None, stats, "data table", k=10,
                            stem=False, camel=False).collect()}
    # d2 at the origin gets the full +10 boost and overtakes d0
    assert abs(got[d2] - (base[d2] + 10.0)) < 1e-9
    assert out[0].doc_id == d2
    # doc with no feature row keeps its base score
    assert abs(got[by_path["d1"]] - base[by_path["d1"]]) < 1e-12
    # date kind: origin-coincident doc gets the full boost
    tf = spark.createDataFrame([(d2, "2024-01-01 00:00:00")],
                               "doc_id long, ts string")
    out2 = {r.doc_id: r.score for r in distance_feature_search(
        index, stats, "data table", tf, kind="date",
        origin="2024-01-01 00:00:00", pivot=3600.0, boost=5.0, k=10,
        stem=False, camel=False).collect()}
    assert abs(out2[d2] - (base[d2] + 5.0)) < 1e-9


# -------------------------------------------------- auto_date_histogram

def test_auto_date_histogram_ladder(spark):
    from index_spark.operators.temporal import auto_date_histogram

    # 3-hour span, target 10 -> minutes give 181 buckets (too many),
    # hours give 4 -> chooses 'hour'
    rows = [(f"2024-01-01 0{h}:{m:02d}:00",)
            for h in range(4) for m in (5, 35)]
    ev = spark.createDataFrame(rows, "ts string")
    out = auto_date_histogram(ev, target_buckets=10).collect()
    assert {r.interval for r in out} == {"hour"}
    assert len(out) == 4 and all(r.doc_count == 2 for r in out)
    # generous target -> finest (minute) wins
    fine = auto_date_histogram(ev, target_buckets=10_000).collect()
    assert {r.interval for r in fine} == {"minute"}
    with pytest.raises(ValueError, match="target_buckets"):
        auto_date_histogram(ev, target_buckets=0)


# ----------------------------------------------------------- stats_bucket

def test_stats_bucket_extended(spark):
    from index_spark.operators.temporal import stats_bucket

    b = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (6.0,)],
                              "sum_value double")
    r = stats_bucket(b, extended=True).collect()[0]
    assert (r["count"], r["min"], r["max"], r["avg"], r["sum"]) \
        == (4, 1.0, 6.0, 3.0, 12.0)
    # population variance: mean 3, squared devs (4,1,0,9)/4 = 3.5
    assert r.variance == 3.5
    assert abs(r.std_deviation - 3.5 ** 0.5) < 1e-4
    assert "variance" not in stats_bucket(b).columns


def test_sibling_bucket_aggs_extremes_and_ties(spark):
    from pyspark.sql import functions as F

    from index_spark.operators.temporal import sibling_bucket_aggs

    rows = [("a", 1.0), ("b", 5.0), ("c", 5.0), ("d", 2.0)]
    df = spark.createDataFrame(rows, "k string, sum_value double")
    out = sibling_bucket_aggs(df, keys=["k"],
                              percents=[0.5]).collect()[0]
    assert out.max_value == 5.0 and out.max_keys == "b"  # tie -> first
    assert out.min_value == 1.0 and out.min_keys == "a"
    assert out.p50 == 3.5
    with pytest.raises(ValueError, match="percent"):
        sibling_bucket_aggs(df, percents=[2.0])


def test_geo_line_order_and_cap(spark):
    from pyspark.sql import functions as F

    from index_spark.operators.geo import geo_line

    rows = [("a", 3, 10.0, 20.0), ("a", 1, 11.0, 21.0),
            ("a", 2, 12.0, 22.0), ("b", 1, 1.0, 2.0)]
    df = spark.createDataFrame(rows, "k string, ts int, lat double, "
                                     "lon double")
    out = {r.k: (r.line, r.n_points) for r in geo_line(
        df, by="k", sort_col="ts", size=2, round_at=1).collect()}
    # sort by ts, cap at 2, lon-lat order
    assert out["a"] == ("21.0 11.0;22.0 12.0", 2)
    assert out["b"] == ("2.0 1.0", 1)
    with pytest.raises(ValueError, match="size"):
        geo_line(df, size=0)
