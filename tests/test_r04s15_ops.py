"""Session-15 operators: top_hits, percentile_ranks, geo_centroid /
geo_bounds, gap-filled date_histogram, has_child / has_parent,
PCA top component."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


# ----------------------------------------------------------------- top_hits

def test_top_hits_per_bucket(spark):
    from index_spark.operators.analytics import top_hits

    rows = [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0),
            ("b", 4, 5.0), ("b", 5, 5.0)]
    df = spark.createDataFrame(rows, "g string, id long, score double")
    out = top_hits(df, by="g", sort_col="score", n=2).collect()
    got = [(r.g, r.id, r.hit_rank) for r in out]
    # a: 30 (id2) then 20 (id3); b: tie on 5.0 breaks ascending id
    assert got == [("a", 2, 1), ("a", 3, 2), ("b", 4, 1), ("b", 5, 2)]


# --------------------------------------------------------- percentile_ranks

def test_percentile_ranks_cdf(spark):
    from index_spark.operators.analytics import percentile_ranks

    df = spark.createDataFrame([(float(v),) for v in range(1, 11)],
                               "x double")
    out = {r.value: r.pct_rank
           for r in percentile_ranks(df, "x", [5.0, 10.0, 0.5]).collect()}
    assert out[5.0] == 50.0       # 5 of 10 values <= 5
    assert out[10.0] == 100.0
    assert out[0.5] == 0.0
    with pytest.raises(ValueError, match="at least one"):
        percentile_ranks(df, "x", [])


# --------------------------------------------------- geo centroid / bounds

def test_geo_centroid_and_bounds(spark):
    from index_spark.operators.geo import geo_bounds, geo_centroid

    rows = [("a", 10.0, 20.0), ("a", 20.0, 40.0), ("b", -5.0, 0.0)]
    df = spark.createDataFrame(rows, "g string, lat double, lon double")
    c = {r.g: r for r in geo_centroid(df, by="g").collect()}
    assert (c["a"].centroid_lat, c["a"].centroid_lon, c["a"].n) \
        == (15.0, 30.0, 2)
    assert c["b"].n == 1
    b = {r.g: r for r in geo_bounds(df, by="g").collect()}
    assert (b["a"].top, b["a"].bottom, b["a"].left, b["a"].right) \
        == (20.0, 10.0, 20.0, 40.0)
    # unkeyed: one row
    assert geo_centroid(df).count() == 1


# ----------------------------------------------------------- date_histogram

def test_date_histogram_gap_fill(spark):
    from index_spark.operators.temporal import date_histogram

    rows = [("2024-01-01 00:10:00",), ("2024-01-01 00:50:00",),
            ("2024-01-01 03:20:00",)]   # hours 01 and 02 are empty
    ev = spark.createDataFrame(rows, "ts string")
    out = date_histogram(ev, interval="hour", min_doc_count=0).collect()
    assert [r.doc_count for r in out] == [2, 0, 0, 1]
    # min_doc_count=1 (default): empty buckets dropped
    assert date_histogram(ev, interval="hour").count() == 2
    # extended bounds force the axis past the data
    out2 = date_histogram(
        ev, interval="hour", min_doc_count=0,
        extended_bounds=("2024-01-01 00:00:00", "2024-01-01 05:00:00"))
    assert out2.count() == 6
    with pytest.raises(ValueError, match="interval"):
        date_histogram(ev, interval="fortnight")


def test_date_histogram_keyed_fill(spark):
    from index_spark.operators.temporal import date_histogram

    rows = [("a", "2024-01-01 00:00:00"), ("b", "2024-01-01 02:00:00")]
    ev = spark.createDataFrame(rows, "k string, ts string")
    out = date_histogram(ev, interval="hour", by=["k"], min_doc_count=0)
    got = {(r.k, str(r.bucket)): r.doc_count for r in out.collect()}
    # both keys get the full 3-hour axis
    assert len(got) == 6
    assert got[("a", "2024-01-01 00:00:00")] == 1
    assert got[("a", "2024-01-01 02:00:00")] == 0
    assert got[("b", "2024-01-01 02:00:00")] == 1


# ------------------------------------------------------------- parent-child

def test_has_child_modes(spark):
    from index_spark.operators.nested import has_child_search

    parents = spark.createDataFrame(
        [("p1", "x"), ("p2", "y"), ("p3", "z")],
        "parent_id string, attr string")
    kids = spark.createDataFrame(
        [("p1", 1.0), ("p1", 3.0), ("p2", 2.0)],
        "parent_id string, score double")
    out = {r.parent_id: r for r in
           has_child_search(parents, kids, score_mode="max").collect()}
    assert out["p1"].score == 3.0 and out["p1"].n_children == 2
    assert out["p2"].score == 2.0
    assert "p3" not in out          # no matching children
    s = {r.parent_id: r.score for r in
         has_child_search(parents, kids, score_mode="sum").collect()}
    assert s["p1"] == 4.0
    # min_children gates
    only = has_child_search(parents, kids, score_mode="avg",
                            min_children=2).collect()
    assert [r.parent_id for r in only] == ["p1"]
    with pytest.raises(ValueError, match="score_mode"):
        has_child_search(parents, kids, score_mode="median")


def test_has_parent_inherits(spark):
    from index_spark.operators.nested import has_parent_search

    kids = spark.createDataFrame(
        [("p1", 10), ("p1", 11), ("p2", 12), ("p9", 13)],
        "parent_id string, doc_id long")
    pscores = spark.createDataFrame(
        [("p1", 2.0), ("p2", 5.0)], "parent_id string, score double")
    out = has_parent_search(kids, pscores, k=10).collect()
    assert [(r.doc_id, r.score) for r in out] \
        == [(12, 5.0), (10, 2.0), (11, 2.0)]   # p9 child dropped


# --------------------------------------------------------------------- pca

def test_pca_top_component_hand_oracle(spark):
    import numpy as np

    from index_spark.operators.similarity import pca_top_component

    # anisotropic cloud: variance dominated by the [1, 1]/sqrt(2) axis
    rng = [(float(i), float(i) + (0.5 if i % 2 else -0.5))
           for i in range(-10, 11)]
    df = spark.createDataFrame([([a, b],) for a, b in rng],
                               "embedding array<double>")
    out = pca_top_component(df, iters=8)
    rows = sorted(out.collect(), key=lambda r: r.dim)
    v = np.array([r.loading for r in rows])
    x = np.array(rng)
    cov = np.cov(x.T, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    if top[int(np.argmax(np.abs(top)))] < 0:
        top = -top
    assert np.allclose(v, top, atol=1e-3)
    assert abs(rows[0].eigval - evals[-1]) < 1e-2
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-3


def test_pca_needs_rows(spark):
    from index_spark.operators.similarity import pca_top_component

    df = spark.createDataFrame([([1.0, 2.0],)], "embedding array<double>")
    with pytest.raises(ValueError, match="at least 2"):
        pca_top_component(df)
