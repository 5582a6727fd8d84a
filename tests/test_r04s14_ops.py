"""Session-14 operators: match_phrase_prefix, geotile/polygon geo,
matrix/string stats, rare_terms, diversified sampler, funnel,
retention cohorts, serial_diff."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


# ---------------------------------------------------- match_phrase_prefix

@pytest.fixture(scope="module")
def tiny_index(spark):
    from index_spark.operators.build import build_index

    corpus = spark.createDataFrame(
        [("r", "d0", "data table query data tablet"),
         ("r", "d1", "data tab stop data table data table"),
         ("r", "d2", "big data tabulation here"),
         ("r", "d3", "no phrase at all")],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     positions=True, shard_size=256)
    return docs, index.persist(), stats


def test_match_phrase_prefix_expansions(spark, tiny_index):
    from index_spark.operators.phrase import match_phrase_prefix

    _, index, stats = tiny_index
    out = match_phrase_prefix(index, stats, "data tab", k=10,
                              stem=False, camel=False).collect()
    got = {r.doc_id: r.n_matches for r in out}
    # d0: "data table" + "data tablet" = 2; d1: "data tab" + 2x"data
    # table" = 3; d2: "data tabulation" = 1; d3: none
    docs_df = tiny_index[0]
    by_path = {r.path: r.doc_id for r in docs_df.collect()}
    assert got[by_path["d1"]] == 3
    assert got[by_path["d0"]] == 2
    assert got[by_path["d2"]] == 1
    assert by_path["d3"] not in got


def test_match_phrase_prefix_cap_and_order(spark, tiny_index):
    from index_spark.operators.phrase import (
        expand_prefix,
        match_phrase_prefix,
    )

    _, index, stats = tiny_index
    # ascending-term cap: max_expansions=1 keeps only 'tab' itself
    assert expand_prefix(index, "tab", max_expansions=1) == ["tab"]
    out = match_phrase_prefix(index, stats, "data tab", k=10,
                              max_expansions=1, stem=False,
                              camel=False).collect()
    assert {r.n_matches for r in out} == {1}  # only d1's literal "data tab"


def test_match_phrase_prefix_single_token_and_absent(spark, tiny_index):
    from index_spark.operators.phrase import match_phrase_prefix

    docs, index, stats = tiny_index
    by_path = {r.path: r.doc_id for r in docs.collect()}
    out = match_phrase_prefix(index, stats, "tabl", k=10,
                              stem=False, camel=False).collect()
    got = {r.doc_id: r.n_matches for r in out}
    # prefix-only phrase: count of any 'tabl*' occurrence per doc
    assert got[by_path["d0"]] == 2          # table, tablet
    assert got[by_path["d1"]] == 2          # table x2
    assert match_phrase_prefix(index, stats, "data zzz", k=10,
                               stem=False, camel=False).count() == 0


# --------------------------------------------------------------- geotile

def _py_geotile(lat, lon, z):
    lat = max(min(lat, 85.05112878), -85.05112878)
    n = 1 << z
    x = min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    rad = math.radians(lat)
    y = int(math.floor((1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad))
                        / math.pi) / 2.0 * n))
    y = min(max(y, 0), n - 1)
    return f"{z}/{x}/{y}"


def test_geotile_matches_python_oracle(spark):
    from index_spark.operators.geo import geotile_col

    pts = [(37.7749, -122.4194), (0.0, 0.0), (85.3, 179.9),
           (-85.3, -179.9), (51.5, -0.13), (90.0, 180.0), (-90.0, -180.0)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for z in (0, 3, 8):
        got = df.select(geotile_col(F.col("lat"), F.col("lon"), z)
                        .alias("c")).collect()
        exp = [_py_geotile(la, lo, z) for la, lo in pts]
        assert [r.c for r in got] == exp


def test_geotile_grid_counts(spark):
    from index_spark.operators.geo import geotile_grid

    df = spark.createDataFrame(
        [(10.0, 10.0), (10.1, 10.1), (-40.0, 100.0)],
        "lat double, lon double")
    out = geotile_grid(df, zoom=2).collect()
    assert sum(r.n for r in out) == 3
    assert out[0].n == 2  # the two nearby points share the z2 tile


# --------------------------------------------------------------- polygon

def test_point_in_polygon_square_and_concave(spark):
    from index_spark.operators.geo import geo_polygon_filter

    square = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    pts = [(5.0, 5.0, True), (15.0, 5.0, False), (-1.0, -1.0, False),
           (9.99, 9.99, True)]
    df = spark.createDataFrame([(la, lo) for la, lo, _ in pts],
                               "lat double, lon double")
    got = {(r.lat, r.lon) for r in geo_polygon_filter(df, square).collect()}
    exp = {(la, lo) for la, lo, inside in pts if inside}
    assert got == exp
    # concave 'C' shape: the notch is outside
    cshape = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (8.0, 10.0),
              (8.0, 2.0), (2.0, 2.0), (2.0, 10.0), (0.0, 10.0)]
    df2 = spark.createDataFrame([(5.0, 5.0), (1.0, 1.0), (9.0, 5.0)],
                                "lat double, lon double")
    got2 = {(r.lat, r.lon)
            for r in geo_polygon_filter(df2, cshape).collect()}
    assert got2 == {(1.0, 1.0), (9.0, 5.0)}  # notch point (5,5) excluded


def test_polygon_validation(spark):
    from index_spark.operators.geo import point_in_polygon

    with pytest.raises(ValueError, match="at least 3"):
        point_in_polygon(F.col("lat"), F.col("lon"), [(0.0, 0.0)])
    with pytest.raises(ValueError, match="degenerate"):
        point_in_polygon(F.col("lat"), F.col("lon"),
                         [(0.0, 0.0), (0.0, 5.0), (0.0, 9.0)])


def test_polygon_duck_parity(spark):
    import duckdb

    from index_spark.operators.geo import (
        geo_polygon_filter,
        polygon_duck_expr,
    )

    poly = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0),
            (5.0, 5.0)]  # non-convex with a bite
    rows = [(i, (i * 37 % 23) - 5.0, (i * 53 % 29) - 7.0)
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = sorted(r.id for r in geo_polygon_filter(df, poly).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    exp = [r[0] for r in con.sql(
        f"SELECT id FROM t WHERE {polygon_duck_expr('lat', 'lon', poly)} "
        "ORDER BY id").fetchall()]
    assert got == exp and len(got) > 0


# ----------------------------------------------------------- matrix_stats

def test_matrix_stats_hand_oracle(spark):
    import numpy as np

    from index_spark.operators.analytics import matrix_stats

    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 1.0, 4.0, 3.0, 6.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    out = {(r.field, r.other): r for r in matrix_stats(df, ["x", "y"])
           .collect()}
    assert out[("x", "x")]["count"] == 5
    assert out[("x", "x")].mean == 3.0
    assert abs(out[("x", "x")].variance - np.var(xs, ddof=1)) < 1e-9
    assert abs(out[("x", "y")].covariance
               - np.cov(xs, ys, ddof=1)[0][1]) < 1e-9
    assert abs(out[("x", "y")].correlation
               - np.corrcoef(xs, ys)[0][1]) < 1e-4
    assert out[("y", "y")].correlation == 1.0
    assert out[("x", "y")].covariance == out[("y", "x")].covariance
    with pytest.raises(ValueError, match="at least 2"):
        matrix_stats(df, ["x"])


# ----------------------------------------------------------- string_stats

def test_string_stats_entropy(spark):
    from index_spark.operators.analytics import string_stats

    # "aabb" + "ab" -> 3 a's, 3 b's -> entropy exactly 1 bit
    df = spark.createDataFrame([("aabb",), ("ab",)], "text string")
    r = string_stats(df).collect()[0]
    assert (r["count"], r.min_length, r.max_length, r.avg_length) \
        == (2, 2, 4, 3.0)
    assert r.entropy == 1.0
    # uniform 4-char alphabet -> 2 bits
    df2 = spark.createDataFrame([("abcd",)], "text string")
    assert string_stats(df2).collect()[0].entropy == 2.0


# ------------------------------------------------------------- rare_terms

def test_rare_terms_long_tail(spark, tiny_index):
    from index_spark.operators.analytics import rare_terms

    _, index, _ = tiny_index
    out = rare_terms(index, max_doc_count=1).collect()
    terms = {r.term for r in out}
    assert "tablet" in terms and "tabulation" in terms
    assert "data" not in terms  # df=3 > 1
    assert all(r.doc_count == 1 for r in out)
    # ordered (df asc, term asc)
    assert [r.term for r in out] == sorted(r.term for r in out)


# ---------------------------------------------------- diversified sampler

def test_diversified_sample_caps_and_determinism(spark):
    from index_spark.operators.sample import diversified_sample

    rows = [(i, f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = diversified_sample(df, "doc_id", "source", max_per_key=2, n=5)
    got = out.collect()
    assert len(got) == 5
    per = {}
    for r in got:
        per[r.source] = per.get(r.source, 0) + 1
    assert all(v <= 2 for v in per.values())
    # deterministic + repartition-invariant
    again = diversified_sample(df.repartition(7), "doc_id", "source",
                               max_per_key=2, n=5).collect()
    assert sorted(r.doc_id for r in got) == sorted(r.doc_id for r in again)
    with pytest.raises(ValueError, match="max_per_key"):
        diversified_sample(df, "doc_id", "source", max_per_key=0)


# ----------------------------------------------------------------- funnel

def test_funnel_ordered_steps(spark):
    from index_spark.operators.temporal import funnel

    ev = spark.createDataFrame(
        [  # u1 completes all 3 in order; u2 clicks before viewing
           # (click must not count); u3 views only
            (1, "view", "2024-01-01 10:00:00"),
            (1, "click", "2024-01-01 10:05:00"),
            (1, "purchase", "2024-01-01 10:30:00"),
            (2, "click", "2024-01-01 09:00:00"),
            (2, "view", "2024-01-01 09:30:00"),
            (3, "view", "2024-01-01 11:00:00"),
        ], "user_id long, event_type string, ts string")
    out = {r.step: r for r in funnel(
        ev, ["view", "click", "purchase"]).collect()}
    assert out["view"].n_users == 3
    assert out["click"].n_users == 1          # only u1 clicked after view
    assert out["purchase"].n_users == 1
    assert out["view"].conversion == 1.0
    assert abs(out["click"].conversion - 1 / 3) < 1e-3


def test_funnel_horizon_and_validation(spark):
    from index_spark.operators.temporal import funnel

    ev = spark.createDataFrame(
        [(1, "view", "2024-01-01 10:00:00"),
         (1, "click", "2024-01-03 10:00:00")],  # 2 days later
        "user_id long, event_type string, ts string")
    out = {r.step: r.n_users
           for r in funnel(ev, ["view", "click"],
                           horizon="24 hours").collect()}
    assert out == {"view": 1, "click": 0}
    with pytest.raises(ValueError, match="at least 2"):
        funnel(ev, ["view"])


# -------------------------------------------------------------- retention

def test_retention_cohorts(spark):
    from index_spark.operators.temporal import retention_cohorts

    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"),   # u1 cohort day 1, active day 1+8
         (1, "2024-01-09 10:00:00"),
         (2, "2024-01-01 12:00:00"),   # u2 cohort day 1 only
         (3, "2024-01-09 09:00:00")],  # u3 cohort day 9
        "user_id long, ts string")
    # cohort stays the date_trunc timestamp (oracle-parity type)
    out = {(str(r.cohort.date()), r.offset): r.n_users
           for r in retention_cohorts(ev, granularity="week").collect()}
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 1)] == 1     # u1 back in week 2
    assert out[("2024-01-08", 0)] == 1     # u3's own cohort
    with pytest.raises(ValueError, match="granularity"):
        retention_cohorts(ev, granularity="hour")


# ------------------------------------------------------------ serial_diff

def test_serial_diff_lag(spark):
    from index_spark.operators.temporal import serial_diff

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 13.0), ("a", 3, 17.0), ("b", 1, 5.0),
         ("b", 2, 6.0)],
        "k string, bucket int, sum_value double")
    out = {(r.k, r.bucket): r.serial_diff
           for r in serial_diff(df, by=["k"], lag=2).collect()}
    assert out[("a", 3)] == 7.0
    assert out[("a", 1)] is None and out[("a", 2)] is None
    assert out[("b", 2)] is None
    with pytest.raises(ValueError, match="lag"):
        serial_diff(df, by=["k"], lag=0)
