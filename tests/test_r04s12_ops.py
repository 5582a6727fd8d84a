"""Round-4 session-12 surfaces: the geo family (haversine distance,
bounding box, closed-form base32 geohash, geohash_grid aggregation),
Kleinberg HITS link analysis, the ES rank_feature additive static
signal, and ES pipeline aggregations — each pinned against a
hand-computed or textbook python reference."""

import math

import pytest
from pyspark.sql import functions as F

from index_spark.operators.build import build_index
from index_spark.operators.geo import (
    geo_bounding_box,
    geo_distance_topk,
    geohash_col,
    geohash_grid,
    haversine_km,
)
from index_spark.operators.graph import hits
from index_spark.operators.query import rank_feature_search, search

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _ref_geohash(lat, lon, precision):
    """Textbook interval-halving encoder (Niemeyer 2008) — the
    independent mechanism the closed-form SQL encoding is pinned to."""
    lat_i, lon_i = [-90.0, 90.0], [-180.0, 180.0]
    bits, ch, out, even = 0, 0, [], True
    while len(out) < precision:
        iv = lon_i if even else lat_i
        v = lon if even else lat
        mid = (iv[0] + iv[1]) / 2
        if v >= mid:
            ch, iv[0] = (ch << 1) | 1, mid
        else:
            ch, iv[1] = ch << 1, mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(_B32[ch])
            bits, ch = 0, 0
    return "".join(out)


POINTS = [(37.7749, -122.4194), (34.0522, -118.2437),
          (51.5074, -0.1278), (-33.8688, 151.2093),
          (89.99999, 179.99999), (-90.0, -180.0), (0.0, 0.0),
          (48.8566, 2.3522), (35.6895, 139.6917), (90.0, 180.0),
          (1e-9, -1e-9), (-0.0001, 0.0001)]


@pytest.mark.parametrize("precision", [1, 4, 6, 9, 12])
def test_geohash_matches_interval_halving_reference(spark, precision):
    df = spark.createDataFrame(POINTS, "lat double, lon double")
    got = [r[0] for r in
           df.select(geohash_col(F.col("lat"), F.col("lon"),
                                 precision)).collect()]
    assert got == [_ref_geohash(la, lo, precision) for la, lo in POINTS]


def test_geohash_known_anchor_and_bounds(spark):
    df = spark.createDataFrame([POINTS[0]], "lat double, lon double")
    assert df.select(geohash_col(F.col("lat"), F.col("lon"), 4)
                     ).collect()[0][0] == "9q8y"
    with pytest.raises(ValueError):
        geohash_col(F.col("lat"), F.col("lon"), 0)
    with pytest.raises(ValueError):
        geohash_col(F.col("lat"), F.col("lon"), 13)


def test_haversine_known_distances(spark):
    df = spark.createDataFrame([POINTS[0]], "lat double, lon double")
    sf_la = df.select(haversine_km(F.col("lat"), F.col("lon"),
                                   F.lit(34.0522), F.lit(-118.2437))
                      ).collect()[0][0]
    assert 557.0 < sf_la < 562.0  # SF -> LA, published ~559 km
    zero = df.select(haversine_km(F.col("lat"), F.col("lon"),
                                  F.lit(37.7749), F.lit(-122.4194))
                     ).collect()[0][0]
    assert zero == 0.0


def test_geo_distance_topk_radius_and_order(spark):
    pts = spark.createDataFrame(
        [(1, 37.7749, -122.4194),   # 0 km
         (2, 34.0522, -118.2437),   # ~559 km
         (3, 51.5074, -0.1278),     # London, ~8,616 km — outside radius
         (4, 47.6062, -122.3321)],  # Seattle, ~1,094 km
        "event_id long, lat double, lon double")
    got = geo_distance_topk(pts, 37.7749, -122.4194, k=10,
                            radius_km=3000.0).collect()
    assert [r["event_id"] for r in got] == [1, 2, 4]
    dists = [r["dist_km"] for r in got]
    assert dists == sorted(dists) and dists[0] == 0.0
    # k cuts before radius would
    top1 = geo_distance_topk(pts, 37.7749, -122.4194, k=1).collect()
    assert [r["event_id"] for r in top1] == [1]


def test_geo_bounding_box_inclusive_edges(spark):
    pts = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 10.0, 25.0), (3, 15.0, 20.0),
         (4, 9.9999, 20.0), (5, 10.0, 25.0001)],
        "event_id long, lat double, lon double")
    got = {r["event_id"] for r in
           geo_bounding_box(pts, 10.0, 15.0, 20.0, 25.0).collect()}
    assert got == {1, 2, 3}


def test_geohash_grid_counts_and_order(spark):
    # three points in one ~20km cell, one elsewhere
    pts = spark.createDataFrame(
        [(37.7749, -122.4194, 10.0), (37.7750, -122.4195, 20.0),
         (37.7751, -122.4196, 30.0), (51.5074, -0.1278, 5.0)],
        "lat double, lon double, value double")
    got = geohash_grid(pts, precision=4, value_col="value").collect()
    assert [(r["cell"], r["n"], r["avg_value"]) for r in got] == \
        [("9q8y", 3, 20.0), ("gcpv", 1, 5.0)]


def test_hits_hand_computed_bipartite(spark):
    # 1 -> 10, 2 -> 10, 2 -> 11, 3 -> 11: node 2 is the best hub
    # (points at both authorities); 10 and 11 are symmetric authorities
    e = spark.createDataFrame([(1, 10), (2, 10), (2, 11), (3, 11)],
                              "src long, dst long")
    got = {r["node"]: (r["hub"], r["auth"])
           for r in hits(e, iters=1).collect()}
    s2 = round(2.0 / math.sqrt(8.0), 6)            # auth of 10 and 11
    h2 = round(2 * s2 / math.sqrt(6 * s2 * s2), 6)  # hub of node 2
    h1 = round(s2 / math.sqrt(6 * s2 * s2), 6)      # hub of nodes 1, 3
    assert got[10] == (0.0, s2) and got[11] == (0.0, s2)
    assert got[2] == (h2, 0.0)
    assert got[1] == (h1, 0.0) and got[3] == (h1, 0.0)
    assert got[2][0] > got[1][0]
    with pytest.raises(ValueError):
        hits(e, iters=0)


def test_hits_iterations_converge_toward_principal(spark):
    # a second iteration keeps the hub ordering and the L2 norms at 1
    e = spark.createDataFrame([(1, 10), (2, 10), (2, 11), (3, 11),
                               (3, 12)], "src long, dst long")
    got = hits(e, iters=3).collect()
    hubs = {r["node"]: r["hub"] for r in got}
    assert hubs[2] > hubs[1] and hubs[3] > hubs[1]
    assert sum(r["hub"] ** 2 for r in got) == pytest.approx(1.0, abs=1e-4)
    assert sum(r["auth"] ** 2 for r in got) == pytest.approx(1.0, abs=1e-4)


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    corpus = spark.createDataFrame(tiny_corpus)
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=32)
    return docs.persist(), index.persist(), stats


def test_rank_feature_zero_weight_equals_search(spark, built):
    docs, index, stats = built
    base = search(index, docs, stats, "import return", k=10, stem=False,
                  camel=False, shard_size=32).collect()
    feats = docs.select("doc_id", (F.col("doc_id") * 100.0).alias("feature"))
    got = rank_feature_search(index, docs, stats, "import return", feats,
                              weight=0.0, pivot=50.0, k=10, stem=False,
                              camel=False, shard_size=32).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == \
        [(r["doc_id"], round(r["score"], 9)) for r in base]


def test_rank_feature_pulls_doc_in_from_depth(spark, built):
    docs, index, stats = built
    base = search(index, docs, stats, "import return", k=5, stem=False,
                  camel=False, shard_size=32).collect()
    base_ids = [r["doc_id"] for r in base]
    # give every matched doc OUTSIDE the bm25 top-5 a huge feature; the
    # additive clause must pull one of them to rank 1
    all_match = search(index, docs, stats, "import return", k=10_000,
                       stem=False, camel=False, shard_size=32).collect()
    deep = [r["doc_id"] for r in all_match if r["doc_id"] not in base_ids]
    assert deep, "corpus too small for the depth test"
    feats = spark.createDataFrame([(int(d), 1e6) for d in deep],
                                  "doc_id long, feature double")
    got = rank_feature_search(index, docs, stats, "import return", feats,
                              fn="saturation", pivot=1.0, weight=100.0,
                              k=5, stem=False, camel=False,
                              shard_size=32).collect()
    assert got[0]["doc_id"] in set(deep)
    # docs with no feature row (the old top) keep plain bm25: still
    # present but demoted below every boosted deep doc in the top-5
    assert got[0]["score"] > base[0]["score"]


def test_rank_feature_saturation_matches_formula(spark, built):
    docs, index, stats = built
    base = {r["doc_id"]: r["score"] for r in
            search(index, docs, stats, "import return", k=10_000,
                   stem=False, camel=False, shard_size=32).collect()}
    feats = docs.select("doc_id",
                        (F.col("doc_id") % 7 * 10.0).alias("feature"))
    fmap = {r["doc_id"]: r["feature"] for r in feats.collect()}
    got = rank_feature_search(index, docs, stats, "import return", feats,
                              fn="saturation", pivot=20.0, weight=3.0,
                              k=10, stem=False, camel=False,
                              shard_size=32).collect()
    for r in got:
        f = fmap[r["doc_id"]]
        exp = base[r["doc_id"]] + 3.0 * (f / (f + 20.0))
        assert r["score"] == pytest.approx(exp, rel=1e-12)


def test_rank_feature_validation(spark, built):
    docs, index, stats = built
    feats = docs.select("doc_id", F.lit(1.0).alias("feature"))
    with pytest.raises(ValueError):
        rank_feature_search(index, docs, stats, "import", feats,
                            fn="nope")
    with pytest.raises(ValueError):
        rank_feature_search(index, docs, stats, "import", feats,
                            fn="saturation", pivot=0.0)
    # empty query -> empty frame, no job
    assert rank_feature_search(index, docs, stats, "", feats).count() == 0


def test_pipeline_aggs_frames(spark):
    from index_spark.operators.temporal import pipeline_aggs

    rows = [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0),
            ("b", 1, 5.0)]
    df = spark.createDataFrame(rows, "k string, bucket int, v double")
    got = {(r["k"], r["bucket"]):
           (r["derivative"], r["cumulative"], r["moving_avg"])
           for r in pipeline_aggs(df, value_col="v", ts_col="bucket",
                                  by=["k"], window=2).collect()}
    assert got[("a", 1)] == (None, 10.0, 10.0)
    assert got[("a", 2)] == (20.0, 40.0, 20.0)
    assert got[("a", 3)] == (-10.0, 60.0, 25.0)
    assert got[("b", 1)] == (None, 5.0, 5.0)
    with pytest.raises(ValueError):
        pipeline_aggs(df, value_col="v", ts_col="bucket", window=0)


# ---------------------------------------------------------------------------
# covering-cell pruning, distance rings, left-outer interval join
# ---------------------------------------------------------------------------

def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_covering_cells_superset_property(spark):
    """Every point within the radius falls in a covering cell —
    checked by brute force over a dense grid, including an
    antimeridian-wrapping query and a pole-reaching one."""
    from index_spark.operators.geo import covering_cells

    grid = [(la / 2.0, lo / 2.0) for la in range(-178, 179, 7)
            for lo in range(-358, 359, 11)]
    for qlat, qlon, r, p in [(37.7749, -122.4194, 900.0, 3),
                             (0.0, 179.9, 700.0, 3),     # wraps +/-180
                             (88.5, 10.0, 400.0, 2),      # reaches pole
                             (-45.0, 60.0, 2500.0, 2)]:
        cells = set(covering_cells(qlat, qlon, r, p))
        for la, lo in grid:
            dist = EARTH_R * 2 * math.asin(math.sqrt(
                math.sin(math.radians(qlat - la) / 2) ** 2
                + math.cos(math.radians(la)) * math.cos(math.radians(qlat))
                * math.sin(math.radians(qlon - lo) / 2) ** 2))
            if dist <= r:
                assert _ref_geohash(la, lo, p) in cells, \
                    (qlat, qlon, r, p, la, lo, dist)


EARTH_R = 6371.0088


def test_covering_cells_bounds_and_cap(spark):
    from index_spark.operators.geo import covering_cells

    with pytest.raises(ValueError):
        covering_cells(0.0, 0.0, -1.0, 3)
    with pytest.raises(ValueError):
        covering_cells(0.0, 0.0, 500.0, 8, max_cells=4)
    # a whole-planet radius covers every cell at precision 1
    assert len(covering_cells(0.0, 0.0, 21000.0, 1)) == 32


def test_geo_distance_topk_pruned_equals_exact_and_prunes_partitions(
        spark, tmp_path):
    from index_spark.operators.geo import geo_distance_topk, geohash_col

    pts = spark.range(0, 4000).select(
        F.col("id").alias("event_id"),
        (((F.col("id") * 2654435761) % 1800000) / 10000.0 - 90.0
         ).alias("lat"),
        (((F.col("id") * 2246822519) % 3600000) / 10000.0 - 180.0
         ).alias("lon"))
    stored = pts.withColumn("cell", geohash_col(F.col("lat"),
                                                F.col("lon"), 2))
    path = str(tmp_path / "geo_pts")
    stored.write.partitionBy("cell").parquet(path)
    on_disk = spark.read.parquet(path)

    exact = geo_distance_topk(on_disk, 37.7749, -122.4194, k=50,
                              radius_km=1500.0).collect()
    pruned_q = geo_distance_topk(on_disk, 37.7749, -122.4194, k=50,
                                 radius_km=1500.0, cell_col="cell",
                                 prune_precision=2)
    assert pruned_q.collect() == exact
    plan = _plan(pruned_q)
    assert "PartitionFilters: [cell" in plan.replace("#", " #").replace(
        "cell #", "cell#") or "cell IN" in plan
    # on-the-fly pruning (no stored column) is also identical
    fly = geo_distance_topk(on_disk.drop("cell"), 37.7749, -122.4194,
                            k=50, radius_km=1500.0, prune_precision=2)
    assert fly.collect() == exact
    with pytest.raises(ValueError):
        geo_distance_topk(on_disk, 0, 0, cell_col="cell")
    with pytest.raises(ValueError):
        geo_distance_topk(on_disk, 0, 0, prune_precision=2)


def test_geo_distance_facet_rings(spark):
    from index_spark.operators.geo import geo_distance_facet

    pts = spark.createDataFrame(
        [(37.7749, -122.4194),   # 0 km
         (34.0522, -118.2437),   # ~559 km
         (47.6062, -122.3321),   # ~1,093 km
         (51.5074, -0.1278)],    # ~8,616 km
        "lat double, lon double")
    got = [(r["ring"], r["from_km"], r["to_km"], r["n"]) for r in
           geo_distance_facet(pts, 37.7749, -122.4194,
                              [500.0, 2000.0]).collect()]
    assert got == [("*-500", 0.0, 500.0, 1), ("500-2000", 500.0, 2000.0, 2),
                   ("2000-*", 2000.0, None, 1)]
    with pytest.raises(ValueError):
        geo_distance_facet(pts, 0, 0, [])
    with pytest.raises(ValueError):
        geo_distance_facet(pts, 0, 0, [-1.0, 10.0])


def test_interval_join_left_outer_batch(spark):
    from index_spark.streaming.aggregate import interval_join_stream

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    views = events.where("event_type = 'view'") \
                  .select("user_id", "ts", "event_id")
    buys = events.where("event_type = 'purchase'") \
                 .select("user_id", "ts", "event_id", "value")
    inner = interval_join_stream(views, buys, left_vals=["event_id"],
                                 right_vals=["event_id", "value"])
    outer = interval_join_stream(views, buys, left_vals=["event_id"],
                                 right_vals=["event_id", "value"],
                                 how="left_outer")
    n_views = views.count()
    matched_views = inner.select("l_event_id").distinct().count()
    rows = outer.collect()
    # every view appears; unmatched ones exactly once with NULL right
    null_rows = [r for r in rows if r["r_ts"] is None]
    assert len(null_rows) == n_views - matched_views
    assert all(r["delay_s"] is None and r["r_value"] is None
               for r in null_rows)
    matched = [tuple(map(str, r)) for r in rows if r["r_ts"] is not None]
    assert sorted(matched) == sorted(tuple(map(str, r))
                                     for r in inner.collect())
    with pytest.raises(ValueError):
        interval_join_stream(views, buys, how="full")
