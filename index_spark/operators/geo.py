"""Geo search over point columns — the Elasticsearch geo surface
(``geo_distance`` query/sort, ``geo_bounding_box`` filter,
``geohash_grid`` aggregation) re-expressed as pure Spark SQL
expressions.

Everything here is JVM-side codegen: the haversine distance is plain
trigonometry over double columns, and the geohash is integer bit
arithmetic (quantize → interleave → base32), so geo predicates ride
whole-stage codegen and partition pruning like any other column — no
UDF, no geometry library.

Scale shape (100 TB of points): a distance query is a map-only filter
plus a k-row TakeOrdered; a grid aggregation is one map-side-combinable
groupBy on a low-cardinality cell key (at precision p there are at most
32^p cells).  For repeated radius queries over a static corpus, store
``geohash_col`` as a partition/bucket column: a radius predicate then
prunes to the cells intersecting the circle (the classic geohash
cell-prefix index), the same pruning shape the term dictionary uses for
prefixes.

The geohash layout is the standard public one (Niemeyer 2008, as used
by Elasticsearch/Lucene): bits alternate longitude-first, 5 bits per
base32 character over the alphabet ``0123456789bcdefghjkmnpqrstuvwxyz``.
Quantizing via ``floor((v - min)/span * 2^bits)`` is bit-identical to
the textbook interval-halving loop, which is what makes the encoding a
closed-form SQL expression instead of an iterative UDF.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["haversine_km", "geo_bounding_box", "geo_distance_topk",
           "geohash_col", "geohash_grid", "geohash_duck_ctes",
           "covering_cells", "geo_distance_facet"]

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius
_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def haversine_km(lat1: Column, lon1: Column, lat2: Column,
                 lon2: Column) -> Column:
    """Great-circle distance in km between two (lat, lon) degree pairs.

    Pinned arithmetic contract (shared with the SQL oracle restatement):
    ``2R * asin(sqrt(sin^2(dphi/2) + cos(phi1) cos(phi2) sin^2(dlam/2)))``
    evaluated in exactly this association, so an independent engine
    computing the same expression agrees to double precision.
    """
    dphi = F.radians(lat2 - lat1) / 2.0
    dlam = F.radians(lon2 - lon1) / 2.0
    a = (F.sin(dphi) * F.sin(dphi)
         + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
         * F.sin(dlam) * F.sin(dlam))
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_bounding_box(points: DataFrame, lat_min: float, lat_max: float,
                     lon_min: float, lon_max: float,
                     lat_col: str = "lat", lon_col: str = "lon"
                     ) -> DataFrame:
    """``geo_bounding_box`` filter: rows whose point falls inside the
    [lat_min, lat_max] x [lon_min, lon_max] box (inclusive edges, ES
    semantics). Map-only; the range predicates push to the scan."""
    return points.where(
        (F.col(lat_col) >= F.lit(float(lat_min)))
        & (F.col(lat_col) <= F.lit(float(lat_max)))
        & (F.col(lon_col) >= F.lit(float(lon_min)))
        & (F.col(lon_col) <= F.lit(float(lon_max))))


def geo_distance_topk(points: DataFrame, qlat: float, qlon: float,
                      k: int = 10, radius_km: float | None = None,
                      lat_col: str = "lat", lon_col: str = "lon",
                      id_col: str = "event_id", round_at: int = 4,
                      cell_col: str | None = None,
                      prune_precision: int | None = None) -> DataFrame:
    """``geo_distance`` query + distance sort: the ``k`` points nearest
    to (qlat, qlon), optionally only those within ``radius_km``.
    Returns (id, dist_km) ascending by (dist_km, id).

    The radius test and the ordering both use the ROUNDED distance
    (``round_at`` decimals) so the boundary and tie behavior are exactly
    restatable by an independent engine — last-ulp trig differences
    cannot flip a row in or out.

    Scale path: with ``radius_km`` set and ``cell_col`` naming a stored
    :func:`geohash_col` column (``prune_precision`` = its precision),
    the query first filters to :func:`covering_cells` of the circle —
    on a table PARTITIONED by that column the literal IN-list becomes a
    partition filter and only intersecting cells are scanned; the exact
    haversine test keeps results identical (pytest-pinned). Passing
    ``prune_precision`` without ``cell_col`` computes the cell on the
    fly (no partition pruning, but the same covering-set semantics).
    """
    if cell_col is not None and prune_precision is None:
        raise ValueError("cell_col requires prune_precision (the "
                         "precision the stored cells were encoded at)")
    out = points
    if prune_precision is not None:
        if radius_km is None:
            raise ValueError("prune_precision requires radius_km")
        cells = covering_cells(qlat, qlon, float(radius_km),
                               prune_precision)
        cell = (F.col(cell_col) if cell_col is not None
                else geohash_col(F.col(lat_col), F.col(lon_col),
                                 prune_precision))
        out = out.where(cell.isin(cells))
    d = F.round(haversine_km(F.col(lat_col), F.col(lon_col),
                             F.lit(float(qlat)), F.lit(float(qlon))),
                round_at)
    out = out.select(F.col(id_col), d.alias("dist_km"))
    if radius_km is not None:
        out = out.where(F.col("dist_km") <= F.lit(float(radius_km)))
    return out.orderBy(F.asc("dist_km"), F.asc(id_col)).limit(k)


def _bit_plan(precision: int) -> tuple[int, int, int]:
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in 1..12, got {precision}")
    total = 5 * precision
    lon_bits = (total + 1) // 2  # longitude gets the extra bit
    lat_bits = total // 2
    return total, lon_bits, lat_bits


def geohash_col(lat: Column, lon: Column, precision: int = 6) -> Column:
    """Base32 geohash string of a (lat, lon) degree pair at ``precision``
    characters — closed-form quantize + bit-interleave, pure codegen.

    Points exactly on the north pole / antimeridian edge clamp into the
    last cell (the encoder's half-open intervals made closed at the top),
    matching the reference interval-halving encoders.
    """
    total, lon_bits, lat_bits = _bit_plan(precision)
    lon_q = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0)
                * F.lit(float(1 << lon_bits))).cast("long"),
        F.lit((1 << lon_bits) - 1))
    lat_q = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0)
                * F.lit(float(1 << lat_bits))).cast("long"),
        F.lit((1 << lat_bits) - 1))
    parts = []
    for i in range(lon_bits):  # lon occupies even positions from the MSB
        parts.append(F.shiftleft(
            F.shiftright(lon_q, lon_bits - 1 - i).bitwiseAND(F.lit(1)),
            total - 1 - 2 * i))
    for i in range(lat_bits):
        parts.append(F.shiftleft(
            F.shiftright(lat_q, lat_bits - 1 - i).bitwiseAND(F.lit(1)),
            total - 2 - 2 * i))
    code = reduce(lambda a, b: a + b, parts)
    chars = [
        F.substring(F.lit(_B32),
                    (F.shiftright(code, total - 5 * (j + 1))
                     .bitwiseAND(F.lit(31)) + F.lit(1)).cast("int"),
                    F.lit(1))
        for j in range(precision)
    ]
    return F.concat(*chars)


def geohash_grid(points: DataFrame, precision: int = 4,
                 lat_col: str = "lat", lon_col: str = "lon",
                 value_col: str | None = None, limit: int | None = None
                 ) -> DataFrame:
    """``geohash_grid`` aggregation: bucket points by geohash cell and
    count them (plus the mean of ``value_col`` when given). Returns
    (cell, n[, avg_value]) ordered by (n desc, cell asc) — the ES
    bucket order with a deterministic tiebreak.

    One map-side-combinable groupBy on a <= 32^precision-cardinality
    key; the cell expression itself is codegen (no UDF), so this is the
    same plan shape as any low-cardinality terms aggregation.
    """
    cell = geohash_col(F.col(lat_col), F.col(lon_col), precision)
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.round(F.avg(F.col(value_col)), 4).alias("avg_value"))
    out = (points.groupBy(cell.alias("cell")).agg(*aggs)
           .orderBy(F.desc("n"), F.asc("cell")))
    return out.limit(limit) if limit is not None else out


def geohash_duck_ctes(lat_expr: str, lon_expr: str, precision: int,
                      source: str, keep: str = "*") -> str:
    """The same geohash as :func:`geohash_col`, emitted as a DuckDB CTE
    chain — the oracle restatement an independent engine runs to
    value-check the Spark encoding. Returns CTE text (no leading WITH)
    defining ``gh_cells`` = ``SELECT {keep}, cell FROM {source}``, with
    the quantization and the interleaved code each computed once in an
    intermediate CTE rather than inlined per character."""
    total, lon_bits, lat_bits = _bit_plan(precision)
    lon_q = (f"least(CAST(floor((({lon_expr}) + 180.0) / 360.0 * "
             f"{float(1 << lon_bits)!r}) AS BIGINT), {(1 << lon_bits) - 1})")
    lat_q = (f"least(CAST(floor((({lat_expr}) + 90.0) / 180.0 * "
             f"{float(1 << lat_bits)!r}) AS BIGINT), {(1 << lat_bits) - 1})")
    parts = [f"(((lonq >> {lon_bits - 1 - i}) & 1) << {total - 1 - 2 * i})"
             for i in range(lon_bits)]
    parts += [f"(((latq >> {lat_bits - 1 - i}) & 1) << {total - 2 - 2 * i})"
              for i in range(lat_bits)]
    chars = [f"substr('{_B32}', CAST(((code >> {total - 5 * (j + 1)}) & 31) "
             f"AS INT) + 1, 1)" for j in range(precision)]
    return f"""
gh_q AS (
  SELECT {keep}, {lon_q} AS lonq, {lat_q} AS latq FROM {source}
), gh_code AS (
  SELECT {keep}, {' + '.join(parts)} AS code FROM gh_q
), gh_cells AS (
  SELECT {keep}, {' || '.join(chars)} AS cell FROM gh_code
)"""


def covering_cells(qlat: float, qlon: float, radius_km: float,
                   precision: int, max_cells: int = 4096) -> list[str]:
    """The geohash cells (at ``precision``) that together cover the
    radius-``radius_km`` circle around (qlat, qlon) — the pruning set a
    radius query pushes into a ``cell IN (...)`` predicate so a corpus
    PARTITIONED/bucketed by :func:`geohash_col` scans only the
    intersecting cells (the classic geohash prefix index; at 100 TB of
    points this is the difference between a full scan and touching a
    handful of partitions).

    Conservative by construction: the circle's lat/lon bounding box is
    padded by one cell on every side, so every point within the radius
    is guaranteed to land in a returned cell (over-coverage only costs
    scan width; the exact haversine filter downstream keeps results
    exact). Caps that reach a pole or wrap the antimeridian fall back
    to full longitude coverage / modular wrapping. Raises when the set
    would exceed ``max_cells`` — lower the precision instead of
    shipping a megacell literal into the plan.
    """
    if radius_km < 0:
        raise ValueError(f"radius_km must be >= 0, got {radius_km}")
    total, lon_bits, lat_bits = _bit_plan(precision)
    nlat, nlon = 1 << lat_bits, 1 << lon_bits
    ang = radius_km / EARTH_RADIUS_KM
    dlat = math.degrees(ang)
    lat_lo, lat_hi = qlat - dlat, qlat + dlat
    pole = lat_lo <= -90.0 or lat_hi >= 90.0 or ang >= math.pi / 2
    lat_lo, lat_hi = max(lat_lo, -90.0), min(lat_hi, 90.0)

    def _lat_idx(lat: float) -> int:
        return min(int((lat + 90.0) / 180.0 * nlat), nlat - 1)

    i_lo = max(_lat_idx(lat_lo) - 1, 0)
    i_hi = min(_lat_idx(lat_hi) + 1, nlat - 1)

    if pole:
        j_range = range(nlon)
    else:
        # max longitude deviation of a spherical cap occurs at the
        # latitude in range closest to a pole (smallest cosine)
        min_cos = min(math.cos(math.radians(lat_lo)),
                      math.cos(math.radians(lat_hi)))
        s = math.sin(ang) / max(min_cos, 1e-12)
        if s >= 1.0:
            j_range = range(nlon)
        else:
            dlon = math.degrees(math.asin(s))
            j_lo = int(math.floor((qlon - dlon + 180.0) / 360.0 * nlon)) - 1
            j_hi = int(math.floor((qlon + dlon + 180.0) / 360.0 * nlon)) + 1
            if j_hi - j_lo + 1 >= nlon:
                j_range = range(nlon)
            else:
                j_range = range(j_lo, j_hi + 1)  # wrapped modulo below

    n_cells = (i_hi - i_lo + 1) * len(j_range)
    if n_cells > max_cells:
        raise ValueError(
            f"covering set would be {n_cells} cells (> {max_cells}); "
            f"use a coarser precision than {precision}")
    cells = set()
    for i in range(i_lo, i_hi + 1):
        for j in j_range:
            cells.add(_encode_quantized(i, j % nlon, precision))
    return sorted(cells)


def _encode_quantized(lat_q: int, lon_q: int, precision: int) -> str:
    """base32 geohash from already-quantized cell indices — the same
    bit interleave as :func:`geohash_col`, driver-side."""
    total, lon_bits, lat_bits = _bit_plan(precision)
    code = 0
    for i in range(lon_bits):
        code |= ((lon_q >> (lon_bits - 1 - i)) & 1) << (total - 1 - 2 * i)
    for i in range(lat_bits):
        code |= ((lat_q >> (lat_bits - 1 - i)) & 1) << (total - 2 - 2 * i)
    return "".join(_B32[(code >> (total - 5 * (j + 1))) & 31]
                   for j in range(precision))


def geo_distance_facet(points: DataFrame, qlat: float, qlon: float,
                       edges_km: list[float], lat_col: str = "lat",
                       lon_col: str = "lon", round_at: int = 4
                       ) -> DataFrame:
    """``geo_distance`` aggregation (ES distance rings): bucket points
    by haversine distance from (qlat, qlon) into the half-open rings
    [0, e1), [e1, e2), ..., [en, inf) and count each ring. Returns
    (ring, from_km, to_km, n) ordered by from_km; ``to_km`` is NULL for
    the open outer ring. Empty rings are omitted (ES keeps them; a
    LEFT JOIN against the ring table restores them if needed).

    One map-side-combinable groupBy on a |edges|+1-cardinality key —
    the same plan shape as a histogram facet. Ring membership tests the
    ROUNDED distance so boundaries are engine-independent.
    """
    edges = sorted(float(e) for e in edges_km)
    if not edges or edges[0] <= 0:
        raise ValueError("edges_km must be non-empty and positive")
    d = F.round(haversine_km(F.col(lat_col), F.col(lon_col),
                             F.lit(float(qlat)), F.lit(float(qlon))),
                round_at)
    ring = F.when(d < F.lit(edges[0]),
                  F.lit(f"*-{edges[0]:g}"))
    for lo, hi in zip(edges, edges[1:]):
        ring = ring.when(d < F.lit(hi), F.lit(f"{lo:g}-{hi:g}"))
    ring = ring.otherwise(F.lit(f"{edges[-1]:g}-*"))
    frm = F.when(d < F.lit(edges[0]), F.lit(0.0))
    for lo, hi in zip(edges, edges[1:]):
        frm = frm.when(d < F.lit(hi), F.lit(lo))
    frm = frm.otherwise(F.lit(edges[-1]))
    to = F.when(d < F.lit(edges[0]), F.lit(edges[0]))
    for lo, hi in zip(edges, edges[1:]):
        to = to.when(d < F.lit(hi), F.lit(hi))
    to = to.otherwise(F.lit(None).cast("double"))
    return (points
            .select(ring.alias("ring"), frm.alias("from_km"),
                    to.alias("to_km"))
            .groupBy("ring", "from_km", "to_km")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.asc("from_km")))


# --------------------------------------------------------------- geotile

_MERC_LAT_MAX = 85.05112878  # Web-Mercator latitude clamp (EPSG:3857)


def geotile_xy(lat: Column, lon: Column, zoom: int) -> tuple[Column,
                                                             Column]:
    """Web-Mercator tile indices (x, y) at ``zoom`` — the standard
    slippy-map / ES ``geotile_grid`` layout: ``x = floor((lon+180)/360
    * 2^z)``, ``y = floor((1 - asinh(tan(lat))/pi) / 2 * 2^z)``, with
    latitude clamped to +-85.05112878 and indices clamped to
    [0, 2^z - 1]. Pure codegen trigonometry — no UDF."""
    if not 0 <= zoom <= 29:
        raise ValueError("zoom must be in [0, 29]")
    n = float(1 << zoom)
    hi = F.lit(1 << zoom) - 1
    lat_c = F.greatest(F.least(lat, F.lit(_MERC_LAT_MAX)),
                       F.lit(-_MERC_LAT_MAX))
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    x = F.greatest(F.least(x, hi), F.lit(0)).cast("long")
    rad = F.radians(lat_c)
    # asinh(tan(lat)) spelled with ln (DuckDB-restatable 1:1)
    merc = F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
    y = F.floor((F.lit(1.0) - merc / F.lit(math.pi)) / F.lit(2.0)
                * F.lit(n))
    y = F.greatest(F.least(y, hi), F.lit(0)).cast("long")
    return x, y


def geotile_col(lat: Column, lon: Column, zoom: int) -> Column:
    """``geotile_grid`` cell key ``"z/x/y"`` (the ES bucket key)."""
    x, y = geotile_xy(lat, lon, zoom)
    return F.concat_ws("/", F.lit(str(zoom)), x.cast("string"),
                       y.cast("string"))


def geotile_grid(points: DataFrame, zoom: int = 6,
                 lat_col: str = "lat", lon_col: str = "lon",
                 value_col: str | None = None, limit: int | None = None
                 ) -> DataFrame:
    """ES ``geotile_grid`` aggregation: bucket points by Web-Mercator
    tile and count (plus mean of ``value_col`` when given). Returns
    (cell, n[, avg_value]) ordered by (n desc, cell asc).

    Same 100-TB shape as :func:`geohash_grid`: the cell key is closed-
    form codegen, the aggregation one map-side-combinable groupBy on a
    <= 4^zoom-cardinality key."""
    cell = geotile_col(F.col(lat_col), F.col(lon_col), zoom)
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.round(F.avg(F.col(value_col)), 4).alias("avg_value"))
    out = (points.groupBy(cell.alias("cell")).agg(*aggs)
           .orderBy(F.desc("n"), F.asc("cell")))
    return out.limit(limit) if limit is not None else out


def geotile_duck_expr(lat_expr: str, lon_expr: str, zoom: int) -> str:
    """The same ``z/x/y`` key as :func:`geotile_col` as a DuckDB SQL
    expression — the independent restatement oracles run."""
    n = float(1 << zoom)
    hi = (1 << zoom) - 1
    lat_c = (f"greatest(least({lat_expr}, {_MERC_LAT_MAX}), "
             f"-{_MERC_LAT_MAX})")
    x = (f"greatest(least(CAST(floor((({lon_expr}) + 180.0) / 360.0 * "
         f"{n!r}) AS BIGINT), {hi}), 0)")
    y = (f"greatest(least(CAST(floor((1.0 - ln(tan(radians({lat_c})) + "
         f"1.0 / cos(radians({lat_c}))) / pi()) / 2.0 * {n!r}) "
         f"AS BIGINT), {hi}), 0)")
    return f"'{zoom}' || '/' || CAST({x} AS VARCHAR) || '/' || CAST({y} AS VARCHAR)"


# --------------------------------------------------------------- polygon

def point_in_polygon(lat: Column, lon: Column,
                     polygon: list[tuple[float, float]]) -> Column:
    """Even-odd (ray-casting) point-in-polygon test as a pure codegen
    boolean — the ES ``geo_polygon`` query predicate. ``polygon`` is a
    bounded list of (lat, lon) vertices (closing edge implied), treated
    planar in (lon, lat) space exactly like the classic Lucene/ES
    geo_polygon filter; it is NOT antimeridian-aware (split such
    polygons into two, as ES requires).

    The crossing count unrolls to one CASE expression per edge summed
    JVM-side (polygons are query constants, so the bounded unroll keeps
    the whole predicate inside whole-stage codegen — the same trick as
    the ring facet), making the exact same arithmetic restatable by an
    independent SQL engine."""
    if len(polygon) < 3:
        raise ValueError("polygon needs at least 3 vertices")
    crossings = None
    m = len(polygon)
    for i in range(m):
        y1, x1 = (float(v) for v in polygon[i])
        y2, x2 = (float(v) for v in polygon[(i + 1) % m])
        if y1 == y2:
            continue  # horizontal edge: never crosses a horizontal ray
        straddles = (F.lit(y1) > lat) != (F.lit(y2) > lat)
        x_at = (F.lit(x2 - x1) * (lat - F.lit(y1)) / F.lit(y2 - y1)
                + F.lit(x1))
        c = F.when(straddles & (lon < x_at), F.lit(1)).otherwise(F.lit(0))
        crossings = c if crossings is None else crossings + c
    if crossings is None:
        raise ValueError("polygon is degenerate (all edges horizontal)")
    return crossings % F.lit(2) == F.lit(1)


def geo_polygon_filter(points: DataFrame,
                       polygon: list[tuple[float, float]],
                       lat_col: str = "lat", lon_col: str = "lon"
                       ) -> DataFrame:
    """ES ``geo_polygon`` query: rows whose point falls inside
    ``polygon``. Map-only codegen filter — at 100 TB this is a plain
    pushed predicate scan (pre-filter by the polygon's bounding box
    against a cell partition column for pruning, as with radius
    queries)."""
    return points.filter(point_in_polygon(F.col(lat_col), F.col(lon_col),
                                          polygon))


def polygon_duck_expr(lat_expr: str, lon_expr: str,
                      polygon: list[tuple[float, float]]) -> str:
    """The same even-odd test as :func:`point_in_polygon` as a DuckDB
    boolean expression (independent restatement for oracles)."""
    terms = []
    m = len(polygon)
    for i in range(m):
        y1, x1 = (float(v) for v in polygon[i])
        y2, x2 = (float(v) for v in polygon[(i + 1) % m])
        if y1 == y2:
            continue
        terms.append(
            f"(CASE WHEN (({y1!r} > ({lat_expr})) <> ({y2!r} > ({lat_expr})))"
            f" AND (({lon_expr}) < ({x2 - x1!r}) * (({lat_expr}) - {y1!r})"
            f" / ({y2 - y1!r}) + {x1!r}) THEN 1 ELSE 0 END)")
    return "((" + " + ".join(terms) + ") % 2 = 1)"


# ------------------------------------------------------ centroid / bounds

def geo_centroid(points: DataFrame, by: str | None = None,
                 lat_col: str = "lat", lon_col: str = "lon",
                 round_at: int = 4) -> DataFrame:
    """ES ``geo_centroid`` aggregation: the arithmetic mean of lat and
    lon per bucket (the documented ES semantics — planar averaging, not
    spherical), plus the point count.  One map-side-combinable
    aggregate; with ``by`` the exchange is bounded by the bucket-key
    cardinality.  Returns ([by,] centroid_lat, centroid_lon, n)."""
    aggs = [F.round(F.avg(F.col(lat_col)), round_at).alias("centroid_lat"),
            F.round(F.avg(F.col(lon_col)), round_at).alias("centroid_lon"),
            F.count(F.lit(1)).alias("n")]
    if by is None:
        return points.agg(*aggs)
    return points.groupBy(by).agg(*aggs).orderBy(F.asc(by))


def geo_bounds(points: DataFrame, by: str | None = None,
               lat_col: str = "lat", lon_col: str = "lon",
               round_at: int = 4) -> DataFrame:
    """ES ``geo_bounds`` aggregation (``wrap_longitude=false`` planar
    form): the tightest lat/lon envelope per bucket —
    (top = max lat, bottom = min lat, left = min lon, right = max lon).
    Same one-pass fused min/max aggregate shape as
    :func:`geo_centroid`."""
    la, lo = F.col(lat_col), F.col(lon_col)
    aggs = [F.round(F.max(la), round_at).alias("top"),
            F.round(F.min(la), round_at).alias("bottom"),
            F.round(F.min(lo), round_at).alias("left"),
            F.round(F.max(lo), round_at).alias("right")]
    if by is None:
        return points.agg(*aggs)
    return points.groupBy(by).agg(*aggs).orderBy(F.asc(by))


def geo_line(points: DataFrame, lat_col: str = "lat",
             lon_col: str = "lon", sort_col: str = "ts",
             by: str | None = None, size: int = 100,
             round_at: int = 4) -> DataFrame:
    """ES ``geo_line`` aggregation: per bucket, the track — points
    ordered by ``sort_col``, truncated to the FIRST ``size`` (the ES
    cap), serialized as ``"lon lat;lon lat;..."`` (engine-neutral
    string form, so an independent SQL engine restates it
    byte-for-byte).  One bucket-key window pass; rows past the cap
    drop before the string fold, so per-bucket state is ≤ size
    points."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    from pyspark.sql import Window

    keys = [by] if by else []
    w = Window.partitionBy(*keys).orderBy(F.asc(sort_col),
                                          F.asc(lat_col), F.asc(lon_col))
    # %.Nf formatting (not round+cast): double->string casting drifts
    # into scientific notation near zero ("1.0E-4"), printf doesn't —
    # and both engines format the same double to the same digits
    fmt = f"%.{round_at}f"
    pt = F.concat_ws(
        " ",
        F.format_string(fmt, F.col(lon_col).cast("double")),
        F.format_string(fmt, F.col(lat_col).cast("double")))
    ranked = (points.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= size))
    out = (ranked.groupBy(*keys)
           .agg(F.concat_ws(
               ";", F.array_sort(F.collect_list(
                   F.struct(F.col("_rn").alias("rn"),
                            pt.alias("pt")))).getField("pt"))
               .alias("line"),
               F.count(F.lit(1)).alias("n_points")))
    return out.orderBy(*keys) if keys else out
