"""Spatial search — point indexing, bbox/radius filters, geodist.

Reference: ``lucene/spatial/src/java/org/apache/lucene/spatial/`` (the
RecursivePrefixTreeStrategy + GeohashPrefixTree point strategy) and
Solr's ``geodist()`` (``solr/.../function/distance/HaversineConstFunction
.java`` — haversine over the mean earth radius, spatial4j
``DistanceUtils.EARTH_MEAN_RADIUS_KM`` = 6371.0087714).

Spark-first translation: the prefix tree's job — prune candidate cells
before the exact check — maps to integer grid cells materialized as
columns.  ``index_points`` stamps ``(cell_x, cell_y)`` at a chosen
resolution; a radius query prunes with a BETWEEN over the cells covering
the query circle's bounding box (a pushed-down, row-group-prunable scan
predicate — the 100-TB path when the store is sorted/partitioned by
cell), then refines with the exact haversine.  No false negatives by
construction: the bbox covers the circle, and the cell ranges cover the
bbox (with an antimeridian split and a pole guard).

``geohash_encode`` ships the GeohashPrefixTree's cell naming (the
standard public geohash algorithm spatial4j implements) for
interoperability and prefix-aggregated heatmaps.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["EARTH_MEAN_RADIUS_KM", "haversine_km", "geohash_encode",
           "geohash_col", "index_points", "points_in_bbox",
           "points_within_radius", "heatmap_facet"]

EARTH_MEAN_RADIUS_KM = 6371.0087714   # spatial4j DistanceUtils


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in km (HaversineConstFunction semantics):
    2R * asin(sqrt(sin^2(dLat/2) + cos(lat1) cos(lat2) sin^2(dLon/2)))."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = (F.radians(lat2) - F.radians(lat1)) / 2
    dlon = (F.radians(lon2) - F.radians(lon1)) / 2
    a = (F.sin(dlat) * F.sin(dlat)
         + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon))
    return F.lit(2.0 * EARTH_MEAN_RADIUS_KM) * F.asin(F.sqrt(a))


_GH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: float, lon: float, precision: int = 12) -> str:
    """Standard geohash (the GeohashPrefixTree cell id at level
    ``precision``); pure Python, bit-interleaved base32."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < precision * 5:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(0, len(bits), 5):
        v = 0
        for b in bits[i:i + 5]:
            v = (v << 1) | b
        out.append(_GH_BASE32[v])
    return "".join(out)


def geohash_col(df: DataFrame, lat_col: str, lon_col: str,
                precision: int = 7, out_col: str = "geohash") -> DataFrame:
    """Vectorized geohash column (Arrow-batched pandas UDF)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def gh(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series([geohash_encode(a, o, precision)
                          for a, o in zip(lat, lon)])

    return df.withColumn(out_col, gh(F.col(lat_col), F.col(lon_col)))


def index_points(points: DataFrame, lat_col: str = "lat",
                 lon_col: str = "lon",
                 cell_deg: float = 1.0) -> DataFrame:
    """Stamp integer grid cells (the flat prefix-tree level): cell_x =
    floor(lon/cell_deg), cell_y = floor(lat/cell_deg).  Catalyst-only."""
    return (points
            .withColumn("cell_x",
                        F.floor(F.col(lon_col) / F.lit(cell_deg))
                        .cast("int"))
            .withColumn("cell_y",
                        F.floor(F.col(lat_col) / F.lit(cell_deg))
                        .cast("int")))


def points_in_bbox(points: DataFrame, lat_min: float, lat_max: float,
                   lon_min: float, lon_max: float,
                   lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """SpatialOperation.Intersects with a rectangle — plain Catalyst
    range predicates (pushed to the scan)."""
    return points.where(
        F.col(lat_col).between(lat_min, lat_max)
        & F.col(lon_col).between(lon_min, lon_max))


def points_within_radius(points: DataFrame, qlat: float, qlon: float,
                         radius_km: float, lat_col: str = "lat",
                         lon_col: str = "lon", cell_deg: float = 1.0,
                         dist_col: str = "dist_km") -> DataFrame:
    """Cell-pruned radius query: prune to the grid cells covering the
    circle's bounding box, then exact-haversine refine; appends the
    distance column.  Call on an ``index_points`` frame (falls back to a
    pure refine when the cell columns are absent)."""
    dlat = math.degrees(radius_km / EARTH_MEAN_RADIUS_KM)
    lat_lo, lat_hi = qlat - dlat, qlat + dlat
    pruned = points
    if "cell_x" in points.columns and "cell_y" in points.columns:
        cy_lo = math.floor(max(lat_lo, -90.0) / cell_deg)
        cy_hi = math.floor(min(lat_hi, 90.0) / cell_deg)
        cond = F.col("cell_y").between(cy_lo, cy_hi)
        if lat_lo > -90.0 and lat_hi < 90.0:
            # circle excludes the poles: longitude pruning is sound
            cos_min = min(math.cos(math.radians(lat_lo)),
                          math.cos(math.radians(lat_hi)))
            dlon = math.degrees(radius_km
                                / (EARTH_MEAN_RADIUS_KM * cos_min))
            lon_lo, lon_hi = qlon - dlon, qlon + dlon
            if dlon < 180.0:
                if lon_lo >= -180.0 and lon_hi <= 180.0:
                    cond = cond & F.col("cell_x").between(
                        math.floor(lon_lo / cell_deg),
                        math.floor(lon_hi / cell_deg))
                else:
                    # antimeridian wrap: two ranges
                    west = lon_lo + 360.0 if lon_lo < -180.0 else lon_lo
                    east = lon_hi - 360.0 if lon_hi > 180.0 else lon_hi
                    cond = cond & (
                        (F.col("cell_x") >= math.floor(west / cell_deg))
                        | (F.col("cell_x") <= math.floor(east / cell_deg)))
        pruned = points.where(cond)
    dist = haversine_km(F.col(lat_col), F.col(lon_col),
                        F.lit(qlat), F.lit(qlon))
    return (pruned.withColumn(dist_col, dist)
            .where(F.col(dist_col) <= radius_km))


def heatmap_facet(points: DataFrame, lat_min: float, lat_max: float,
                  lon_min: float, lon_max: float, cell_deg: float = 1.0,
                  lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """(cell_y, cell_x, cnt) — the Solr spatial heatmap facet
    (``facet.heatmap`` / ``HeatmapFacetCounter.java``): 2D grid counts of
    points inside a bbox at a chosen grid level.  One pushed-down bbox
    scan + one map-side-combinable groupBy — the plan shape that holds at
    any corpus size."""
    inside = points_in_bbox(points, lat_min, lat_max, lon_min, lon_max,
                            lat_col, lon_col)
    return (inside
            .groupBy(F.floor(F.col(lat_col) / F.lit(cell_deg))
                     .cast("int").alias("cell_y"),
                     F.floor(F.col(lon_col) / F.lit(cell_deg))
                     .cast("int").alias("cell_x"))
            .agg(F.count("*").alias("cnt"))
            .orderBy("cell_y", "cell_x"))
