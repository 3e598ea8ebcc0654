"""Spatial operators (operators/spatial.py): geohash cell naming,
haversine geodist, and the cell-pruned radius query (zero false
negatives vs the unpruned scan, including antimeridian and pole
circles).  The spatial_radius gate certifies the distance math against
a DuckDB oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_old_spark.operators.spatial import (
    EARTH_MEAN_RADIUS_KM, geohash_encode, haversine_km, index_points,
    points_in_bbox, points_within_radius)


def test_geohash_known_values():
    # canonical public geohash fixtures
    assert geohash_encode(42.6, -5.6, 5) == "ezs42"
    assert geohash_encode(57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert geohash_encode(0.0, 0.0, 1) == "s"


def test_geohash_prefix_property():
    # a longer geohash refines its prefix cell
    g7 = geohash_encode(48.8566, 2.3522, 7)
    g4 = geohash_encode(48.8566, 2.3522, 4)
    assert g7.startswith(g4)


@pytest.fixture(scope="module")
def pts(spark):
    rows = []
    for i in range(2000):
        lat = (i % 160) - 80 + 0.5
        lon = ((i * 7) % 360) - 180 + 0.5
        rows.append((i, float(lat), float(lon)))
    df = spark.createDataFrame(rows, "id LONG, lat DOUBLE, lon DOUBLE")
    return index_points(df, cell_deg=5.0).persist()


def _ids(df):
    return sorted(r.id for r in df.select("id").collect())


@pytest.mark.parametrize("qlat,qlon,radius", [
    (10.5, 20.5, 2500.0),
    (0.0, 179.5, 3000.0),       # antimeridian wrap
    (88.0, 0.0, 1500.0),        # polar circle (lat prune only)
    (-45.0, -90.0, 800.0),
])
def test_pruned_radius_equals_full_scan(pts, qlat, qlon, radius):
    pruned = points_within_radius(pts, qlat, qlon, radius, cell_deg=5.0)
    full = points_within_radius(pts.drop("cell_x", "cell_y"),
                                qlat, qlon, radius)
    assert _ids(pruned) == _ids(full)


def test_haversine_known_distance(spark):
    # Paris <-> London great-circle distance ~ 343-344 km
    df = spark.range(1).select(
        haversine_km(F.lit(48.8566), F.lit(2.3522),
                     F.lit(51.5074), F.lit(-0.1278)).alias("d"))
    d = df.collect()[0]["d"]
    assert 340 < d < 348


def test_bbox_filter(pts):
    got = points_in_bbox(pts, -10, 10, -20, 20)
    rows = got.select("lat", "lon").collect()
    assert rows and all(-10 <= r.lat <= 10 and -20 <= r.lon <= 20
                        for r in rows)


def test_prune_actually_prunes(pts):
    # the candidate frame after the cell prune is much smaller than the
    # corpus (the collector-side point of the cells)
    pruned = points_within_radius(pts, 10.5, 20.5, 1000.0, cell_deg=5.0)
    # count rows surviving the CELL prune only (drop the refine)
    cells = pts.where(
        F.col("cell_y").between(
            math.floor((10.5 - math.degrees(1000 / EARTH_MEAN_RADIUS_KM))
                       / 5.0),
            math.floor((10.5 + math.degrees(1000 / EARTH_MEAN_RADIUS_KM))
                       / 5.0)))
    assert cells.count() < pts.count() / 4
    assert _ids(pruned) == _ids(points_within_radius(
        pts.drop("cell_x", "cell_y"), 10.5, 20.5, 1000.0))


def test_cell_prune_pushes_to_parquet_scan(spark, pts, tmp_path):
    # storage-level pruning: the cell_y/cell_x predicates must reach the
    # parquet scan as PushedFilters
    path = str(tmp_path / "points_store")
    (pts.repartition("cell_y").sortWithinPartitions("cell_y", "cell_x")
     .write.mode("overwrite").parquet(path))
    loaded = spark.read.parquet(path)
    import re
    plan = (points_within_radius(loaded, 10.5, 20.5, 800.0, cell_deg=5.0)
            ._jdf.queryExecution().executedPlan().toString())
    # the cell range reaches the scan's data filters (the printed filter
    # list is truncated, so match the Filter node's expression)
    assert re.search(r"cell_y#\d+ >= ", plan) and \
        re.search(r"cell_y#\d+ <= ", plan)
    assert re.search(r"DataFilters: \[isnotnull\(cell_y", plan)
