"""Geo operators: shapefile parsing, geo_within ray-cast, ST-DBSCAN."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from compss_python_spark.geo import geo_within, read_shapefile, stdbscan
from compss_python_spark.geo.geo import polygons_from_rings


def _write_shp(path, rings):
    """Write a minimal ESRI shapefile (Polygon, type 5) for round-trip tests."""
    records = b""
    for i, ring in enumerate(rings):
        xs, ys = [p[0] for p in ring], [p[1] for p in ring]
        payload = struct.pack("<i", 5)
        payload += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
        payload += struct.pack("<ii", 1, len(ring))
        payload += struct.pack("<i", 0)
        for x, y in ring:
            payload += struct.pack("<dd", x, y)
        records += struct.pack(">ii", i + 1, len(payload) // 2) + payload
    header = struct.pack(">i", 9994) + b"\x00" * 20
    header += struct.pack(">i", (100 + len(records)) // 2)
    header += struct.pack("<ii", 1000, 5)
    header += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(header + records)


def _write_dbf(path, names, rows):
    """Minimal dBASE III writer: all fields C(16)."""
    flen = 16
    fields = b""
    for n in names:
        fields += n.encode().ljust(11, b"\x00") + b"C" + b"\x00" * 4 + bytes([flen]) + b"\x00" * 15
    header_len = 32 + len(fields) + 1
    record_len = 1 + flen * len(names)
    header = struct.pack("<BBBBIHH", 3, 24, 1, 1, len(rows), header_len, record_len)
    header += b"\x00" * 20 + fields + b"\x0d"
    recs = b""
    for row in rows:
        recs = recs + b" " + b"".join(str(v).encode().ljust(flen)[:flen] for v in row)
    with open(path, "wb") as f:
        f.write(header + recs + b"\x1a")


SQUARE = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
# Concave "L" polygon: unit test for the even-odd rule beyond rectangles.
ELL = [(0.0, 0.0), (6.0, 0.0), (6.0, 2.0), (2.0, 2.0), (2.0, 6.0), (0.0, 6.0)]


def test_shapefile_roundtrip(spark, tmp_path):
    shp, dbf = str(tmp_path / "t.shp"), str(tmp_path / "t.dbf")
    _write_shp(shp, [SQUARE, ELL])
    _write_dbf(dbf, ["NAME"], [["square"], ["ell"]])
    df = read_shapefile(spark, shp, dbf)
    rows = {r["geom_id"]: r for r in df.collect()}
    assert rows[0]["NAME"] == "square"
    assert [(p["x"], p["y"]) for p in rows[0]["points"]] == SQUARE
    assert [(p["x"], p["y"]) for p in rows[1]["points"]] == ELL


def test_shapefile_dbf_count_mismatch(spark, tmp_path):
    import pytest as _pytest

    shp, dbf = str(tmp_path / "m.shp"), str(tmp_path / "m.dbf")
    _write_shp(shp, [SQUARE, ELL])
    _write_dbf(dbf, ["NAME"], [["only_one"]])  # 1 live record vs 2 shapes
    with _pytest.raises(ValueError, match="cannot be aligned"):
        read_shapefile(spark, shp, dbf)


def _ray_cast(px, py, ring):
    inside = False
    n = len(ring)
    for i in range(n):
        (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % n]
        if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


def test_geo_within_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    pts = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(-2, 12, (300, 2)))]
    pdf = spark.createDataFrame(pts, "id long, px double, py double")
    polys = polygons_from_rings(spark, [SQUARE, ELL])
    got = {
        (r["id"], r["geom_id"])
        for r in geo_within(pdf, polys, lat_col="py", lon_col="px").collect()
    }
    want = {
        (i, g)
        for i, x, y in pts
        for g, ring in enumerate([SQUARE, ELL])
        if _ray_cast(x, y, ring)
    }
    assert got == want
    assert any(g == 1 for _, g in want)  # concave polygon exercised


def test_geo_within_concave_notch_excluded(spark):
    # (4, 4) is inside ELL's bounding box but outside the L shape.
    pdf = spark.createDataFrame([(1, 4.0, 4.0), (2, 1.0, 1.0)], "id long, px double, py double")
    polys = polygons_from_rings(spark, [ELL])
    got = [r["id"] for r in geo_within(pdf, polys, lat_col="py", lon_col="px").collect()]
    assert got == [2]


def test_stdbscan_separates_time_blobs(spark):
    """Two blobs at the SAME location, 1 hour apart → separate clusters;
    plain DBSCAN on space alone would merge them."""
    rng = np.random.default_rng(11)
    a = [(i, float(x), float(y), 0.0 + rng.uniform(0, 60)) for i, (x, y) in enumerate(rng.normal(0, 0.3, (30, 2)))]
    b = [(100 + i, float(x), float(y), 3600.0 + rng.uniform(0, 60)) for i, (x, y) in enumerate(rng.normal(0, 0.3, (30, 2)))]
    noise = [(200, 50.0, 50.0, 0.0)]
    df = spark.createDataFrame(a + b + noise, "point_id long, x double, y double, t double")
    out = stdbscan(df, ["x", "y"], "t", eps_spatial=1.0, eps_temporal=300.0, min_pts=5)
    rows = {r["point_id"]: r["cluster"] for r in out.collect()}
    ca = {rows[i] for i, *_ in a}
    cb = {rows[i] for i, *_ in b}
    assert len(ca) == 1 and len(cb) == 1 and ca != cb
    assert -1 not in ca | cb
    assert rows[200] == -1


def test_stdbscan_merges_across_grid_cells(spark):
    """A dense line of points crossing many grid cells stays one cluster."""
    pts = [(i, i * 0.4, 0.0, float(i)) for i in range(50)]
    df = spark.createDataFrame(pts, "point_id long, x double, y double, t double")
    out = stdbscan(df, ["x", "y"], "t", eps_spatial=0.5, eps_temporal=10.0, min_pts=3)
    clusters = {r["cluster"] for r in out.collect()}
    assert clusters == {0}


def test_geohash_reference_vectors(spark):
    from compss_python_spark.geo.geo import geohash_expr
    from pyspark.sql import functions as F

    # classic published geohash test vectors
    df = spark.createDataFrame(
        [
            (57.64911, 10.40744, "u4pruydq"),
            (38.897, -77.036, "dqcjr0bp"),
            (-33.8688, 151.2093, "r3gx2f77"),
            (0.0, 0.0, "s0000000"),
        ],
        ["lat", "lon", "want"],
    )
    bad = df.select(
        geohash_expr("lat", "lon", 8).alias("gh"), "want"
    ).filter(F.col("gh") != F.col("want")).count()
    assert bad == 0
    # prefix property: nearby points share a prefix
    near = spark.createDataFrame(
        [(57.64911, 10.40744), (57.649, 10.407)], ["lat", "lon"]
    ).select(geohash_expr("lat", "lon", 8).alias("gh")).collect()
    assert near[0]["gh"][:5] == near[1]["gh"][:5]
    import pytest as _pt
    with _pt.raises(ValueError, match="precision"):
        geohash_expr("lat", "lon", 13)


def test_neighbor_pairs_recall_and_polar_guard(spark):
    """Grid blocking finds exactly the brute-force pair set (including
    pairs straddling cell boundaries); points beyond the lat bound raise."""
    import math

    import pytest as _pt

    from compss_python_spark.geo.geo import neighbor_pairs

    # cluster around a cell corner: radius 200m grid => dlat ~0.0018 deg;
    # put points on both sides of a multiple of dlat
    pts = [
        (1, 40.00000, -74.00000),
        (2, 40.00150, -74.00000),   # ~167 m north (different cell likely)
        (3, 40.00000, -73.99800),   # ~170 m east
        (4, 40.00400, -74.00000),   # ~445 m north — out of radius
        (5, 39.99850, -74.00170),   # diagonal ~210 m — out (>200)
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {(r["id_a"], r["id_b"]) for r in
           neighbor_pairs(df, "id", "lat", "lon", 200.0).collect()}

    def hav(a, b):
        (_, la1, lo1), (_, la2, lo2) = a, b
        p1, p2 = math.radians(la1), math.radians(la2)
        dp, dl = p2 - p1, math.radians(lo2 - lo1)
        h = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        return 2 * 6371000 * math.asin(math.sqrt(h))

    want = set()
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            if round(hav(pts[i], pts[j]), 3) <= 200.0:
                want.add((pts[i][0], pts[j][0]))
    assert got == want and len(want) >= 2

    polar = spark.createDataFrame([(1, 89.5, 0.0), (2, 89.5, 1.0)],
                                  "id long, lat double, lon double")
    with _pt.raises(Exception, match="lat"):
        neighbor_pairs(polar, "id", "lat", "lon", 200.0).collect()


def test_neighbor_pairs_antimeridian_wrap(spark):
    """Pairs straddling ±180° longitude are found (modular lon cells);
    haversine itself is wrap-safe."""
    from compss_python_spark.geo.geo import neighbor_pairs

    pts = [
        (1, 0.0, 179.9995),
        (2, 0.0, -179.9995),  # ~111 m from point 1 across the antimeridian
        (3, 0.0, 179.9900),   # ~1.1 km from point 1 — out at r=200
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {(r["id_a"], r["id_b"]): r["dist_m"]
           for r in neighbor_pairs(df, "id", "lat", "lon", 200.0).collect()}
    assert set(got) == {(1, 2)}
    assert 100.0 < got[(1, 2)] < 130.0


def test_neighbor_pairs_residual_cell_never_narrow(spark):
    """Regression (round-8 advice): with ncx = ceil(360/dlon) the LAST
    modular lon cell was narrower than dlon, so a within-radius pair could
    straddle the whole residual cell — 2 cells apart — and be silently
    missed (radius 100.7 m, lat 84.9, points 5.3 m apart landed in cells
    34684 and 0 of ncx=34686).  Flooring (cell width 360/ncx ≥ dlon)
    restores lossless recall; verify against brute force across a sweep of
    offsets around ±180°."""
    import math

    from compss_python_spark.geo.geo import neighbor_pairs

    radius, lat = 100.7, 84.9
    # pairs 5.3 m apart at several positions straddling / near ±180°
    dl = 5.3 / (111_320.0 * math.cos(math.radians(lat)))
    pts = []
    for k, center in enumerate((180.0, 179.9999, -179.9999, 179.999, 179.99)):
        lo_a = center - dl / 2
        lo_b = center + dl / 2
        wrap = lambda x: ((x + 180.0) % 360.0) - 180.0
        pts.append((10 * k + 1, lat, wrap(lo_a)))
        pts.append((10 * k + 2, lat, wrap(lo_b)))
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {(r["id_a"], r["id_b"]) for r in
           neighbor_pairs(df, "id", "lat", "lon", radius).collect()}

    def hav(a, b):
        (_, la1, lo1), (_, la2, lo2) = a, b
        p1, p2 = math.radians(la1), math.radians(la2)
        dp, dlmb = p2 - p1, math.radians(lo2 - lo1)
        h = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlmb / 2) ** 2
        return 2 * 6371000 * math.asin(math.sqrt(h))

    want = {(pts[i][0], pts[j][0])
            for i in range(len(pts)) for j in range(i + 1, len(pts))
            if round(hav(pts[i], pts[j]), 3) <= radius}
    # every 5.3 m pair must be present — this is the lossless-recall claim
    assert got == want
    assert {(10 * k + 1, 10 * k + 2) for k in range(5)} <= got
