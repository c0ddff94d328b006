"""Shapefile reading + point-in-polygon join.

Reference surface: ``cc.read.shapefile(shp, dbf)`` and
``ddf.geo_within(shp_ddf, lat_col, lon_col, polygon_col, attributes)``
[ref: ddf_library/functions/geo.py].

Design (Spark-first):
- Shapefiles are dimension tables (country/sector outlines — KBs to MBs),
  so they are parsed driver-side with a minimal pure-Python reader for the
  public ESRI shapefile + dBASE III formats (no pyshp/geopandas in the
  container) and become a broadcastable DataFrame whose geometry is an
  ``array<struct<x,y>>`` ring plus a precomputed bounding box.
- ``geo_within`` joins points to polygons on the bounding box (broadcast —
  no shuffle of the fact side), then verifies candidates with an even-odd
  ray-casting test expressed as one ``F.aggregate`` over the polygon's edge
  array.  Candidate fan-out after the bbox filter is ~1 polygon per point,
  so the per-row lambda work is a handful of arithmetic ops; no Python UDF,
  no extra shuffle.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _parse_shp(path: str) -> list[list[tuple[float, float]]]:
    """Minimal ESRI .shp parser: Polygon (type 5) / PolyLine (3) / Point (1).

    Returns one outer ring (list of (x, y)) per record; multi-part records
    contribute their first part (parity with the reference's one-polygon-
    per-row tables).  Format: 100-byte big-endian header, then records of
    (big-endian header, little-endian shape payload).
    """
    rings: list[list[tuple[float, float]]] = []
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 100 or struct.unpack(">i", data[:4])[0] != 9994:
        raise ValueError(f"{path}: not an ESRI shapefile (bad magic/header)")
    pos = 100  # skip file header
    while pos < len(data):
        (_recno, length_words) = struct.unpack(">ii", data[pos : pos + 8])
        pos += 8
        payload = data[pos : pos + length_words * 2]
        pos += length_words * 2
        (shape_type,) = struct.unpack("<i", payload[:4])
        if shape_type == 1:  # Point
            x, y = struct.unpack("<dd", payload[4:20])
            rings.append([(x, y)])
        elif shape_type in (3, 5):  # PolyLine / Polygon
            num_parts, num_points = struct.unpack("<ii", payload[36:44])
            parts = struct.unpack(f"<{num_parts}i", payload[44 : 44 + 4 * num_parts])
            pts_off = 44 + 4 * num_parts
            end = parts[1] if num_parts > 1 else num_points
            ring = [
                struct.unpack("<dd", payload[pts_off + 16 * i : pts_off + 16 * i + 16])
                for i in range(parts[0], end)
            ]
            rings.append([(x, y) for x, y in ring])
        # null shapes (0) and unsupported types are skipped
    return rings


def _parse_dbf(path: str) -> tuple[list[tuple[str, str]], list[list]]:
    """Minimal dBASE III .dbf parser: C (string), N/F (numeric), L (bool),
    D (date-as-string) field types.

    Returns ``([(name, ftype), ...], rows)`` — the type codes come from the
    field DESCRIPTORS, so callers can derive column types without inferring
    from row values (a leading NULL numeric must still be a double column).
    Deleted records (``*`` flag) are skipped."""
    with open(path, "rb") as f:
        data = f.read()
    n_records, header_len, record_len = struct.unpack("<IHH", data[4:12])
    fields = []  # (name, type, length)
    pos = 32
    while data[pos] != 0x0D:
        name = data[pos : pos + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(data[pos + 11])
        flen = data[pos + 16]
        fields.append((name, ftype, flen))
        pos += 32
    rows = []
    for r in range(n_records):
        rec = data[header_len + r * record_len : header_len + (r + 1) * record_len]
        if rec[:1] == b"*":  # deleted
            continue
        vals, off = [], 1
        for name, ftype, flen in fields:
            raw = rec[off : off + flen].decode("ascii", "replace").strip()
            off += flen
            if ftype in ("N", "F"):
                vals.append(float(raw) if raw else None)
            elif ftype == "L":
                vals.append(raw in ("Y", "y", "T", "t"))
            else:
                vals.append(raw)
        rows.append(vals)
    return [(f[0], f[1]) for f in fields], rows


POINT = T.StructType(
    [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
)


def read_shapefile(
    spark: SparkSession, shp_path: str, dbf_path: str | None = None
) -> DataFrame:
    """Shapefile → DataFrame(geom_id, points array<struct<x,y>>, <dbf attrs>).

    [ref: ddf_library/functions/geo.py read_shapefile].  Driver-side parse —
    shapefiles are small dimension data; the result is meant to be the
    broadcast side of ``geo_within``.
    """
    rings = _parse_shp(shp_path)
    fields: list[tuple[str, str]] = []
    attr_rows: list[list] = [[] for _ in rings]
    if dbf_path:
        fields, attr_rows = _parse_dbf(dbf_path)
        # .shp records and live .dbf records must pair 1:1 — deleted dbf
        # records or a truncated dbf would silently misalign attributes.
        if len(attr_rows) != len(rings):
            raise ValueError(
                f"{dbf_path}: {len(attr_rows)} live dbf records != "
                f"{len(rings)} shp records — attribute rows cannot be "
                "aligned to geometries"
            )
    _DBF_TYPES = {"N": T.DoubleType(), "F": T.DoubleType(), "L": T.BooleanType()}
    schema = T.StructType(
        [
            T.StructField("geom_id", T.LongType()),
            T.StructField("points", T.ArrayType(POINT)),
        ]
        # Column types come from the dbf field DESCRIPTORS (N/F→double,
        # L→boolean, C/D→string), not from the first row's values — a
        # leading NULL numeric stays a double column.
        + [
            T.StructField(n, _DBF_TYPES.get(ftype, T.StringType()))
            for n, ftype in fields
        ]
    )
    data = [
        (i, [{"x": x, "y": y} for x, y in ring], *(attr_rows[i] if fields else []))
        for i, ring in enumerate(rings)
    ]
    return spark.createDataFrame(data, schema)


def polygons_from_rings(
    spark: SparkSession, rings: list[list[tuple[float, float]]], ids=None
) -> DataFrame:
    """Build a polygon DataFrame from in-memory rings (test/fixture path)."""
    data = [
        (ids[i] if ids else i, [{"x": float(x), "y": float(y)} for x, y in ring])
        for i, ring in enumerate(rings)
    ]
    schema = T.StructType(
        [
            T.StructField("geom_id", T.LongType()),
            T.StructField("points", T.ArrayType(POINT)),
        ]
    )
    return spark.createDataFrame(data, schema)


def geo_within(
    points: DataFrame,
    polygons: DataFrame,
    lat_col: str,
    lon_col: str,
    polygon_col: str = "points",
    poly_id_col: str = "geom_id",
    attributes: list[str] | None = None,
) -> DataFrame:
    """Point-in-polygon join [ref: ddf_library/functions/geo.py geo_within].

    Keeps point rows that fall inside a polygon, annotated with the polygon's
    id + requested attributes.  x = lon, y = lat (reference convention).

    Physical plan: broadcast polygons (with bbox) → BroadcastNestedLoopJoin
    on the bbox range predicate (cheap: 4 comparisons/pair against a dim
    table) → even-odd ray cast over the polygon's edge list via
    ``F.aggregate`` on surviving candidates only.  The 100 TB fact side is
    never shuffled.
    """
    attributes = attributes or []
    xs = F.transform(F.col(polygon_col), lambda p: p.x)
    ys = F.transform(F.col(polygon_col), lambda p: p.y)
    polys = polygons.select(
        F.col(poly_id_col),
        *attributes,
        F.col(polygon_col).alias("_ring"),
        F.array_min(xs).alias("_minx"),
        F.array_max(xs).alias("_maxx"),
        F.array_min(ys).alias("_miny"),
        F.array_max(ys).alias("_maxy"),
    )
    px, py = F.col(lon_col), F.col(lat_col)
    cand = points.join(
        F.broadcast(polys),
        (px >= F.col("_minx"))
        & (px <= F.col("_maxx"))
        & (py >= F.col("_miny"))
        & (py <= F.col("_maxy")),
        "inner",
    )

    # Even-odd rule: count edges (p1→p2) whose y-span straddles py and whose
    # x at height py lies right of px.  Edge i pairs ring[i] with ring[i+1];
    # zip the ring against itself shifted by one (ring need not be closed).
    ring = F.col("_ring")
    shifted = F.concat(F.slice(ring, 2, F.size(ring) - 1), F.slice(ring, 1, 1))
    crossings = F.aggregate(
        F.zip_with(ring, shifted, lambda p1, p2: F.struct(p1.alias("a"), p2.alias("b"))),
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            ((e.a.y > py) != (e.b.y > py))
            & (px < (e.b.x - e.a.x) * (py - e.a.y) / (e.b.y - e.a.y) + e.a.x),
            1,
        ).otherwise(0),
    )
    return (
        cand.withColumn("_cross", crossings)
        .filter(F.col("_cross") % 2 == 1)
        .drop("_ring", "_minx", "_maxx", "_miny", "_maxy", "_cross")
    )


# Geohash base32 alphabet (Niemeyer) — no a/i/l/o.
_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_expr(lat_col, lon_col, precision: int = 8):
    """Geohash of (lat, lon) as a pure JVM expression — the geo-layout
    companion to operators/layout.zorder_value (prefix-shared geohashes
    are spatial neighbors, so sorting/partitioning by geohash clusters
    scans the same way Z-ordering does, and the string prefix doubles as
    a join key for coarse spatial blocking).

    Standard Niemeyer construction: quantize lon to ceil(5p/2) bits and
    lat to floor(5p/2), interleave MSB-first starting with lon, emit 5-bit
    groups through the base32 alphabet.  Integer arithmetic end-to-end
    (one floor per axis), so the SQL twin is bit-identical."""
    if not 1 <= precision <= 12:
        raise ValueError("geohash_expr: precision must be in [1, 12]")
    total = 5 * precision
    lonb = (total + 1) // 2
    latb = total // 2
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lon = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    lon_q = F.least(
        F.lit(2**lonb - 1),
        F.greatest(F.lit(0), F.floor((lon + 180.0) / 360.0 * F.lit(float(2**lonb)))),
    ).cast("long")
    lat_q = F.least(
        F.lit(2**latb - 1),
        F.greatest(F.lit(0), F.floor((lat + 90.0) / 180.0 * F.lit(float(2**latb)))),
    ).cast("long")
    z = F.lit(0).cast("long")
    for i in range(total):
        if i % 2 == 0:
            src, srcbits, idx = lon_q, lonb, i // 2
        else:
            src, srcbits, idx = lat_q, latb, i // 2
        bit = F.shiftright(src, srcbits - 1 - idx).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(bit, total - 1 - i)
    chars = [
        F.substring(
            F.lit(_GEOHASH32),
            (F.shiftright(z, 5 * (precision - 1 - j)).bitwiseAND(F.lit(31)) + 1).cast("int"),
            1,
        )
        for j in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql(lat_expr: str, lon_expr: str, precision: int = 8) -> str:
    """The identical geohash as DuckDB SQL (oracle twin of geohash_expr)."""
    total = 5 * precision
    lonb = (total + 1) // 2
    latb = total // 2
    lon_q = (
        f"LEAST({2**lonb - 1}, GREATEST(0, "
        f"CAST(FLOOR((({lon_expr}) + 180.0) / 360.0 * {float(2**lonb)}) AS BIGINT)))"
    )
    lat_q = (
        f"LEAST({2**latb - 1}, GREATEST(0, "
        f"CAST(FLOOR((({lat_expr}) + 90.0) / 180.0 * {float(2**latb)}) AS BIGINT)))"
    )
    bits = []
    for i in range(total):
        if i % 2 == 0:
            src, srcbits, idx = "lonq", lonb, i // 2
        else:
            src, srcbits, idx = "latq", latb, i // 2
        bits.append(f"((({src} >> {srcbits - 1 - idx}) & 1) << {total - 1 - i})")
    z = " + ".join(bits)
    chars = " || ".join(
        f"substr('{_GEOHASH32}', CAST(((z >> {5 * (precision - 1 - j)}) & 31) + 1 AS INT), 1)"
        for j in range(precision)
    )
    return (
        f"(SELECT {chars} FROM (SELECT {lon_q} AS lonq, {lat_q} AS latq) q1, "
        f"LATERAL (SELECT {z} AS z) q2)"
    )


def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters (haversine, R = 6 371 000) as a
    column expression — portable: sin/cos/asin/radians exist identically
    in Spark and DuckDB."""
    dphi = (F.radians(lat2) - F.radians(lat1)) / 2
    dlmb = (F.radians(lon2) - F.radians(lon1)) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlmb) * F.sin(dlmb)
    )
    return F.lit(2.0 * 6371000.0) * F.asin(F.sqrt(a))


def neighbor_pairs(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_m: float,
    max_abs_lat: float = 85.0,
) -> DataFrame:
    """All point pairs within ``radius_m`` meters (haversine) — the
    spatial self-join, made scalable by GRID BLOCKING: points key into a
    lat/lon cell whose size is ≥ the radius (lon cell widened by the
    worst-case cos(lat) shrink up to ``max_abs_lat``), one side explodes
    to its 3×3 cell neighborhood, candidates equi-join on the cell key,
    and the exact haversine verifies.  Within-radius pairs can never span
    more than one cell boundary per axis, so blocking loses NOTHING —
    the oracle/test proves recall == brute force.  Returns
    (id_a, id_b, dist_m) with id_a < id_b, dist rounded to 3 mm-digits.

    Plan: narrow cell keying, ×9 explode on ONE side only, one
    equi-join shuffle on the cell key (high cardinality by construction),
    exact verify as a filter.  The O(n²) all-pairs plan never exists.
    At the poles the lon cell degenerates — points above ``max_abs_lat``
    are rejected loudly rather than silently mis-blocked.
    """
    import math as _math

    dlat = radius_m / 111_320.0
    dlon = radius_m / (111_320.0 * _math.cos(_math.radians(max_abs_lat)))
    # Longitude cells are MODULAR (0..ncx-1 around the globe, lon shifted
    # to [0, 360)): a pair straddling the ±180 antimeridian is ~meters
    # apart but thousands of naive floor(lon/dlon) cells apart — modular
    # neighbor arithmetic keeps the lossless-recall guarantee there
    # (haversine itself is wrap-safe: sin(Δλ/2) ≈ 0 at Δλ ≈ 360°).
    # ncx = FLOOR(360/dlon) with an effective cell width of 360/ncx ≥ dlon:
    # ceil would leave a RESIDUAL last cell narrower than dlon, and a
    # within-radius pair can straddle that whole cell — 2 cells apart,
    # silently missed (e.g. radius 100.7 m at lat 84.9: points 5.3 m apart
    # landed in cells ncx-2 and 0).  Flooring makes every modular cell at
    # least dlon wide, so the one-boundary-max argument holds everywhere.
    ncx = max(1, int(360.0 // dlon))
    dlon_eff = 360.0 / ncx
    lat, lon = F.col(lat_col), F.col(lon_col)
    pts = df.select(
        F.col(id_col).alias("_id"),
        lat.alias("_lat"),
        lon.alias("_lon"),
        F.when(
            F.abs(lat) > max_abs_lat,
            F.raise_error(
                F.lit(
                    f"neighbor_pairs: |lat| > {max_abs_lat} breaks the lon "
                    "grid bound — raise max_abs_lat (wider cells) or cap the input"
                )
            ).cast("bigint"),
        ).otherwise(F.floor(lat / F.lit(dlat)).cast("bigint")).alias("_cy"),
        F.pmod(
            F.floor((lon + F.lit(180.0)) / F.lit(dlon_eff)).cast("bigint"), F.lit(ncx)
        ).alias("_cx"),
    )
    a = pts.select(
        F.col("_id").alias("id_a"),
        F.col("_lat").alias("lat_a"),
        F.col("_lon").alias("lon_a"),
        F.explode(
            F.array(*[F.struct(
                (F.col("_cy") + dy).alias("_cy"),
                F.pmod(F.col("_cx") + dx, F.lit(ncx)).alias("_cx"))
                for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
        ).alias("_c"),
    ).select("id_a", "lat_a", "lon_a", F.col("_c._cy").alias("_cy"), F.col("_c._cx").alias("_cx"))
    b = pts.select(
        F.col("_id").alias("id_b"),
        F.col("_lat").alias("lat_b"),
        F.col("_lon").alias("lon_b"),
        "_cy",
        "_cx",
    )
    d = haversine_m(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b"))
    # No distinct needed when ncx > 2: each point keys exactly one cell on
    # the b side, and a's nine neighbor cells are pairwise DISTINCT, so a
    # qualifying pair joins exactly once.  Degenerate globes (huge radius
    # → ncx ≤ 2, where (cx±1) mod ncx collide) deduplicate explicitly.
    out = (
        a.join(b, ["_cy", "_cx"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist_m", F.round(d, 3))
        .filter(F.col("dist_m") <= radius_m)
        .select("id_a", "id_b", "dist_m")
    )
    return out.distinct() if ncx <= 2 else out
