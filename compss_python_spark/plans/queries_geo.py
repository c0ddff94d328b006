"""Declared queries: geo operators (SURVEY.md §2.1 #4, §2.3 #20, §2.9 #69).

``geo_within`` is verified against a DuckDB oracle by using rectangle
polygons: the generic even-odd ray cast on the Spark side must agree with
the independently-computed strict BETWEEN containment in SQL.  Point
coordinates are integer-derived + 0.5 so no point ever lies on a rectangle
boundary (where even-odd and BETWEEN could legitimately disagree).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from compss_python_spark.plans.registry import query, table

RECTS = [  # (geom_id, minx, maxx, miny, maxy) — overlapping on purpose
    (0, 0.0, 40.0, 0.0, 40.0),
    (1, 30.0, 80.0, 20.0, 60.0),
    (2, 70.0, 100.0, 50.0, 100.0),
]


@query(
    "geo_within_rect",
    sql="""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey % 100) + 0.5 AS px,
             ((c_custkey * 7) % 100) + 0.5 AS py
      FROM customer
    ),
    rect(geom_id, minx, maxx, miny, maxy) AS (
      VALUES (CAST(0 AS BIGINT), 0.0, 40.0, 0.0, 40.0),
             (CAST(1 AS BIGINT), 30.0, 80.0, 20.0, 60.0),
             (CAST(2 AS BIGINT), 70.0, 100.0, 50.0, 100.0)
    )
    SELECT p.c_custkey, r.geom_id
    FROM pts p JOIN rect r
      ON p.px > r.minx AND p.px < r.maxx AND p.py > r.miny AND p.py < r.maxy
    """,
)
def geo_within_rect(spark, sf_dir):
    """Point-in-polygon join: customers at synthetic coords vs 3 rectangle
    polygons, run through the generic ray-casting geo_within."""
    from compss_python_spark.geo import geo_within
    from compss_python_spark.geo.geo import polygons_from_rings

    pts = table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") % 100) + 0.5).alias("px"),
        (((F.col("c_custkey") * 7) % 100) + 0.5).alias("py"),
    )
    rings = [
        [(x0, y0), (x1, y0), (x1, y1), (x0, y1)] for _gid, x0, x1, y0, y1 in RECTS
    ]
    polys = polygons_from_rings(spark, rings, ids=[r[0] for r in RECTS])
    return geo_within(pts, polys, lat_col="py", lon_col="px").select(
        "c_custkey", "geom_id"
    )


_STDB_BASE_SQL = """
    WITH RECURSIVE pts AS (
      SELECT event_id AS id,
             CAST(user_id % 12 AS DOUBLE) AS x,
             CAST((user_id // 12) % 12 AS DOUBLE) AS y,
             epoch(ts) AS t
      FROM events
    ),
    nb AS (
      SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b
      ON b.t BETWEEN a.t - 3600.0 AND a.t + 3600.0
      AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 2.25
    ),
    deg AS (SELECT ia AS id, COUNT(*) AS c FROM nb GROUP BY ia),
    core AS (SELECT id FROM deg WHERE c >= 5)
"""


@query(
    "stdbscan_core_sizes",
    oracle_cost="superlinear",  # all-pairs eps-neighborhood counts: capped at 600s at sfgen10
    sql=_STDB_BASE_SQL
    + """,
    ce AS (
      SELECT n.ia, n.ib FROM nb n
      JOIN core x ON n.ia = x.id JOIN core y ON n.ib = y.id
    ),
    comp(id, lbl) AS (
      SELECT id, id FROM core
      UNION
      SELECT ce.ia, comp.lbl FROM comp JOIN ce ON ce.ib = comp.id
      WHERE comp.lbl < ce.ia
    ),
    roots AS (SELECT id, MIN(lbl) AS root FROM comp GROUP BY id),
    sizes AS (SELECT root, COUNT(*) AS sz FROM roots GROUP BY root)
    SELECT sz AS core_size, COUNT(*) AS n_clusters FROM sizes GROUP BY sz
    """,
)
def stdbscan_core_sizes(spark, sf_dir):
    """ST-DBSCAN (#69) EXACT oracle — the two-radius (Birant-Kut) extension
    of the DBSCAN recursive-CTE closure: neighbor = spatial Euclidean ≤ 1.5
    AND |Δt| ≤ 3600 s.  Core points and their reachability components are
    implementation-independent, so the per-cluster CORE-size histogram is
    exactly recomputable in SQL (min-label propagation over the core
    graph).  Parameters are tuned subcritical (many small clusters) so the
    CTE closure stays cheap; the production-shaped sibling
    ``stdbscan_events`` keeps its wider radii."""
    from compss_python_spark.geo import stdbscan

    ev = table(spark, sf_dir, "events").select(
        F.col("event_id").alias("point_id"),
        (F.col("user_id") % 12).cast("double").alias("x"),
        (F.floor(F.col("user_id") / 12) % 12).cast("double").alias("y"),
        "ts",
    )
    out = stdbscan(
        ev, ["x", "y"], "ts", eps_spatial=1.5, eps_temporal=3600.0, min_pts=5,
        include_core=True,
    )
    sizes = out.filter("is_core").groupBy("cluster").agg(F.count("*").alias("sz"))
    return sizes.groupBy(F.col("sz").alias("core_size")).agg(
        F.count("*").alias("n_clusters")
    )


@query(
    "stdbscan_point_classes",
    sql=_STDB_BASE_SQL
    + """,
    border AS (
      SELECT DISTINCT n.ia AS id FROM nb n
      JOIN core c ON n.ib = c.id
      ANTI JOIN core x ON n.ia = x.id
    )
    SELECT (SELECT COUNT(*) FROM core) AS n_core,
           (SELECT COUNT(*) FROM border) AS n_border,
           (SELECT COUNT(*) FROM pts)
             - (SELECT COUNT(*) FROM core) - (SELECT COUNT(*) FROM border) AS n_noise
    """,
)
def stdbscan_point_classes(spark, sf_dir):
    """ST-DBSCAN point taxonomy (same run): core / border / noise counts —
    border MEMBERSHIP is tie-broken but border COUNT (non-core with ≥1 core
    neighbor under the two-radius predicate) is implementation-independent."""
    from compss_python_spark.geo import stdbscan

    ev = table(spark, sf_dir, "events").select(
        F.col("event_id").alias("point_id"),
        (F.col("user_id") % 12).cast("double").alias("x"),
        (F.floor(F.col("user_id") / 12) % 12).cast("double").alias("y"),
        "ts",
    )
    out = stdbscan(
        ev, ["x", "y"], "ts", eps_spatial=1.5, eps_temporal=3600.0, min_pts=5,
        include_core=True,
    )
    return out.agg(
        F.sum(F.col("is_core").cast("bigint")).alias("n_core"),
        F.sum(((~F.col("is_core")) & (F.col("cluster") >= 0)).cast("bigint")).alias(
            "n_border"
        ),
        F.sum((F.col("cluster") == -1).cast("bigint")).alias("n_noise"),
    )


@query("stdbscan_events", sql=None)
def stdbscan_events(spark, sf_dir):
    """ST-DBSCAN on events at synthetic coords (space from user hash, time
    from ts): cluster-size histogram.  Hash-function-specific → rows-only;
    clustering invariants asserted in tests/test_geo.py."""
    from compss_python_spark.geo import stdbscan

    ev = table(spark, sf_dir, "events").select(
        F.col("event_id").alias("point_id"),
        (F.col("user_id") % 12).cast("double").alias("x"),
        (F.floor(F.col("user_id") / 12) % 12).cast("double").alias("y"),
        "ts",
    )
    out = stdbscan(
        ev, ["x", "y"], "ts", eps_spatial=1.5, eps_temporal=21600.0, min_pts=6
    )
    return (
        out.groupBy("cluster")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "cluster")
        .limit(20)
    )


@query(
    "geo_geohash_encode",
    sql="""
    WITH pts AS (
      SELECT c_custkey,
             ((c_custkey % 100) + 0.5) * 1.8 - 90.0 AS lat,
             (((c_custkey * 7) % 100) + 0.5) * 3.6 - 180.0 AS lon
      FROM customer)
    SELECT c_custkey, (SELECT substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((z >> 25) & 31) + 1 AS INT), 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((z >> 20) & 31) + 1 AS INT), 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((z >> 15) & 31) + 1 AS INT), 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((z >> 10) & 31) + 1 AS INT), 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((z >> 5) & 31) + 1 AS INT), 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((z >> 0) & 31) + 1 AS INT), 1) FROM (SELECT LEAST(32767, GREATEST(0, CAST(FLOOR(((lon) + 180.0) / 360.0 * 32768.0) AS BIGINT))) AS lonq, LEAST(32767, GREATEST(0, CAST(FLOOR(((lat) + 90.0) / 180.0 * 32768.0) AS BIGINT))) AS latq) q1, LATERAL (SELECT (((lonq >> 14) & 1) << 29) + (((latq >> 14) & 1) << 28) + (((lonq >> 13) & 1) << 27) + (((latq >> 13) & 1) << 26) + (((lonq >> 12) & 1) << 25) + (((latq >> 12) & 1) << 24) + (((lonq >> 11) & 1) << 23) + (((latq >> 11) & 1) << 22) + (((lonq >> 10) & 1) << 21) + (((latq >> 10) & 1) << 20) + (((lonq >> 9) & 1) << 19) + (((latq >> 9) & 1) << 18) + (((lonq >> 8) & 1) << 17) + (((latq >> 8) & 1) << 16) + (((lonq >> 7) & 1) << 15) + (((latq >> 7) & 1) << 14) + (((lonq >> 6) & 1) << 13) + (((latq >> 6) & 1) << 12) + (((lonq >> 5) & 1) << 11) + (((latq >> 5) & 1) << 10) + (((lonq >> 4) & 1) << 9) + (((latq >> 4) & 1) << 8) + (((lonq >> 3) & 1) << 7) + (((latq >> 3) & 1) << 6) + (((lonq >> 2) & 1) << 5) + (((latq >> 2) & 1) << 4) + (((lonq >> 1) & 1) << 3) + (((latq >> 1) & 1) << 2) + (((lonq >> 0) & 1) << 1) + (((latq >> 0) & 1) << 0) AS z) q2) AS gh FROM pts
    """,
)
def geo_geohash_encode(spark, sf_dir):
    """Geohash spatial keys (precision 6) over the synthetic customer
    lattice — integer bit arithmetic end-to-end, so the SQL twin is
    bit-identical.  Prefix-shared geohashes are spatial neighbors: the
    same clustering/blocking role as the Morton key in layout_zorder."""
    from compss_python_spark.geo.geo import geohash_expr

    pts = table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") % 100 + 0.5) * 1.8 - 90.0).alias("lat"),
        ((F.col("c_custkey") * 7 % 100 + 0.5) * 3.6 - 180.0).alias("lon"),
    )
    return pts.select("c_custkey", geohash_expr("lat", "lon", 6).alias("gh"))


@query(
    "geo_neighbor_pairs",
    sql="""
    WITH p AS (
      SELECT event_id,
             40.0 + (CAST('0x' || substr(md5('lat:' || CAST(event_id AS VARCHAR)), 1, 12)
                     AS BIGINT) / 281474976710656.0) * 0.1 AS lat,
             -74.0 + (CAST('0x' || substr(md5('lon:' || CAST(event_id AS VARCHAR)), 1, 12)
                     AS BIGINT) / 281474976710656.0) * 0.1 AS lon
      FROM events WHERE event_id < 2000),
    d AS (
      SELECT a.event_id AS id_a, b.event_id AS id_b,
             ROUND(2 * 6371000 * ASIN(SQRT(
               SIN((RADIANS(b.lat) - RADIANS(a.lat)) / 2)
                 * SIN((RADIANS(b.lat) - RADIANS(a.lat)) / 2)
               + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                 * SIN((RADIANS(b.lon) - RADIANS(a.lon)) / 2)
                 * SIN((RADIANS(b.lon) - RADIANS(a.lon)) / 2))), 3) AS dist_m
      FROM p a JOIN p b ON a.event_id < b.event_id)
    SELECT id_a, id_b, dist_m FROM d WHERE dist_m <= 300.0
    """,
)
def geo_neighbor_pairs(spark, sf_dir):
    """Spatial neighbor self-join: all event pairs within 300 m (haversine)
    over md5-derived coordinates in a ~10 km box — grid blocking (cell ≥
    radius, 3×3 neighborhood explode on one side, equi-join on the cell
    key) with exact verify.  The oracle brute-forces ALL pairs in the
    slice, so a hash match proves the blocking lost no pair."""
    from compss_python_spark.geo.geo import neighbor_pairs

    def u(tag):
        return (
            F.conv(
                F.substring(
                    F.md5(F.encode(F.concat(F.lit(tag), F.col("event_id").cast("string")), "UTF-8")),
                    1, 12,
                ),
                16, 10,
            ).cast("double")
            / F.lit(281474976710656.0)
        )

    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select(
            "event_id",
            (F.lit(40.0) + u("lat:") * F.lit(0.1)).alias("lat"),
            (F.lit(-74.0) + u("lon:") * F.lit(0.1)).alias("lon"),
        )
    )
    return neighbor_pairs(ev, "event_id", "lat", "lon", 300.0)
