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
