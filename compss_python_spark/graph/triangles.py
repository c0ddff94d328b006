"""Triangle counting over an edge table (engine extension — the standard
graph-health metric next to PageRank / components).

Algorithm: orient every undirected edge low-id → high-id (each triangle is
then counted exactly once as a < b < c), and count length-2 paths that close:
edges(a,b) ⋈ edges(b,c) ⋈ edges(a,c).  Plan: two hash equi-joins — the first
keyed on the middle vertex, the closing join on the (a, c) pair.

Scale note: intermediate size is Σ_v deg_out(v)² under the chosen
orientation; orienting by (degree, id) instead of raw id bounds out-degree
by O(√m) on any graph (the standard degree-ordering trick) — exposed via
``orient_by_degree`` for skewed graphs; id-orientation is kept as the
default because it is cheaper (no degree join) and exactly reproducible in
the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    orient_by_degree: bool = False,
) -> DataFrame:
    """Returns a single row (n_triangles) for the undirected simple graph."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if orient_by_degree:
        deg = (
            e.select(F.col("a").alias("v"))
            .union(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("d"))
        )
        da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
        db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
        ranked = e.join(da, "a").join(db, "b")
        e = ranked.select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a"), F.col("b")),
            )
            .otherwise(F.struct(F.col("b").alias("a"), F.col("a").alias("b")))
            .alias("s")
        ).select("s.a", "s.b")
    ab = e.select(F.col("a").alias("t_a"), F.col("b").alias("t_b"))
    bc = e.select(F.col("a").alias("t_b"), F.col("b").alias("t_c"))
    ac = e.select(F.col("a").alias("t_a"), F.col("b").alias("t_c"))
    return (
        ab.join(bc, "t_b")
        .join(ac, ["t_a", "t_c"])
        .agg(F.count("*").alias("n_triangles"))
    )
