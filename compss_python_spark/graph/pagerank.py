"""PageRank over an edge table (SURVEY.md §2.9 #68).

Reference [ref: ddf_library/functions/graph/pagerank.py]: iterative
rank ⋈ edge joins until max_iters.  Spark-first: the same dataflow as
DataFrame joins/aggs, with two scale-critical choices the reference lacks:

- **Plan-growth control**: each iteration extends the logical plan; after
  ~5 iterations `localCheckpoint` truncates lineage so analysis time and
  stage count stay constant (SURVEY.md §7 hard part 3).
- **Partitioning reuse**: edges are hash-partitioned once on src and
  persisted; every iteration's join reuses that layout, so only the small
  rank table shuffles per iteration.

Dangling nodes (no out-links) redistribute their mass uniformly, matching
the standard formulation (and networkx) rather than leaking mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iters: int = 10,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Returns (node, rank) with Σrank = 1 (uniform init, dangling-aware)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition("node")
        .persist()
    )
    n_nodes = nodes.count()

    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    edges_w = (
        e.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .repartition("src")
        .persist()
    )

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    cached: list[DataFrame] = []
    for i in range(max_iters):
        # ranks is referenced TWICE below (contribs + dangling) — persist so
        # the shared subtree is computed once per job instead of doubling
        # the plan every iteration (exponential between checkpoints).
        ranks = ranks.persist()
        cached.append(ranks)
        contribs = (
            edges_w.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        # Mass of dangling nodes (rank with no out-edges) → spread uniformly.
        # Kept IN the plan as a broadcast 1-row aggregate: a per-iteration
        # .first() here would run one blocking job per iteration, each
        # recomputing the lineage since the last checkpoint.
        dangling = (
            ranks.join(out_deg.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("_dm") / n_nodes)
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
            for c in cached:
                c.unpersist()
            cached = []
    for c in cached[:-1]:
        c.unpersist()
    return ranks
