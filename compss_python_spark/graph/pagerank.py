"""PageRank over an edge table (SURVEY.md §2.9 #68).

Reference [ref: ddf_library/functions/graph/pagerank.py]: iterative
rank ⋈ edge joins until max_iters.  Spark-first: the same dataflow as
DataFrame joins/aggs, with two scale-critical choices the reference lacks:

- **Plan-growth control**: each iteration extends the logical plan; a LAZY
  `localCheckpoint` every 2 iterations truncates lineage so Catalyst/AQE
  re-planning cost stays constant (SURVEY.md §7 hard part 3).  Measured at
  sf0.1: checkpoint_every=5 → 17 s for 8 iterations, =2 → 4.6 s — the
  accumulated-plan AQE re-optimization, not data volume, dominates.
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
    checkpoint_every: int = 2,
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
    for i in range(max_iters):
        contribs = (
            edges_w.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        # Dangling mass via the aggregate identity m = 1 − Σcontrib
        # (Σcontrib = Σ rank over NON-dangling nodes, since each such node's
        # rank splits exactly into its out-edge contributions).  This avoids
        # a second reference to `ranks` (no per-iteration persist needed) and
        # the left-anti dangling join — one aggregate over the already-
        # shuffled contribs, kept in the plan as a broadcast 1-row table so
        # no per-iteration blocking job runs.
        total = contribs.agg(
            F.coalesce(F.sum("contrib"), F.lit(0.0)).alias("_tc")
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + (F.lit(1.0) - F.col("_tc")) / n_nodes
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < max_iters:
            # Lazy lineage truncation: keeps Catalyst analysis cost constant
            # across iterations without running a blocking job per
            # checkpoint (eager=False materializes at the next action).
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
