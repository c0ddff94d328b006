"""k-core decomposition: iteratively peel nodes of degree < k until the
remaining subgraph has minimum degree ≥ k — the standard dense-subgraph /
spam-cluster / community-seed primitive.

Same dataflow discipline as :mod:`pagerank` / :mod:`components`:
- edges symmetrized + distinct once (null endpoints excluded by contract,
  matching components.py);
- each peel round is ONE degree aggregate + two semi-joins keyed on node
  ids (high-cardinality, well-distributed) — no driver-side graph state;
- eager localCheckpoint per round truncates lineage, and the surviving-node
  count doubles as the convergence action: the active set shrinks
  monotonically, so an unchanged count IS the fixpoint;
- rounds needed = peel depth (the degeneracy ordering's layer count), which
  is small for real graphs (web/social cores peel in a handful of rounds);
  ``max_iter`` turns a pathological input into a loud error, never a silent
  wrong answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from compss_python_spark.caching import release_checkpoint


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Nodes of the k-core of the undirected graph, with their core degree:
    (node, degree), degree ≥ k, computed on the k-core subgraph."""
    if k < 1:
        raise ValueError(f"k_core: k must be >= 1, got {k}")
    base = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s") != F.col("d"))
    )
    cur = (
        base.union(base.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_nodes = -1
    prev_active = None
    for _ in range(max_iter):
        deg = cur.groupBy("s").agg(F.count("*").alias("degree"))
        active = deg.filter(F.col("degree") >= k).localCheckpoint(eager=True)
        # release the superseded checkpoints (caching.py — df.unpersist()
        # was a no-op on localCheckpoint RDDs, so every peel round leaked
        # its node and edge tables until session GC)
        if prev_active is not None:
            release_checkpoint(prev_active)
        prev_active = active
        n = active.count()
        if n == prev_nodes or n == 0:
            release_checkpoint(cur)
            return active.select(F.col("s").alias("node"), "degree")
        nxt = (
            cur.join(active.select("s"), "s")
            .join(active.select(F.col("s").alias("d")), "d")
            .select("s", "d")
            .localCheckpoint(eager=True)
        )
        release_checkpoint(cur)
        cur = nxt
        prev_nodes = n
    raise RuntimeError(
        f"k_core: did not converge in {max_iter} peel rounds — "
        "pathological peel depth; raise max_iter explicitly"
    )
