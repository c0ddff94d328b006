"""Connected components over an edge table (engine extension; completes the
MinHash-LSH dedup pipeline: candidate pairs → components → one survivor per
component).

Algorithm: min-label propagation on the symmetrized graph — every node
starts labeled with its own id; each iteration a node takes the min of its
own label and its neighbors' labels; converged when an iteration changes no
label (≤ graph diameter iterations).  The same dataflow discipline as
:mod:`pagerank`:

- edges symmetrized + distinct once, hash-partitioned on src, persisted —
  every iteration's join reuses the layout, only the small label table
  moves;
- loop shuffle width derived from the edge count (empty-task scheduling
  dominates small graphs at the session default width);
- eager localCheckpoint per iteration truncates lineage AND doubles as the
  convergence action (the changed-label count piggybacks on it);
- dedup components are candidate-pair graphs: diameter is tiny (near-dup
  clusters are quasi-cliques), so propagation converges in 2–4 rounds; for
  adversarially long path graphs at 100 TB, the large-star/small-star
  variant (Kiveris et al. 2014) halves diameter per round — noted as the
  escalation path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from compss_python_spark.graph._scoped_conf import scoped_shuffle_partitions


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns (node, component) where component = min node id reachable.

    Scopes ``spark.sql.shuffle.partitions`` to a size-derived loop width
    (lock-serialized, restored before returning; the result is materialized
    inside the scope, same contract as :func:`pagerank.pagerank`).

    Raises ``RuntimeError`` if propagation has not converged after
    ``max_iters`` iterations (labels would be silently wrong for any
    component whose diameter exceeds the budget) — raise ``max_iters`` for
    long-path graphs; near-dup candidate graphs converge in 2–4 rounds.
    """
    spark = edges.sparkSession
    d = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = (
        d.union(d.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    n_edges = e.count()
    if num_partitions is None:
        default_p = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        num_partitions = max(1, min(default_p, n_edges // 2_000_000 + 1))
    try:
        with scoped_shuffle_partitions(spark, num_partitions):
            labels = _cc_loop(e, max_iters)
    finally:
        e.unpersist()
    return labels


def _cc_loop(e: DataFrame, max_iters: int) -> DataFrame:
    edges_p = e.repartition("src").persist()
    labels = (
        edges_p.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    for _ in range(max_iters):
        neighbor_min = (
            edges_p.join(
                labels.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("_nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("_nmin"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("_nmin"), F.col("component")) < F.col("component"))
                .cast("long")
                .alias("_changed"),
            )
            .localCheckpoint(eager=True)  # materialize + truncate lineage
        )
        changed = new_labels.agg(F.sum("_changed")).first()[0]
        labels = new_labels.drop("_changed")
        if not changed:
            break
    edges_p.unpersist()
    if changed:
        # The last iteration still moved labels: some component's diameter
        # exceeds max_iters and its labels are NOT final.  Returning them
        # would silently merge/split clusters downstream (dedup survivors).
        raise RuntimeError(
            f"connected_components did not converge within max_iters="
            f"{max_iters} ({changed} labels still changing); increase "
            "max_iters for long-diameter graphs"
        )
    return labels
