"""Loop-scoped ``spark.sql.shuffle.partitions`` narrowing.

The iterative graph loops (pagerank, connected components) run their
per-iteration shuffles at a width derived from the data size: on small
graphs, empty-task scheduling at the session default width dominates
wall-clock (measured in graph/pagerank.py's module docstring).  Spark SQL
conf is session-global, so the narrowing is visible to any query that runs
on the same session while a loop is in flight.  The contract here:

- the loop materializes its result (eager localCheckpoint) INSIDE the
  scope, so the returned DataFrame never depends on the narrowed value;
- a process-wide lock serializes scopes, so two concurrent loops can never
  interleave set/restore and leave the wrong width behind;
- other concurrent queries on the same session would still observe the
  narrowed width for the duration of the loop — callers that share a
  session across threads should pass ``num_partitions`` equal to the
  session default to opt out of narrowing.

On a 1000-executor cluster the width formula (~2 M edges/partition,
capped at the session default) leaves big graphs at the full default
width, so the narrowing is a small-input optimization only.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

_LOCK = threading.RLock()


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int) -> Iterator[int]:
    """Set ``spark.sql.shuffle.partitions`` to ``n`` for the scope, and pin
    AQE partition COALESCING off inside it.

    The loop width is already size-derived; letting AQE re-coalesce each
    iteration's exchanges (a) second-guesses that choice per stage and (b)
    breaks co-partitioning between the persisted edge table and the
    per-iteration joins, inserting exchanges the static plan doesn't need.
    Interleaved A/B on a 5.9M-edge graph, 8 iterations, 3 rounds each:
    coalescing on 2.96 s min / off 2.51 s (~15%).  AQE itself stays ON
    (skew-join splitting is still wanted on power-law graphs).

    Yields the previous (default) width; restores both confs on exit.
    Reentrant and serialized across threads.
    """
    with _LOCK:
        default = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
        prev_coalesce = spark.conf.get(coalesce_key, "true")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        spark.conf.set(coalesce_key, "false")
        try:
            yield default
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", str(default))
            spark.conf.set(coalesce_key, prev_coalesce)
