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
    """Set ``spark.sql.shuffle.partitions`` to ``n`` for the scope.

    Yields the previous (default) width; restores it on exit.  Reentrant
    and serialized across threads.
    """
    with _LOCK:
        default = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            yield default
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", str(default))
