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


def parse_byte_size(s: str) -> int:
    """Parse a Spark byte-size conf value ("256MB", "64m", "10485760b",
    plain digits) to bytes.  Delegates to Spark's own JavaUtils when a JVM
    is reachable so the accepted grammar matches Spark's exactly; falls
    back to a local parse (used only if the JVM call fails)."""
    s = s.strip()
    try:
        from pyspark import SparkContext

        jvm = SparkContext._active_spark_context._jvm  # type: ignore[union-attr]
        return int(jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s))
    except Exception:
        units = {"b": 1, "k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
        low = s.lower().rstrip("b")
        mult = 1
        if low and low[-1] in units:
            mult = units[low[-1]]
            low = low[:-1]
        return int(float(low or "0") * mult)


@contextmanager
def scoped_aqe_disabled(spark: SparkSession, disable: bool) -> Iterator[None]:
    """Turn AQE off for the scope when ``disable`` is True (no-op scope
    otherwise).  Callers must prove the disable is safe first — the
    iterative loops gate it on (a) the per-iteration shuffle being
    provably below the AQE skew-split threshold, so skew handling cannot
    fire anyway, and (b) the small join side being explicitly broadcast,
    so AQE's runtime broadcast conversion is not needed.  Same lock and
    restore discipline as :func:`scoped_shuffle_partitions`; results must
    be materialized inside the scope."""
    if not disable:
        yield
        return
    with _LOCK:
        key = "spark.sql.adaptive.enabled"
        prev = spark.conf.get(key, "true")
        spark.conf.set(key, "false")
        try:
            yield
        finally:
            spark.conf.set(key, prev)


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
