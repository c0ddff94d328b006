"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (collect-to-count of the result) —
wall-clock includes scan, shuffle and result materialization.

Methodology: one un-timed warm-up pass of every headline query first, then
TWO timed passes with the per-query minimum reported (noise-robust on a
multi-tenant host).  This measures steady-state throughput (the 100 TB-relevant
metric): a single-JVM first run otherwise charges C2-JIT compilation of
whichever expression interpreter paths (higher-order functions, hash
kernels) a query touches first — noise that no long-running cluster job
pays per-query.  Data caching is NOT involved (no .persist survives a
query; OS page cache on a 70 MB sf0.1 scan is equally warm for both
passes after pass one's read).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from compss_python_spark.plans import REGISTRY  # noqa: E402
from compss_python_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    headline = {n: s for n, s in REGISTRY.items() if s.headline}

    # Warm-up pass: JVM JIT + codegen + parquet footer / page caches.
    # clearCache between queries: operators that persist internally release
    # their own blocks, but any stray cached/checkpointed block must not
    # bleed into the next query's measurement (round-2 lesson: leaked
    # persists degraded every query timed after pagerank by 40-100%).
    for spec in headline.values():
        spec.fn(spark, sf_dir).count()
        spark.catalog.clearCache()

    # Two timed passes, per-query MINIMUM: the host is multi-tenant and
    # ambient load spikes inflate a single pass arbitrarily (observed 3×+
    # uniform inflation across identical code); min-of-k is the standard
    # estimator of the noise-free cost and k=2 bounds total runtime.
    times: dict[str, float] = {}
    for _pass in range(2):
        for name, spec in headline.items():
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
            spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
