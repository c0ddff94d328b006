"""Scale probe: replicate sf0.1 ~10x (≈ sf1) by UNION-ALL self-replication
with key offsetting, then time the headline queries against the replica.

Purpose (SCALE.md "measured scaling" extension): catch superlinear paths one
notch above the driver's bench SF — especially replication-induced skew:
documents text is IDENTICAL across replicas, so every doc gains 10 exact
copies (an adversarial dup storm for LSH band buckets, duplicate-span
position explodes, and exact-dedup windows).

Key handling: fact tables get per-replica key offsets so ids stay unique
and FK joins stay 1:N (o_custkey/c_custkey offset together; l_orderkey/
o_orderkey together); dimension tables (nation/region/part/supplier) copy
as-is and l_partkey/l_suppkey are untouched, so dim joins remain valid and
broadcast-able — exactly how a real 100 TB corpus grows (facts grow, dims
don't).

Usage: python tools/scale_probe.py [replicas] [--rebuild] [--reverse] [name_filter...]
Positional non-digit args are query-name substrings: when given, only
matching queries run (and ANY registry query matches, not just headliners —
handy for probing a new operator at 10×/100× before promoting it).
Writes the replica under .scratch/sfX/ (gitignored) and prints one JSON
line compatible with bench.py's shape.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from compss_python_spark.plans import REGISTRY  # noqa: E402
from compss_python_spark.plans.registry import table  # noqa: E402
from compss_python_spark.session import get_spark  # noqa: E402
from bench import force  # noqa: E402  (full-output evaluation; count() lets Catalyst prune row-preserving operators)

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# fact table -> {column: key-span constant added per replica}
OFFSETS = {
    "customer": {"c_custkey": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000},
}
DIMS = ["nation", "region", "part", "supplier"]


def build_replica(spark, dst: str, replicas: int) -> None:
    for t in DIMS:
        table(spark, SRC, t).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    for t, offs in OFFSETS.items():
        base = table(spark, SRC, t)
        parts = []
        for r in range(replicas):
            df = base
            for col, span in offs.items():
                df = df.withColumn(col, F.col(col) + F.lit(r * span).cast("long"))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")


def main() -> None:
    # Strict arg shape, validated BEFORE the (multi-minute) replica build:
    # replicas must be argv[1]; a digit anywhere else is ambiguous ("probe
    # bloom 100" would otherwise silently run at the default 10×).
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10
    stray = [a for a in sys.argv[2:] if a.isdigit()]
    if stray:
        print(
            f"replica count must be the FIRST argument; got stray digits {stray} "
            f"(usage: scale_probe.py [replicas] [--rebuild] [name_filter...])",
            file=sys.stderr,
        )
        sys.exit(2)
    filters = [a for a in sys.argv[1:] if not a.isdigit() and not a.startswith("--")]
    if filters:
        headline = {
            n: s for n, s in REGISTRY.items() if any(f in n for f in filters)
        }
        if not headline:
            print(f"no registry query matches {filters}", file=sys.stderr)
            sys.exit(1)
    else:
        headline = {n: s for n, s in REGISTRY.items() if s.headline}
    if "--reverse" in sys.argv:
        # Run in REVERSE registry order: if a query's in-context cost
        # tracks its position in the run rather than its name, the gap is
        # harness physics (JVM/GC/codegen-cache state after N heavy
        # queries), not that query's plan (round-8 pagerank question).
        headline = dict(reversed(list(headline.items())))

    dst = os.path.join(REPO, ".scratch", f"sf0.1x{replicas}")
    spark = get_spark("scale_probe")

    if "--rebuild" in sys.argv and os.path.isdir(dst):
        shutil.rmtree(dst)
    if not os.path.isdir(os.path.join(dst, "lineitem.parquet")):
        t0 = time.perf_counter()
        build_replica(spark, dst, replicas)
        print(f"# built {dst} in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    first, steady = {}, {}
    for name, spec in headline.items():
        t0 = time.perf_counter()
        force(spec.fn(spark, dst))
        first[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    for name, spec in headline.items():
        t0 = time.perf_counter()
        force(spec.fn(spark, dst))
        steady[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": round(sum(steady.values()), 3),
                "unit": "sec",
                "queries": steady,
                "first_run": first,
                "first_run_total": round(sum(first.values()), 3),
                "sf": f"0.1x{replicas}",
            }
        )
    )


if __name__ == "__main__":
    main()
