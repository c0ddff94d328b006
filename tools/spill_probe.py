"""Spill-regime characterization for the >=10x/decade bench entries.

The fourth-decade (sfgen1000) bench shows a handful of headliners whose
wall-clock grew >=10x over one 10x data decade — all fact-side shuffles
that exceed one box's RAM and hit disk (the cost a cluster amortizes per
node).  This probe re-measures each named query under SPILL-AWARE runtime
conf and records whether the decade ratio is a plan problem or a
single-box wall:

- `spark.sql.shuffle.partitions` scaled to the data (default local conf
  pins it to #cores, so at 600 M rows each shuffle partition is ~19 M
  rows / several GB — guaranteed spill with 32 concurrent tasks; scaling
  to ~2 M rows/partition keeps each sort buffer in memory);
- `spark.sql.files.maxPartitionBytes` dropped so scan tasks stay small.

Both are runtime-settable SQL confs, so baseline and tuned runs share one
JVM (same JIT/page-cache state; baseline first, tuned second — any cache
advantage accrues to the TUNED run, so report min-of-1 honestly as an
upper bound on the tuning win).

Output: one JSON line per query {name, baseline_sec, tuned_sec,
shuffle_partitions, verdict} plus a trailing summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    parts = int(os.environ.get("SPILL_PROBE_PARTITIONS", "256"))

    from bench import force  # same full-output contract as the bench
    from compss_python_spark.plans import REGISTRY
    from compss_python_spark.session import get_spark

    spark = get_spark("spill_probe")
    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    rows = []
    for name in names:
        spec = REGISTRY[name]
        out = {"name": name, "shuffle_partitions": parts}
        for tag, conf in (("baseline_sec", base_parts), ("tuned_sec", parts)):
            spark.conf.set("spark.sql.shuffle.partitions", str(conf))
            t0 = time.perf_counter()
            force(spec.fn(spark, sf_dir))
            out[tag] = round(time.perf_counter() - t0, 2)
            spark.catalog.clearCache()
        ratio = out["tuned_sec"] / max(out["baseline_sec"], 1e-9)
        out["verdict"] = (
            "partition-scaling win" if ratio < 0.8
            else "single-box wall (conf-insensitive)" if ratio < 1.25
            else "tuned slower (over-partitioned)"
        )
        rows.append(out)
        print(json.dumps(out), flush=True)
        spark.conf.set("spark.sql.shuffle.partitions", base_parts)
    print(json.dumps({"probe": "spill", "sf_dir": sf_dir, "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
