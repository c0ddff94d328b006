"""Merge per-chunk bench detail JSONs into one BENCH_GEN*.json artifact.

The gen-SF bench must run CHUNKED (SPARK_GRAFT_BENCH_NAMES subsets, one
process per chunk): a single 38-query run at sfgen1000 is hours in one
JVM, and one JVM death (observed twice this round: ~2 GiB humongous
allocations under GCLocker contention) loses every completed timing.
Per-chunk artifacts bound the blast radius to one chunk; this merges
them back into the bench.py detail schema.

Merge semantics:
- `queries` / `spread` / chunk `first_run` maps: disjoint unions (a
  duplicated name across chunks is an error — chunks must partition the
  headline set);
- `value` / `first_run_total`: recomputed as the sum of the merged maps,
  never summed from the chunk summaries (a chunk re-run with overlapping
  names would double-count);
- `calibration_sec`: MIN across chunks — each chunk measures the same
  fixed pure-JVM job min-of-3, so the min is the least-loaded estimate of
  the same host constant;
- `count_fallback`: union;
- `n_queries`: size of the merged map.

Usage: python tools/merge_bench.py OUT.json chunk1.json chunk2.json ...
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    out_path, *inputs = sys.argv[1:]
    queries: dict[str, float] = {}
    spread: dict[str, float] = {}
    fallback: set[str] = set()
    cal = None
    first_run_total = 0.0
    meta = {}
    for path in inputs:
        d = json.load(open(path))
        meta.setdefault("metric", d.get("metric"))
        meta.setdefault("unit", d.get("unit"))
        meta.setdefault("sf", d.get("sf"))
        meta.setdefault("evaluated", d.get("evaluated"))
        dup = set(queries) & set(d.get("queries", {}))
        if dup:
            raise SystemExit(f"duplicate names across chunks: {sorted(dup)}")
        queries.update(d.get("queries", {}))
        spread.update(d.get("spread", {}))
        fallback.update(d.get("count_fallback", []))
        first_run_total += d.get("first_run_total", 0.0)
        c = d.get("calibration_sec")
        cal = c if cal is None else min(cal, c)
    out = {
        **meta,
        "value": round(sum(queries.values()), 3),
        "n_queries": len(queries),
        "calibration_sec": cal,
        "first_run_total": round(first_run_total, 3),
        "count_fallback": sorted(fallback),
        "chunks": len(inputs),
        "queries": queries,
        "spread": spread,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh)
    print(f"# {out_path}: {len(queries)} queries, value={out['value']}s, "
          f"calibration={cal}, chunks={len(inputs)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
