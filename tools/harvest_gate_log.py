"""Harvest a (possibly still-growing or killed-mid-run) gate log into a
gate_supervisor-schema JSON for tools/merge_gate.py.

The supervisor only writes its JSON when every name in its shard is
classified; a sweep stopped at a round boundary (or killed to free the
box) would otherwise lose hours of per-query verdicts that are sitting in
gate_rN.log.  This parses the same ✓/•/–/✗ markers with the same
classification rules (poison ✗ lines become spark_resource rows, not
failures) and writes whatever is classified; merge_gate's `missing` list
then names exactly what the stopped sweep never reached.

Usage: python tools/harvest_gate_log.py OUT.json LOG [LOG...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gate_supervisor import _POISON, _parse_log  # noqa: E402


def main() -> int:
    out_path, *logs = sys.argv[1:]
    status: dict[str, tuple[str, str]] = {}
    for path in logs:
        rows = _parse_log(path)
        # A poison row can mean two things: the JOB died (ENOSPC aborts one
        # query, the JVM survives and later verdicts are fine) or the JVM
        # died (a stopped SparkContext fails every later query with a
        # NON-poison IllegalStateException — round-12's shard-0 log recorded
        # 38 bogus failures that way).  Disambiguate by looking ahead: if
        # nothing after the poison row ever succeeds, the JVM was dead —
        # truncate there so the tail stays unclassified (merge_gate lists it
        # as missing for the mop-up); otherwise keep the row as a resource
        # verdict and keep reading.
        for i, (mk, n, line) in enumerate(rows):
            if mk == "✗" and _POISON.search(line):
                # Liveness proof = a later row that TOUCHED Spark and
                # succeeded (✓, •, or an oracle-capped – whose Spark side
                # completed).  SKIPPED/EXCLUDED – rows never start a job, so
                # they appear even after a dead JVM and prove nothing.
                alive = any(
                    m in ("✓", "•") or (m == "–" and "CAPPED" in l.upper())
                    for m, _n, l in rows[i + 1:]
                )
                if not alive:
                    rows = rows[:i]
                    break
        for mk, n, line in rows:
            if mk == "✓":
                status[n] = ("matched", line)
            elif mk == "•":
                status[n] = ("rows_only", line)
            elif mk == "–":
                if "CAPPED" in line or "capped" in line:
                    status[n] = ("capped", line)
                elif "SKIPPED" in line:
                    status[n] = ("skipped_superlinear", line)
                else:
                    status[n] = ("excluded", line)
            elif _POISON.search(line):
                status[n] = ("spark_resource", line[:300])
            else:
                status[n] = ("failure", line[:300])
    out = {
        "mode": "digest",
        "harvested_from": [os.path.basename(p) for p in logs],
        "matched": sorted(n for n, (c, _) in status.items() if c == "matched"),
        "rows_only": sorted(n for n, (c, _) in status.items() if c == "rows_only"),
        "capped": sorted(n for n, (c, _) in status.items() if c == "capped"),
        "skipped_superlinear": sorted(
            n for n, (c, _) in status.items() if c == "skipped_superlinear"),
        "excluded": sorted(n for n, (c, _) in status.items() if c == "excluded"),
        "failures": {n: line for n, (c, line) in status.items() if c == "failure"},
        "spark_resource": {n: line for n, (c, line) in status.items()
                           if c == "spark_resource"},
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"# wrote {out_path}: {len(status)} classified "
          f"({len(out['failures'])} failures, "
          f"{len(out['spark_resource'])} spark-resource)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
