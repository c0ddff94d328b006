"""Merge per-worker gate JSONs (check_correctness --json-out and/or
gate_supervisor output) into one GATE_GEN*.json artifact.

Precedence when the same query appears in several inputs (disjoint-name
workers shouldn't overlap, but mop-up re-runs DO re-check rows an earlier
worker could only cap or crash on): matched > rows_only > capped >
skipped_superlinear > excluded > spark_resource > failure, and a LATER
input wins ties — so a serial mop-up pass listed last upgrades any
resource-bounded verdict it managed to settle.

Usage:
  python tools/merge_gate.py OUT.json note.txt in1.json in2.json ...
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_RANK = {
    "matched": 0,
    "rows_only": 1,
    "capped": 2,
    "skipped_superlinear": 3,
    "excluded": 4,
    "spark_resource": 5,
    "failure": 6,
}


def main() -> int:
    out_path, note_path, *inputs = sys.argv[1:]
    note = open(note_path).read().strip() if note_path != "-" else ""
    best: dict[str, tuple[int, str, str]] = {}  # name -> (rank, class, detail)
    seen: dict[str, set[str]] = {}  # name -> every class it appeared under
    meta = {}
    for path in inputs:
        d = json.load(open(path))
        meta.setdefault("sf_dir", d.get("sf_dir"))
        meta.setdefault("mode", d.get("mode"))
        for cls in ("matched", "rows_only", "capped", "skipped_superlinear",
                    "excluded"):
            for n in d.get(cls, []):
                r = _RANK[cls]
                seen.setdefault(n, set()).add(cls)
                if n not in best or r <= best[n][0]:
                    best[n] = (r, cls, "")
        for n, msg in d.get("failures", {}).items():
            seen.setdefault(n, set()).add("failure")
            if n not in best or _RANK["failure"] <= best[n][0]:
                best[n] = (_RANK["failure"], "failure", msg)
        for n, msg in d.get("spark_resource", {}).items():
            seen.setdefault(n, set()).add("spark_resource")
            if n not in best or _RANK["spark_resource"] <= best[n][0]:
                best[n] = (_RANK["spark_resource"], "spark_resource", msg)

    # A query that both MATCHED and genuinely FAILED across inputs is a
    # provenance conflict (inputs spanning different code states), not a
    # mop-up upgrade — precedence would silently mask the failure, so the
    # merged artifact must carry the conflict for adjudication.
    conflicts = sorted(n for n, cls in seen.items()
                       if "matched" in cls and "failure" in cls)
    for n in conflicts:
        print(f"# CONFLICT {n}: appeared as both matched and failure across "
              f"inputs — verify the rows share one code state", file=sys.stderr)

    from compss_python_spark.plans import REGISTRY

    missing = sorted(set(REGISTRY) - set(best))
    out = {
        "sf_dir": meta.get("sf_dir"),
        "mode": meta.get("mode"),
        "registered": len(REGISTRY),
        "matched": sorted(n for n, v in best.items() if v[1] == "matched"),
        "rows_only": sorted(n for n, v in best.items() if v[1] == "rows_only"),
        "capped": sorted(n for n, v in best.items() if v[1] == "capped"),
        "skipped_superlinear": sorted(
            n for n, v in best.items() if v[1] == "skipped_superlinear"),
        "excluded": sorted(n for n, v in best.items() if v[1] == "excluded"),
        "failures": {n: v[2] for n, v in best.items() if v[1] == "failure"},
        "resource_bounded": {n: v[2] for n, v in best.items()
                             if v[1] == "spark_resource"},
        "unclassified": missing,
        "conflicts": conflicts,
        "note": note,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"# {out_path}: {len(out['matched'])} matched, "
          f"{len(out['rows_only'])} rows-only, {len(out['capped'])} capped, "
          f"{len(out['skipped_superlinear'])} skipped, "
          f"{len(out['excluded'])} excluded, {len(out['failures'])} failed, "
          f"{len(out['resource_bounded'])} resource-bounded, "
          f"{len(missing)} unclassified, {len(conflicts)} conflicts")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
