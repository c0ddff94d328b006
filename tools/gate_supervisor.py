"""Crash-surviving wrapper around tools/check_correctness.py for gen-SF
digest sweeps.

Problem this solves (measured, sfgen1000 round 11): one query that OOMs
the Spark JVM (`java.lang.OutOfMemoryError: Java heap space` →
SparkContext shutdown) poisons EVERY later query in that gate process —
they all record `✗ ... Connection refused`, which reads as 90 failures
when the truth is one resource boundary.  The round-10 sweep handled this
by hand (re-running tails in fresh processes); this supervisor automates
exactly that recipe:

1. run the gate over the remaining names (fresh process, fresh JVM);
2. parse the ORDERED per-query log lines (✓ / • / – / ✗);
3. if a JVM death is detected (poison signatures below), the FIRST
   poisoned query is the culprit: retry it ONCE alone with halved task
   parallelism (fewer concurrent tasks → smaller peak task memory, same
   heap) before recording it `spark_resource`; every LATER poisoned /
   unclassified name is requeued untouched;
4. repeat until every name is classified; merge into one JSON whose
   classification matches check_correctness's --json-out schema plus a
   `spark_resource` dict (resource statements, not correctness ones).

Genuine digest mismatches (✗ without a poison signature) are recorded as
failures and do NOT stop the sweep — the gate process itself survives
those; only JVM death needs the restart.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

GATE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "check_correctness.py")

# A ✗ whose message matches one of these is a RESOURCE symptom (dead JVM,
# exhausted heap, exhausted disk), not a per-query verdict: the first one
# in log order is the culprit, the rest are poison.  The signature must
# ride on an ERROR-prefixed line — a digest mismatch whose payload happens
# to contain a word like "refused" must stay a failure, never be retried
# into a false-green spark_resource row.  No bare `shutdown` token for the
# same reason (only the full Py4J sentence counts).  check_correctness
# flattens exception text to one line (`_err`), so the root cause is
# guaranteed to be ON the ✗ line this regex sees.
_POISON = re.compile(
    r"(?:SPARK (?:DIGEST )?ERROR|ORACLE ERROR).*?("
    r"Connection refused|SparkContext was shut down|Java heap space|"
    r"Py4JNetworkError|Answer from Java side is empty|"
    r"OutOfMemoryError|SPILL_OUT_OF_MEMORY|No space left on device|"
    r"Cannot call methods on a stopped SparkContext)"
)

_LINE = re.compile(r"^(✓|•|–|✗) ([A-Za-z0-9_]+)[ :]")


def _parse_log(path: str) -> list[tuple[str, str, str]]:
    """(marker, name, full line) in log order."""
    out = []
    with open(path, encoding="utf-8", errors="replace") as fh:
        for raw in fh:
            # Spark progress bars ride on \r on the same physical line
            for line in raw.split("\r"):
                m = _LINE.match(line.strip())
                if m:
                    out.append((m.group(1), m.group(2), line.strip()))
    return out


def _run_gate(names: list[str], sf_dir: str, gate_args: list[str], env: dict,
              tag: str, workdir: str) -> list[tuple[str, str, str]]:
    names_file = os.path.join(workdir, f"names_{tag}.txt")
    log_file = os.path.join(workdir, f"gate_{tag}.log")
    with open(names_file, "w") as fh:
        fh.write("\n".join(names))
    # Unbuffered gate stdout: the per-query ✓/✗ markers are print()s, which
    # block-buffer when piped — an OS kill (OOM) would lose every marker
    # since the last flush and force completed queries to re-run, and the
    # log is unmonitorable mid-sweep.  (The JVM's progress bars bypass the
    # Python buffer, which made a silent gate LOOK live.)
    env = dict(env, PYTHONUNBUFFERED="1")
    with open(log_file, "w") as fh:
        subprocess.run(
            [sys.executable, GATE, sf_dir, *gate_args, "--names-file", names_file],
            stdout=fh, stderr=subprocess.STDOUT, env=env, check=False,
        )
    return _parse_log(log_file)


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--names-file", required=True)
    ap.add_argument("--json-out", required=True)
    ap.add_argument("--workdir", default="/tmp/gate_supervisor")
    ap.add_argument("--retry-cpus", default="6",
                    help="task parallelism for the lone-culprit retry")
    ap.add_argument("--max-restarts", type=int, default=40)
    # everything argparse does not recognize passes through to the gate
    # (argparse REMAINDER is unreliable when mixed with required options)
    a, gate_args = ap.parse_known_args()
    os.makedirs(a.workdir, exist_ok=True)
    gate_args = [g for g in gate_args if g != "--"]

    remaining = [n for n in open(a.names_file).read().split() if n]
    status: dict[str, tuple[str, str]] = {}  # name -> (class, line)
    poison_seen: dict[str, int] = {}  # task-OOM offenses per name
    restarts = 0
    env = dict(os.environ)

    def _lone_retry(name: str, orig_line: str, tag: str) -> None:
        """One solo run at reduced task parallelism; adjudicate by result."""
        print(f"# resource symptom at {name}; lone retry with "
              f"SPARK_GRAFT_CPUS={a.retry_cpus}", flush=True)
        retry_env = dict(env, SPARK_GRAFT_CPUS=a.retry_cpus)
        retry = _run_gate([name], a.sf_dir, gate_args, retry_env, tag, a.workdir)
        verdict = next((r for r in retry if r[1] == name), None)
        if verdict and verdict[0] == "✓":
            status[name] = ("matched", verdict[2] + " [lone retry]")
        elif verdict and verdict[0] == "•":
            status[name] = ("rows_only", verdict[2] + " [lone retry]")
        elif verdict and verdict[0] == "–":
            status[name] = ("capped", verdict[2] + " [lone retry]")
        elif verdict and not _POISON.search(verdict[2]):
            status[name] = ("failure", verdict[2])
        else:
            status[name] = (
                "spark_resource",
                f"resource symptom in shared worker and in lone retry "
                f"at cpus={a.retry_cpus}: {orig_line[:300]}",
            )

    while remaining and restarts <= a.max_restarts:
        tag = f"r{restarts}"
        rows = _run_gate(remaining, a.sf_dir, gate_args, env, tag, a.workdir)
        # A poison ✗ can mean two things (same disambiguation as
        # harvest_gate_log): the JOB died but the JVM survived (a task-level
        # SparkOutOfMemoryError aborts one query; every later verdict in the
        # same log is real — round-12's shard-3 sweep hit this on its FIRST
        # query, and the old cut-at-first-poison rule would have discarded
        # six hours of ✓ rows), or the JVM died (nothing after the poison
        # row ever succeeds).  Liveness proof = a later row that touched
        # Spark and completed: ✓, •, or an oracle-capped – (SKIPPED/EXCLUDED
        # – rows never start a job, so they prove nothing).
        dead_cut = None
        dead_line = ""
        alive_poison: list[tuple[str, str]] = []
        for i, (mk, n, line) in enumerate(rows):
            if mk == "✗" and _POISON.search(line):
                alive = any(
                    m in ("✓", "•") or (m == "–" and "CAPPED" in l.upper())
                    for m, _n, l in rows[i + 1:]
                )
                if alive:
                    alive_poison.append((n, line))
                else:
                    dead_cut, dead_line = i, line
                    break
        if dead_cut is not None:
            # Everything at/after the first TRAILING poison row ran against
            # a dead (or dying) JVM — including ✗ rows whose message is NOT
            # a poison signature (a stopped SparkContext surfaces as a plain
            # IllegalStateException on every later query, which round-12's
            # shard-0 sweep recorded as 38 bogus failures).  Only verdicts
            # BEFORE the culprit are trustworthy; the rest requeue.
            culprit = rows[dead_cut][1]
            rows = rows[:dead_cut]
        alive_names = {n for n, _ in alive_poison}
        classified = {n for _, n, _ in rows}
        for mk, n, line in rows:
            if n in alive_names:
                continue  # adjudicated below, never as a plain failure
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
            elif not _POISON.search(line):
                status[n] = ("failure", line)  # real verdict, keep sweeping
        # Task-level OOM with a surviving JVM: first offense requeues into
        # the next fresh-JVM round (shared-worker memory pressure is often
        # transient); second offense gets the lone retry and a final verdict.
        for n, line in alive_poison:
            poison_seen[n] = poison_seen.get(n, 0) + 1
            if poison_seen[n] >= 2:
                _lone_retry(n, line, f"{tag}_oom_{n}")
            else:
                print(f"# task-level resource error at {n} (JVM survived); "
                      f"requeued", flush=True)
        if dead_cut is not None:
            print(f"# JVM death at {culprit}", flush=True)
            _lone_retry(culprit, dead_line, f"{tag}_culprit")
            # everything poisoned AFTER the culprit + never-classified → requeue
            remaining = [n for n in remaining if n not in status]
            restarts += 1
            continue
        # normal completion: anything never classified means the process
        # died without a poison line (e.g. OS kill) — treat the first such
        # name as culprit.  First-offense task-OOM names (classified but
        # unadjudicated) requeue alongside whatever the dead process never
        # reached.
        left = [n for n in remaining if n not in classified and n not in status]
        if left:
            first = left[0]
            status[first] = ("spark_resource",
                             "gate process died with no classified line")
        requeue = [n for n in remaining if n not in status]
        if not requeue:
            break
        remaining = requeue
        restarts += 1

    out = {
        "sf_dir": a.sf_dir,
        "mode": "digest" if "--digest" in gate_args else "collect",
        "gate_args": gate_args,
        "restarts": restarts,
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
    with open(a.json_out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"# wrote {a.json_out}: {len(out['matched'])} matched, "
          f"{len(out['rows_only'])} rows-only, {len(out['capped'])} capped, "
          f"{len(out['failures'])} failed, {len(out['spark_resource'])} "
          f"spark-resource", flush=True)
    return 1 if out["failures"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
