"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints FOUR
JSON lines, each independently parseable (round-7 lesson: the driver's
tail buffer truncated a single long line into an unparseable artifact):

1. FIRST the detail line (<~4 KB): summary keys plus {"queries":
   {name: sec}, "spread": {name: sec}} — per-query steady minima and
   spreads (also written to ``BENCH_DETAIL.json``).
2. {"spread": {name: sec}} alone (~1.2 KB) and then
3. {"queries": {name: sec}} alone (~1.2 KB) — the driver keeps only the
   last ~2.2 KB of stdout, which beheaded the combined detail line every
   round and left PERF's per-query comparison empty (r12 VERDICT item 3);
   the times line plus the summary fit that window together, the spread
   line survives when there is room.
4. LAST a compact summary (<~300 B): {"metric", "value", "unit", "sf",
   "n_queries", "calibration_sec", "first_run_total"} — the short line
   must come last (round-8 lesson: the reverse order beheaded the
   artifact again).  The per-query FIRST-RUN map (cold-JVM profile) goes
   to ``BENCH_FIRSTRUN.json`` next to this script.

``calibration_sec`` is a fixed pure-JVM measurement
(min-of-3 ``spark.range(500M).sum()``) so cross-round wall-clock can be
normalized for host speed: round-7's driver and judge disagreed 6×
uniformly on identical code — ambient host load, not code — and without a
calibration row every round-over-round table is interpretive.

Each query is executed to completion — and "completion" means EVERY
output column of EVERY row is computed, not ``.count()``: Catalyst prunes
row-preserving operators (windows, projections) out of a count-only plan,
so counting would time a plan the query never promised (round-8 lesson —
a window-EWMA prototype "ran" 100 M rows in 0.5 s under count()).  The
timed action hashes the full output row (`xxhash64(struct(*))` summed,
pure JVM) so wall-clock includes scan, shuffle and materialization of the
complete declared result; queries with unhashable output types fall back
to count().

Methodology — BOTH cost profiles are reported so round-over-round
comparisons never conflate measurement with optimization (round-5 lesson):

- ``first_run`` — each query's very first execution in a fresh JVM, in
  registry order.  Charges C2-JIT compilation, codegen, parquet footer and
  page-cache misses to whichever query touches each path first; the
  cold-start profile.
- ``queries`` (headline metric) — steady state: after the first pass, TWO
  more timed passes (THREE for queries over 1 s, where host noise
  dominates round-over-round deltas) with the per-query minimum reported
  (noise-robust on a multi-tenant host; observed 3×+ uniform inflation
  from ambient load), plus a per-query ``spread`` (max−min of the steady
  passes) so |delta| < spread reads as noise, not regression.
  This is the 100 TB-relevant number — no long-running cluster job pays
  JIT per-query.  Data caching is NOT involved (no .persist survives a
  query; clearCache runs between queries, and the OS page cache on a
  70 MB sf0.1 scan is equally warm for every pass after the first read).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from compss_python_spark.plans import REGISTRY  # noqa: E402
from compss_python_spark.session import get_spark  # noqa: E402


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def _release_stray_blocks(spark) -> None:
    """Between-query hygiene (UNtimed), extending the existing clearCache:
    also unpersist any RDD still persisted after a query completes —
    localCheckpoint blocks (width.ensure_min_partitions pins, operators'
    collapse barriers) are NOT covered by catalog.clearCache (it clears the
    CacheManager, not RDD storage), so they accumulated across the 38×4
    query executions and their memory/GC debt was billed to whichever
    query ran later (the round-2 lesson's remaining half; measured as
    end-of-run calibration drift 0.10 → 0.20 s).  Queries are independent
    (each invocation rebuilds its own plan), so no live query state can be
    referenced here."""
    # Width-guard pins first via the library's own hook (also clears the
    # pin registry so it doesn't grow across the 38×4 query executions);
    # the generic sweep below then covers operator collapse barriers.
    from compss_python_spark.caching import release_width_pins

    release_width_pins(spark)
    sc = spark.sparkContext
    try:
        # Snapshot the RDD handles FIRST (r12 ADVICE): unpersisting while
        # walking the live Scala map's iterator can throw mid-iteration and
        # the bare except would silently leave the remaining blocks pinned.
        it = sc._jsc.sc().getPersistentRDDs().iterator()
        rdds = []
        while it.hasNext():
            rdds.append(it.next()._2())
        for rdd in rdds:
            rdd.unpersist(False)
    except Exception:
        pass


def force(df) -> bool:
    """Evaluate a query to FULL completion: every output column of every
    row.  ``count()`` is not enough — Catalyst prunes row-preserving
    operators (windows, projected expressions) from a count-only plan, so
    a timed count can measure a plan that skips the operator under test.
    One xxhash64 over the output struct per row is a negligible, pure-JVM
    materialization cost; output types xxhash64 can't digest (maps) fall
    back to count().

    Returns True when the count() fallback was taken — callers record the
    set of fallback queries in the artifact, so a pruned-count timing can
    never masquerade as a full-output one (`evaluated` stays honest
    per-query, not just per-run)."""
    from pyspark.sql import functions as F

    try:
        probe = df.select(
            F.xxhash64(F.struct(*[F.col(c) for c in df.columns])).alias("_h")
        )
        # bit_xor, not sum: summing 2^63-range hashes overflows under ANSI.
        # The collect stays INSIDE the try: under deferred-analysis
        # execution (Spark Connect) unsupported-type errors only surface
        # here, and they must hit the same count() fallback.
        probe.agg(F.bit_xor("_h")).collect()
        return False
    except Exception as e:
        # Only an UNSUPPORTED-TYPE error may take the count() fallback.  A
        # transient executor/broadcast failure on a loaded host used to be
        # swallowed here too, silently degrading a full-output timing to a
        # pruned count and flagging the query (observed: a healthy
        # embedding_int8_quantize flagged while three sweep JVMs shared
        # the box).  Transients get ONE probe retry, then propagate — a
        # bench run that cannot evaluate its contract must fail loudly,
        # not record a misleading timing.
        msg = str(e)
        type_sig = (
            "DATATYPE_MISMATCH" in msg
            or "UNSUPPORTED" in msg.upper()
            or "cannot be used in grouping" in msg
            or "xxhash64" in msg
        )
        if not type_sig:
            probe.agg(F.bit_xor("_h")).collect()
            return False
        df.count()
        return True


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    headline = {n: s for n, s in REGISTRY.items() if s.headline}
    # Targeted gen-SF runs: SPARK_GRAFT_BENCH_NAMES (comma list) restricts
    # the headline set, SPARK_GRAFT_STEADY_PASSES (default 2) bounds the
    # steady passes — at sfgen1000 a full 38-query × 4-pass run is hours;
    # the artifact's n_queries and per-query maps stay honest about what
    # actually ran.  Driver runs (no env) are unaffected.
    names_env = os.environ.get("SPARK_GRAFT_BENCH_NAMES")
    if names_env:
        wanted = {n.strip() for n in names_env.split(",") if n.strip()}
        unknown = wanted - set(headline)
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_NAMES not headline: {sorted(unknown)}")
        headline = {n: s for n, s in headline.items() if n in wanted}
    steady_passes = int(os.environ.get("SPARK_GRAFT_STEADY_PASSES", "2"))
    if steady_passes < 1:
        # 0/negative would leave samples[name] empty and crash min()/max()
        # AFTER the full first-run pass — fail fast like the names check
        raise SystemExit(f"SPARK_GRAFT_STEADY_PASSES must be >= 1 (got {steady_passes})")

    # First pass (timed as first_run): JVM JIT + codegen + parquet footer /
    # page caches all cold.  clearCache between queries: operators that
    # persist internally release their own blocks, but any stray
    # cached/checkpointed block must not bleed into the next query's
    # measurement (round-2 lesson: leaked persists degraded every query
    # timed after pagerank by 40-100%).
    first_run: dict[str, float] = {}
    fallback: set[str] = set()
    for name, spec in headline.items():
        # Progress marker BEFORE the run (stderr, never stdout — the driver
        # parses stdout): a gen-SF JVM death mid-query must name its culprit
        # in the log instead of leaving an anonymous GCLocker stack (both
        # round-12 gen1000 bench deaths were unattributable without this).
        print(f"# bench first_run {name} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        if force(spec.fn(spark, sf_dir)):
            fallback.add(name)
        first_run[name] = round(time.perf_counter() - t0, 3)
        print(f"# bench first_run {name}: {first_run[name]}s", file=sys.stderr, flush=True)
        spark.catalog.clearCache()
        _release_stray_blocks(spark)

    # Steady-state passes, per-query MINIMUM (min-of-k is the standard
    # estimator of the noise-free cost).  Two passes for everyone; queries
    # whose slower pass exceeds 1 s get a THIRD pass — on a multi-tenant
    # host the heavy queries dominate the round-over-round deltas, so they
    # get the extra sample.  Per-query SPREAD (max−min across steady
    # passes) is reported so a judge can mark |delta| < spread as noise.
    samples: dict[str, list[float]] = {n: [] for n in headline}
    for _pass in range(steady_passes):
        for name, spec in headline.items():
            print(f"# bench steady p{_pass} {name} ...", file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            if force(spec.fn(spark, sf_dir)):
                fallback.add(name)
            samples[name].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            # Per QUERY, not per pass (r12 ADVICE): pinned width-guard /
            # operator checkpoint blocks otherwise accumulate across all
            # ~38 queries within a pass, re-introducing exactly the
            # cross-query GC-debt bias this helper removes in the
            # first_run and p+ loops.
            _release_stray_blocks(spark)
    for name, spec in headline.items():
        if max(samples[name]) > 1.0:
            print(f"# bench steady p+ {name} ...", file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            if force(spec.fn(spark, sf_dir)):
                fallback.add(name)
            samples[name].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        _release_stray_blocks(spark)
    times = {n: min(s) for n, s in samples.items()}
    spread = {n: round(max(s) - min(s), 2) for n, s in samples.items()}

    # Host-speed calibration: a fixed pure-JVM job (no Python, no parquet,
    # no shuffle) whose cost depends only on the host.  min-of-3 steady.
    cal = min(
        _timed(lambda: spark.range(500_000_000).groupBy().sum("id").collect())
        for _ in range(3)
    )

    common = {
        "metric": "headline_queries_total_time",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(times),
        "calibration_sec": cal,
        "first_run_total": round(sum(first_run.values()), 3),
        # Measurement contract marker: round ≤7 artifacts timed count()
        # (row-preserving operators pruned); from round 8 every output
        # column of every row is evaluated.  Cross-round per-query
        # comparisons must not read the contract change as a regression.
        "evaluated": "full_output",
        # Queries whose xxhash64 full-output probe failed at least once and
        # were timed under the (Catalyst-pruned) count() contract instead.
        # Empty in a healthy run; non-empty means those timings are NOT
        # full-output and must not be compared as such.
        "count_fallback": sorted(fallback),
    }
    # Per-query cold-JVM detail goes to a sibling file, NOT stdout — it is
    # the least-load-bearing map and the first candidate to push the detail
    # line past the driver's tail window.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FIRSTRUN.json"),
            "w",
            encoding="utf-8",
        ) as fh:
            json.dump({**common, "first_run": first_run}, fh)
    except OSError:
        pass
    # The per-query steady detail also goes to a sibling file so nothing
    # is lost, and to stdout FIRST.  The driver keeps only the LAST
    # ~2.2 KB of stdout (round-8 lesson: printing the summary first let
    # the long detail line push it out of the tail window and the
    # artifact was again unparseable) — so the <300 B summary line MUST
    # be the final thing printed.
    detail = {**common, "queries": times, "spread": spread}
    # SPARK_GRAFT_DETAIL_OUT names the detail artifact, so gen-SF runs
    # (SPARK_GRAFT_SF_DIR=.scratch/sfgen10 SPARK_GRAFT_DETAIL_OUT=
    # BENCH_GEN10.json) commit a diffable per-SF file instead of
    # clobbering the driver-SF BENCH_DETAIL.json.
    detail_name = os.environ.get("SPARK_GRAFT_DETAIL_OUT", "BENCH_DETAIL.json")
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), detail_name),
            "w",
            encoding="utf-8",
        ) as fh:
            json.dump(detail, fh)
    except OSError:
        pass
    print(json.dumps(detail))
    # The driver keeps only the last ~2.2 KB of stdout and its PERF
    # comparator could never reconstruct per-query times because the
    # combined times+spread detail line above gets beheaded by that tail
    # window (r12: `n_common: 0`, judges reconstructed from
    # BENCH_DETAIL.json).  Emit the per-query maps as two SEPARATE short
    # lines between the detail line and the summary: the times line
    # (~1.2 KB) plus the summary (~0.3 KB) fit the tail window together,
    # so per-query deltas become driver-diffable; the spread line rides
    # just above and survives whenever there is room.  Additions only —
    # the final summary line's shape is unchanged and still printed last.
    print(json.dumps({"spread": spread}))
    print(json.dumps({"queries": times}))
    print(json.dumps(common))


if __name__ == "__main__":
    main()
