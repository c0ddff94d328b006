"""Dependency map: which package modules does each registered query use?

The driver's per-round CORRECTNESS window records only the first ~50
REGISTRY entries, so ``plans/__init__`` front-loads queries that need
(re-)proving.  A query proven in round N can still regress in round N+k if
a SHARED helper it imports (``llm.text.tokens``, ``functions.statistics``,
…) changes while the query's own body does not — the failure mode this
module closes: given the set of package modules changed in a round
(maintained by hand in :data:`_proven.CHANGED_MODULES`), it re-slots every
proven query whose TRANSITIVE module dependencies intersect that set.

Resolution is introspective, not hand-maintained:

- per-query direct deps come from the query function's code object —
  global names that resolve to package modules / functions / classes, plus
  dotted ``compss_python_spark.…`` names in ``co_names`` (how function-level
  ``from … import`` sites appear) — so a new query is covered the moment it
  is registered;
- module→module edges come from each package module's globals (imported
  modules and the ``__module__`` of imported callables), closed
  transitively, so e.g. changing ``llm.bloom`` re-slots sketch queries that
  only import ``functions.sketches`` (which itself imports bloom's hash).

A deterministic rotating CANARY of otherwise-untouched proven queries is
appended each round (round number = count of driver CORRECTNESS files, so
no clock access), giving the driver window a steady chance to catch a
regression this static analysis missed.
"""

from __future__ import annotations

import sys
from collections.abc import Iterable

_PKG = "compss_python_spark"


def _shortname(module_name: str) -> str:
    """'compss_python_spark.llm.dedup' -> 'llm.dedup' (package-relative)."""
    return module_name[len(_PKG) + 1 :] if module_name.startswith(_PKG + ".") else module_name


def _module_refs(obj) -> set[str]:
    """Package modules referenced by a function's code object: globals that
    are package modules/callables, plus dotted import names in co_names
    (function-level ``from compss_python_spark.x.y import z`` sites)."""
    import types

    deps: set[str] = set()
    code = getattr(obj, "__code__", None)
    if code is None:
        return deps
    g = getattr(obj, "__globals__", {})
    for name in code.co_names:
        if name.startswith(_PKG):
            deps.add(_shortname(name))
            # `from compss_python_spark.x import y` leaves only the parent
            # in co_names when y is a SUBMODULE (IMPORT_FROM binds a local);
            # recover it by probing sibling co_names against sys.modules.
            for other in code.co_names:
                if f"{name}.{other}" in sys.modules:
                    deps.add(_shortname(f"{name}.{other}"))
            continue
        v = g.get(name)
        if isinstance(v, types.ModuleType) and v.__name__.startswith(_PKG):
            deps.add(_shortname(v.__name__))
        elif callable(v) and getattr(v, "__module__", "").startswith(_PKG):
            deps.add(_shortname(v.__module__))
    # nested code objects (closures / comprehensions / local defs)
    for const in code.co_consts:
        if hasattr(const, "co_names"):
            for name in const.co_names:
                if name.startswith(_PKG):
                    deps.add(_shortname(name))
    return deps


def _module_graph() -> dict[str, set[str]]:
    """module -> package modules it imports (direct edges), from the live
    globals of every compss_python_spark module.  Modules a query imports
    lazily (function-level ``from … import``) are loaded up front via a
    package walk — pure-Python imports, no Spark session, so this is cheap
    and side-effect-free."""
    import importlib
    import pkgutil
    import types

    pkg = importlib.import_module(_PKG)
    for info in pkgutil.walk_packages(pkg.__path__, prefix=_PKG + "."):
        if info.name not in sys.modules:
            try:
                importlib.import_module(info.name)
            except ImportError:
                pass  # optional-dependency module; absent deps can't change
    graph: dict[str, set[str]] = {}
    for mod_name, mod in list(sys.modules.items()):
        if not mod_name.startswith(_PKG) or mod is None:
            continue
        src = _shortname(mod_name)
        edges = graph.setdefault(src, set())
        for v in vars(mod).values():
            if isinstance(v, types.ModuleType) and v.__name__.startswith(_PKG):
                edges.add(_shortname(v.__name__))
            elif callable(v) and getattr(v, "__module__", "").startswith(_PKG):
                edges.add(_shortname(v.__module__))
    return graph


def _closure(start: set[str], graph: dict[str, set[str]]) -> set[str]:
    seen, stack = set(start), list(start)
    while stack:
        for nxt in graph.get(stack.pop(), ()):
            if nxt not in seen:
                seen.add(nxt)
                stack.append(nxt)
    return seen


def query_dependencies(registry: dict) -> dict[str, frozenset[str]]:
    """name -> transitive package-module dependency set of the query fn
    (always includes the defining queries_* module itself)."""
    graph = _module_graph()
    out: dict[str, frozenset[str]] = {}
    for name, spec in registry.items():
        fn = spec.fn
        # Close over the function's OWN references only, then add the
        # defining queries_* module itself (the body lives there) WITHOUT
        # its import closure — otherwise every query in a file would
        # inherit everything the file imports for its siblings.
        deps = _closure(_module_refs(fn), graph)
        deps.add(_shortname(getattr(fn, "__module__", _PKG)))
        out[name] = frozenset(deps)
    return out


def reslot_for_changed(
    registry: dict, proven: frozenset[str], changed_modules: Iterable[str]
) -> tuple[str, ...]:
    """Proven queries whose transitive deps intersect ``changed_modules``
    (registry order, so the slot order is deterministic)."""
    changed = set(changed_modules)
    if not changed:
        return ()
    deps = query_dependencies(registry)
    return tuple(
        n for n in registry if n in proven and deps.get(n, frozenset()) & changed
    )


def canary(proven_in_registry_order: list[str], round_no: int, k: int = 6) -> tuple[str, ...]:
    """Deterministic rotating subset of proven queries: k names starting at
    offset (round_no * k) mod len — over rounds the window walks the whole
    proven set, catching regressions the static dep map can't see."""
    n = len(proven_in_registry_order)
    if n == 0 or k <= 0:
        return ()
    start = (round_no * k) % n
    return tuple(proven_in_registry_order[(start + i) % n] for i in range(min(k, n)))


def proven_from_artifacts(
    repo_root, declared_rows_only: frozenset[str] | None = None
) -> frozenset[str]:
    """Driver-proven query names derived from the ``CORRECTNESS_r*.json``
    artifacts themselves (no hand-maintained per-round frozensets).

    A name is proven iff its MOST RECENT driver row is green: a value-hash
    match, or — for DECLARED rows-only queries, which register no oracle —
    the driver's weaker rows-only record (``err == 'no_oracle'`` with a
    recorded spark row count).  ``declared_rows_only`` (the registry names
    whose spec.sql is None) scopes that weaker rule: without the scoping,
    a query whose oracle merely failed to REGISTER would be permanently
    proven with no value check (round-8 advisory).  ``None`` preserves the
    old unscoped behavior for callers without a registry in hand.
    Evaluating only the latest row per name means a future red row
    automatically UN-proves the query, putting it back in the window's
    tier 1 next round.  Returns an empty set when no artifact parses
    (round 1, or a corrupted tree) — callers fall back to the static
    frozensets in :mod:`._proven`.
    """
    import json
    import os
    import re

    latest: dict[str, tuple[int, bool]] = {}
    try:
        files = [
            f
            for f in os.listdir(repo_root)
            if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
        ]
    except OSError:
        return frozenset()
    # numeric sort so r10 follows r09 regardless of zero-padding
    files.sort(key=lambda f: int(re.search(r"r(\d+)", f).group(1)))
    for f in files:
        rnd = int(re.search(r"r(\d+)", f).group(1))
        try:
            with open(os.path.join(repo_root, f), encoding="utf-8") as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and (declared_rows_only is None or name in declared_rows_only)
            )
            prev = latest.get(name)
            if prev is None or rnd >= prev[0]:
                latest[name] = (rnd, green)
    return frozenset(n for n, (_, g) in latest.items() if g)


def current_round(repo_root) -> int:
    """Round number inferred from the driver's CORRECTNESS_r*.json files —
    deterministic and clock-free (r01..r06 present -> round 7)."""
    try:
        import os

        return 1 + sum(
            1
            for f in os.listdir(repo_root)
            if f.startswith("CORRECTNESS_r") and f.endswith(".json")
        )
    except OSError:
        return 1
