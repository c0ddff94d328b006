"""Query registry package.

Importing this package populates the registry with every declared query
(spark callable + optional DuckDB oracle SQL).  The driver contract
(``__spark_entry__.py``) reads :data:`REGISTRY`.
"""

from compss_python_spark.plans.registry import REGISTRY, QuerySpec, query, table

# Populate the registry (import order = initial display order).
from compss_python_spark.plans import queries_etl  # noqa: F401
from compss_python_spark.plans import queries_agg  # noqa: F401
from compss_python_spark.plans import queries_stats  # noqa: F401
from compss_python_spark.plans import queries_llm  # noqa: F401
from compss_python_spark.plans import queries_ml  # noqa: F401
from compss_python_spark.plans import queries_geo  # noqa: F401
from compss_python_spark.plans import queries_feature  # noqa: F401
from compss_python_spark.plans import queries_io  # noqa: F401

# The driver's CORRECTNESS check records only the first ~50 REGISTRY entries
# per round (dict order).  Reorder so queries without a driver row from a
# prior round come first — each round then proves a fresh batch.  Tiers:
# SLOT_PRIORITY (fixed red rows, never-slotted queries, and queries whose
# implementations changed this round), then any other unproven additions
# (new queries land here automatically), then proven.  Relative order
# within each tier is preserved (stable partition).
from compss_python_spark.plans._proven import (  # noqa: E402
    PROVEN,
    SLOT_PRIORITY,
)

_rank = {n: (0, i) for i, n in enumerate(SLOT_PRIORITY)}
_order = sorted(
    REGISTRY,
    key=lambda n, _i=iter(range(len(REGISTRY))): (
        _rank.get(n, (3,) if n in PROVEN else (2,)),
        next(_i),
    ),
)
_entries = {n: REGISTRY[n] for n in _order}
REGISTRY.clear()
REGISTRY.update(_entries)

__all__ = ["REGISTRY", "QuerySpec", "query", "table"]
