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
# prior round come first — each round then proves a fresh batch.  Relative
# order within each group is preserved (stable partition).
from compss_python_spark.plans._proven import PROVEN  # noqa: E402

_unproven = {k: v for k, v in REGISTRY.items() if k not in PROVEN}
_proven = {k: v for k, v in REGISTRY.items() if k in PROVEN}
REGISTRY.clear()
REGISTRY.update(_unproven)
REGISTRY.update(_proven)

__all__ = ["REGISTRY", "QuerySpec", "query", "table"]
