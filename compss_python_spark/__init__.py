"""compss_python_spark — a PySpark-native analytics engine with the
capabilities of the DDF Library (eubr-bigsea/Compss-Python), re-expressed
Spark-first.

The reference [ref: ddf_library/ddf.py] exposes a fluent, lazy distributed
DataFrame (``DDF``) whose physical model is a list of pandas fragments
executed by PyCOMPSs.  This engine keeps the same *capability surface*
(operators, query semantics, ML/graph/geo algorithms) but the data model is a
``pyspark.sql.DataFrame``: partitioned, columnar, optimized by Catalyst and
executed by Tungsten.  No bespoke DAG machinery is needed — the lazy logical
plan IS Spark's logical plan.

Public entry points
-------------------
- :func:`compss_python_spark.session.get_spark` — configured SparkSession.
- :class:`compss_python_spark.ddf.DDF` — fluent facade mirroring the
  reference's ``DDF`` API (select/filter/join/group_by/...).
- ``compss_python_spark.operators.*`` — plain-function operator layer over
  DataFrames (the facade delegates here).
- ``compss_python_spark.llm`` — large-scale training-data-pipeline operators
  (dedup incl. line/span/Bloom/fuzzy/set-similarity, similarity search incl.
  IVF-PQ, text analysis, multimodal columns) beyond the reference surface.
- ``compss_python_spark.functions.sketches`` — Count-Min / HyperLogLog with
  an engine-portable md5 hash family.
- ``compss_python_spark.operators.timeseries`` — gap-filled resample,
  rolling z-score anomalies.
"""

from compss_python_spark.session import get_spark
from compss_python_spark.ddf import DDF, Context

__all__ = ["get_spark", "DDF", "Context"]
__version__ = "0.1.0"
