"""Geospatial operators (SURVEY.md §2.1 #4, §2.3 #20, §2.9 #69)."""

from compss_python_spark.geo.geo import geo_within, read_shapefile
from compss_python_spark.ml.clustering import stdbscan

__all__ = ["geo_within", "read_shapefile", "stdbscan"]
