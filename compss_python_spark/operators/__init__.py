from compss_python_spark.operators import aggregation, etl, joins, setops, sort

__all__ = ["aggregation", "etl", "joins", "setops", "sort"]
