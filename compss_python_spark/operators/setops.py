"""Set operations (SURVEY.md §2.6).

Reference [ref: ddf_library/functions/etl/union.py, intersect.py,
difference.py]: positional union, by-name union, set/bag intersection and
difference.  All are 1:1 built-ins in Spark; intersect/subtract plan as a
hash-partitioned aggregate-join, the same physical shape the reference
implements by hand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Positional concat [ref: ddf_library/functions/etl/union.py] —
    Spark's union is also positional: exact semantic fit."""
    return df1.union(df2)


def union_by_name(df1: DataFrame, df2: DataFrame, allow_missing: bool = False) -> DataFrame:
    """[ref: ddf_library/functions/etl/union.py union_by_name]"""
    return df1.unionByName(df2, allowMissingColumns=allow_missing)


def intersect(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Set intersection [ref: ddf_library/functions/etl/intersect.py]"""
    return df1.intersect(df2)


def intersect_all(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Bag intersection [ref: ddf_library/functions/etl/intersect.py]"""
    return df1.intersectAll(df2)


def subtract(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Set difference [ref: ddf_library/functions/etl/difference.py]"""
    return df1.subtract(df2)


def except_all(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Bag difference [ref: ddf_library/functions/etl/difference.py]"""
    return df1.exceptAll(df2)
