"""Declarative data-quality expectations (Deequ/Great-Expectations style).

Extension surface beyond the reference (SURVEY.md §2.12): a 100 TB
ingestion pipeline gates every batch on a checks report — completeness,
uniqueness, ranges, set membership, pattern conformance — and the report
must cost ONE scan, not one job per check.

Scale shape: every check compiles to a conditional-aggregate expression;
the whole suite runs as a SINGLE map-combined aggregate over the table
(plus ``count_distinct`` terms, which Spark evaluates in the same
expand+aggregate pass).  The long-format report is a ``stack`` of the
1-row wide aggregate — rows = number of checks, never data-sized.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str        # check kind, e.g. "completeness"
    column: str
    metric: Column   # aggregate expression producing the measured value
    threshold: float  # passes iff metric >= threshold


def completeness(col: str, min_ratio: float = 1.0) -> Check:
    """Fraction of non-null values."""
    return Check(
        "completeness", col,
        F.avg(F.col(col).isNotNull().cast("double")), min_ratio,
    )


def uniqueness(col: str, min_ratio: float = 1.0) -> Check:
    """distinct / total (nulls count toward total, standard Deequ rule)."""
    return Check(
        "uniqueness", col,
        F.count_distinct(F.col(col)) / F.count(F.lit(1)), min_ratio,
    )


def in_range(col: str, lo: float, hi: float, min_ratio: float = 1.0) -> Check:
    """Fraction of non-null values inside [lo, hi]."""
    c = F.col(col)
    return Check(
        "in_range", col,
        F.avg(c.between(lo, hi).cast("double")), min_ratio,
    )


def in_set(col: str, values, min_ratio: float = 1.0) -> Check:
    """Fraction of non-null values in the allowed set."""
    return Check(
        "in_set", col,
        F.avg(F.col(col).isin(list(values)).cast("double")), min_ratio,
    )


def matches_regex(col: str, pattern: str, min_ratio: float = 1.0) -> Check:
    """Fraction of non-null values fully matching ``pattern``
    (Java∩RE2-portable dialect, same contract as llm/text PII rules)."""
    return Check(
        "matches_regex", col,
        F.avg(F.col(col).rlike(pattern).cast("double")), min_ratio,
    )


def non_negative(col: str, min_ratio: float = 1.0) -> Check:
    return Check(
        "non_negative", col,
        F.avg((F.col(col) >= 0).cast("double")), min_ratio,
    )


def expectations_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks in ONE aggregate pass.

    Returns (check, column, metric, threshold, passed) — one row per
    check, long format, deterministic order by (check, column).
    NULL comparisons (all-null column ⇒ avg of empty set) surface as
    metric NULL / passed false rather than an error.
    """
    wide = df.agg(
        *[
            F.round(c.metric, 6).alias(f"_m{i}")
            for i, c in enumerate(checks)
        ]
    )
    long = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c.name).alias("check"),
                        F.lit(c.column).alias("column"),
                        F.col(f"_m{i}").alias("metric"),
                        F.lit(float(c.threshold)).alias("threshold"),
                    )
                    for i, c in enumerate(checks)
                ]
            )
        ).alias("s")
    )
    return (
        long.select("s.*")
        .withColumn(
            "passed",
            F.coalesce(F.col("metric") >= F.col("threshold"), F.lit(False)),
        )
        .orderBy("check", "column")
    )
