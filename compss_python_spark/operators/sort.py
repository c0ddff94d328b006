"""Sort / top-k operators (SURVEY.md §2.5).

Reference sort [ref: ddf_library/functions/etl/sort.py,
range_partitioner.py]: sample-based range partition + per-fragment sort
(older versions used an odd–even transposition merge network).  Spark's
``orderBy`` IS sample-based range partition + local sort (RangePartitioning
exchange + SortExec) — exact physical parity, plus codegen.

``sort + take(n)`` fuses into TakeOrderedAndProject (per-partition heap
top-n, merge on driver) — no full sort at any scale; the reference cannot do
this (it sorts fully, then slices).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sort(df: DataFrame, cols: Sequence[str], ascending: Sequence[bool] | bool = True) -> DataFrame:
    """Global multi-column sort [ref: ddf_library/functions/etl/sort.py]."""
    if isinstance(ascending, bool):
        ascending = [ascending] * len(cols)
    exprs = [F.col(c).asc() if a else F.col(c).desc() for c, a in zip(cols, ascending)]
    return df.orderBy(*exprs)


def top_k(df: DataFrame, cols: Sequence[str], k: int, ascending: Sequence[bool] | bool = False) -> DataFrame:
    """sort + take fused — compiles to TakeOrderedAndProject."""
    return sort(df, cols, ascending).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence,
    k: int,
    rank_alias: str = "rn",
) -> DataFrame:
    """Top-k per group — engine extension (windowed rank ≤ k).

    ``order_by``: Column expressions (include a unique tiebreak for
    determinism).  Scale note: one hash shuffle on the group keys,
    per-partition sort — no global sort.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= k)
    )
