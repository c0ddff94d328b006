"""Join operators (SURVEY.md §2.3).

The reference implements exactly two joins [ref:
ddf_library/functions/etl/join.py, cross_join.py]: a hash-partitioned
equi-join (inner/left/right) and a cartesian product.  It has NO broadcast
join — every join shuffles both sides.  Here Catalyst's join selection
(broadcast-hash / shuffled-hash / sort-merge, AQE runtime switch) is the
physical strategy; ``broadcast_hint`` lets callers force the small-dim path
that matters at 100 TB (dim tables: region/nation/supplier are KB–MB even at
SF100k — always broadcast).

Engine extensions beyond reference parity: semi/anti joins (free in Spark).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MODE_MAP = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "outer": "full_outer",
    "full": "full_outer",
    "semi": "left_semi",
    "anti": "left_anti",
}


def join(
    df1: DataFrame,
    df2: DataFrame,
    key1: Sequence[str] | str,
    key2: Sequence[str] | str | None = None,
    mode: str = "inner",
    suffixes: tuple[str, str] = ("_l", "_r"),
    broadcast_right: bool = False,
) -> DataFrame:
    """Multi-column equi-join [ref: ddf_library/functions/etl/join.py].

    Reference semantics: key columns from BOTH sides survive when names
    differ; same-named non-key columns get suffixes.  ``broadcast_right``
    forces a broadcast-hash join (no shuffle of the big side).
    """
    if isinstance(key1, str):
        key1 = [key1]
    key2 = key1 if key2 is None else ([key2] if isinstance(key2, str) else key2)
    how = _MODE_MAP[mode]

    right = F.broadcast(df2) if broadcast_right else df2
    if list(key1) == list(key2):
        return df1.join(right, on=list(key1), how=how)

    overlap = (set(df1.columns) & set(df2.columns)) - set(key1) - set(key2)
    left = df1
    for c in overlap:
        left = left.withColumnRenamed(c, c + suffixes[0])
        right = right.withColumnRenamed(c, c + suffixes[1])
    cond = [left[a] == right[b] for a, b in zip(key1, key2)]
    return left.join(right, on=cond, how=how)


def cross_join(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Cartesian product [ref: ddf_library/functions/etl/cross_join.py].

    Scale warning (same as the reference's all-fragment-pairs pattern): output
    is |A|×|B|; only sane when one side is tiny — Spark then broadcasts it
    (BroadcastNestedLoopJoin).
    """
    return df1.crossJoin(df2)


def semi_join(df1: DataFrame, df2: DataFrame, on: Sequence[str] | str) -> DataFrame:
    """EXISTS — engine extension (not in reference, SURVEY.md §2.3 note)."""
    return df1.join(df2, on=on, how="left_semi")


def anti_join(df1: DataFrame, df2: DataFrame, on: Sequence[str] | str) -> DataFrame:
    """NOT EXISTS — engine extension (not in reference)."""
    return df1.join(df2, on=on, how="left_anti")
