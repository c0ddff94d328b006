"""Data-layout clustering: Z-order (Morton) interleaving for
multi-dimensional scan pruning.

Why it matters at 100 TB: parquet row-group min/max statistics prune scans
on ONE sort dimension; a table range-partitioned and sorted by a Z-value
of (d1, d2, …) keeps row groups tight in EVERY interleaved dimension at
once, so selective filters on any of them skip most of the data — the
same layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`.

The Z-value is a pure JVM bit expression (unrolled shift/mask terms —
whole-stage codegen, no UDF) and plain integer arithmetic, so a SQL
oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_value(cols, bits: int = 16):
    """Morton Z-value column: interleave the low ``bits`` bits of each of
    the given integer columns (dimension d contributes bit k at position
    k·ndim + d).  Inputs must be non-negative and below 2^bits (callers
    bucket/rank real values first — e.g. ``F.ntile`` or epoch-days);
    values are masked to ``bits`` so out-of-range inputs wrap rather than
    collide across dimensions.  ndim·bits must fit a signed long."""
    ndim = len(cols)
    if ndim < 2:
        raise ValueError("zorder_value: need at least 2 columns")
    if ndim * bits > 62:
        raise ValueError(f"zorder_value: {ndim}x{bits} bits exceeds a long")
    terms = []
    for d, c in enumerate(cols):
        x = F.col(c).cast("long") if isinstance(c, str) else c.cast("long")
        for k in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(x, k).bitwiseAND(F.lit(1)), k * ndim + d
                )
            )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The identical Z-value as ANSI SQL (DuckDB dialect bit ops) — used
    by oracles and handy for engine-portable layout jobs."""
    parts = []
    for d, c in enumerate(cols):
        for k in range(bits):
            parts.append(f"((({c} >> {k}) & 1) << {k * len(cols) + d})")
    return "(" + " + ".join(parts) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    format: str = "parquet",
) -> None:
    """Write ``df`` clustered by the Z-value of ``cols``: range-partition
    on z (so each output file owns a contiguous Z range) and sort within
    partitions (so row groups inside a file are tight too), then drop the
    helper column.  Filters on ANY of ``cols`` then prune at both the
    file and row-group level via min/max stats."""
    z = zorder_value(cols, bits).alias("_z")
    out = df.withColumn("_z", z)
    out = (
        out.repartitionByRange(num_files, "_z")
        if num_files
        else out.repartitionByRange("_z")
    )
    out.sortWithinPartitions("_z").drop("_z").write.mode("overwrite").format(
        format
    ).save(path)
