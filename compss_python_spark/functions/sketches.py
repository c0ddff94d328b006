"""Fixed-memory frequency sketches.

Count-Min Sketch: a depth × width counter grid; every key increments one
counter per row (hash_j(key)), the estimate is the MIN over rows — an
upper bound on the true count whose overestimate is bounded by
(e/width)·total with probability 1 − e^(−depth).  The point at 100 TB:
per-key frequency estimates in depth·width counters — a few KB — instead
of a groupBy over billions of distinct keys; sketches from different
partitions/days merge by cell-wise addition, which here is literally the
same groupBy (the sketch IS a tiny DataFrame).

Hash family: the same engine-portable Kirsch–Mitzenmacher md5 double
hashing as :mod:`compss_python_spark.llm.bloom` — given (width, depth) the
entire sketch and every estimate are deterministic and recomputable in
ANSI SQL, so the oracle can verify not just the semantics but the exact
collision-induced overestimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from compss_python_spark.llm.bloom import _h48


def _cms_cells(col, width: int, depth: int):
    """array<struct<j,pos>>: row j's counter index for a key (string col)."""
    h1, h2 = _h48(col, 1), _h48(col, 13)
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), ((h1 + F.lit(j) * h2) % F.lit(width)).alias("pos")
            )
            for j in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key_col: str, width: int = 1024, depth: int = 3
) -> DataFrame:
    """Build a Count-Min sketch over ``df[key_col]`` as a DataFrame of
    (j, pos, cnt) — at most depth × width rows however large the input.
    ONE map-combined shuffle keyed on the (well-distributed) counter cell;
    union two builds and re-aggregate to merge sketches.  Null keys are
    excluded explicitly (md5(null) is null, so they could never hash to a
    cell; the filter makes that contract visible rather than an accident
    of explode-drops-null)."""
    cells = df.filter(F.col(key_col).isNotNull()).select(
        F.explode(_cms_cells(F.col(key_col).cast("string"), width, depth)).alias("c")
    )
    return (
        cells.select(F.col("c.j").alias("j"), F.col("c.pos").alias("pos"))
        .groupBy("j", "pos")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 3,
    output_col: str = "est_count",
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: min over the
    depth counters (0 for a never-seen key).  The sketch (≤ depth·width
    rows) broadcasts; the keys side stays partition-local.  Null keys are
    dropped (they were never counted; see :func:`cms_build`)."""
    keys = keys.filter(F.col(key_col).isNotNull())
    k = keys.select(
        F.col(key_col),
        F.explode(_cms_cells(F.col(key_col).cast("string"), width, depth)).alias("c"),
    ).select(key_col, F.col("c.j").alias("j"), F.col("c.pos").alias("pos"))
    joined = k.join(F.broadcast(sketch), ["j", "pos"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias(output_col)
    )


# --- HyperLogLog ----------------------------------------------------------

_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_build(
    df: DataFrame, key_col: str, b: int = 6, group_cols: list[str] | None = None
) -> DataFrame:
    """HyperLogLog registers over ``df[key_col]`` as a DataFrame of
    ([group_cols...,] idx, rho_max) — at most 2^b rows per group.  The
    48-bit md5 hash splits into a b-bit register index (low bits) and a
    (48−b)-bit pattern w; rho is the leading-zero count of w plus one,
    computed EXACTLY via the length of w's minimal binary string (Spark
    `conv(…,10,2)` == DuckDB `bin()`) — no float log2, so registers are
    bit-reproducible in SQL.  ONE map-combined groupBy; merge sketches by
    union + re-max.  ``group_cols`` gives per-group cardinality sketches
    (e.g. distinct users per event type) from the same single pass.
    Null keys are excluded (a null contributes no distinct value; without
    the filter md5(null) would register a spurious idx=null row)."""
    m = 1 << b
    g = list(group_cols or [])
    df = df.filter(F.col(key_col).isNotNull())
    h = _h48(F.col(key_col).cast("string"), 1)
    w = F.floor(h / m).cast("long")
    width = 48 - b
    binlen = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w > 0, F.lit(width) - binlen + 1).otherwise(F.lit(width) + 1)
    return (
        df.select(
            *g, (h % m).cast("int").alias("idx"), rho.cast("int").alias("_rho")
        )
        .groupBy(*g, "idx")
        .agg(F.max("_rho").alias("rho_max"))
    )


def hll_estimate(
    registers: DataFrame, b: int = 6, group_cols: list[str] | None = None
) -> DataFrame:
    """Cardinality estimate from HLL registers: one row per group
    ([group_cols...,] est, n_registers_used, n_zero_registers).  Flajolet
    et al.'s raw estimator with the standard small-range linear-counting
    correction.  The indicator sum Σ2^−M is a sum of dyadic rationals that
    fits a double's mantissa exactly (exponent spread b + (48−b−53) < 53),
    so the estimate is deterministic regardless of aggregation order — the
    SQL oracle reproduces it to the last bit before rounding."""
    m = 1 << b
    g = list(group_cols or [])
    alpha = _HLL_ALPHA.get(m, 0.7213 / (1 + 1.079 / m))
    agg = registers.groupBy(*g).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho_max"))).alias("_s"),
        F.count("*").alias("_used"),
    )
    denom = F.col("_s") + (F.lit(m) - F.col("_used"))  # absent registers: 2^0
    zeros = (F.lit(m) - F.col("_used")).cast("double")
    raw = F.lit(alpha * m * m) / denom
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    ).otherwise(raw)
    return agg.select(
        *g,
        F.round(est, 4).alias("est"),
        F.col("_used").cast("long").alias("n_registers_used"),
        (F.lit(m) - F.col("_used")).cast("long").alias("n_zero_registers"),
    )
