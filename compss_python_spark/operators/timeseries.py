"""Time-series resampling: regularize an event stream onto a fixed-interval
grid per series, filling gaps by carry-forward — the standard prep step
before windowed feature extraction or downsampled storage (TimescaleDB's
time_bucket_gapfill / Pandas resample().ffill(), Spark-first).

Plan shape: ONE map-combined groupBy(series, bucket) collapses raw events
to the grid; per-series bounds are a second tiny aggregate; the spine is a
`sequence` explode off the bounds row (narrow — no driver loop, no
cross-join with a calendar table); the fill is a per-series ordered window
(partitioned by series key, never global).  Each series' state is
independent — the whole thing scales horizontally with series count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INTERVALS = {"day": "interval 1 day", "hour": "interval 1 hour",
              "week": "interval 1 week", "minute": "interval 1 minute"}


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval: str = "day",
    agg: str = "sum",
) -> DataFrame:
    """Aggregate ``value_col`` per (``key_col``, truncated ``ts_col``)
    bucket, expand each series to EVERY bucket between its first and last
    observation, and forward-fill buckets with no data.

    Returns (key, bucket, v, v_ffill, is_gap): v is the bucket aggregate
    (null on gaps), v_ffill carries the last observed aggregate forward,
    is_gap marks synthesized rows.  The leading bucket is never a gap by
    construction (bounds start at the first observation), so v_ffill is
    total.
    """
    if interval not in _INTERVALS:
        raise ValueError(f"resample_ffill: interval must be one of {sorted(_INTERVALS)}")
    agg_fn = getattr(F, agg)
    g = (
        df.groupBy(
            F.col(key_col).alias("_k"), F.date_trunc(interval, F.col(ts_col)).alias("bucket")
        )
        .agg(agg_fn(value_col).alias("v"))
    )
    bounds = g.groupBy("_k").agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
    spine = bounds.select(
        "_k",
        F.explode(
            F.expr(f"sequence(_lo, _hi, {_INTERVALS[interval]})")
        ).alias("bucket"),
    )
    joined = spine.join(g, ["_k", "bucket"], "left")
    w = (
        Window.partitionBy("_k")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.col("_k").alias(key_col),
        "bucket",
        "v",
        F.last("v", ignorenulls=True).over(w).alias("v_ffill"),
        F.col("v").isNull().alias("is_gap"),
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_rows: int = 20,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-series rolling z-score: each observation scored against the mean
    and sample stddev of its ``window_rows`` PRECEDING observations (the
    point itself excluded, so a spike can't mask itself).  Rows without at
    least two predecessors get a null z.

    One per-series ordered window — partitioned by the series key, so state
    is bounded by window_rows per series and parallelism scales with series
    count.  ``tiebreak_col`` (strongly recommended) makes the frame
    deterministic when timestamps tie.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-window_rows, -1)
    )
    mean, std = F.avg(value_col).over(w), F.stddev_samp(value_col).over(w)
    return df.select(
        key_col,
        ts_col,
        *( [tiebreak_col] if tiebreak_col else [] ),
        F.col(value_col).alias("v"),
        ((F.col(value_col) - mean) / std).alias("z"),
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval: str = "day",
    agg: str = "sum",
) -> DataFrame:
    """Like :func:`resample_ffill` but gaps are LINEARLY INTERPOLATED
    between the surrounding observed buckets (sensor/metric semantics,
    where a gap means "no reading", not "zero"): returns
    (key, bucket, v, v_interp, is_gap).  Interior gaps interpolate on the
    epoch-seconds axis; the spine is bounded by each series' first/last
    observation, so every gap has both neighbors by construction.

    Two additional per-series window passes (previous / next observed
    value+time via IGNORE NULLS frames) on top of the ffill plan — still
    nothing global.
    """
    base = resample_ffill(df, key_col, ts_col, value_col, interval, agg)
    t = F.unix_timestamp("bucket").cast("double")
    obs_t = F.when(F.col("v").isNotNull(), t)
    wp = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    pv = F.last("v", ignorenulls=True).over(wp)
    pt = F.last(obs_t, ignorenulls=True).over(wp)
    nv = F.first("v", ignorenulls=True).over(wn)
    nt = F.first(obs_t, ignorenulls=True).over(wn)
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(pv + (nv - pv) * (t - pt) / (nt - pt))
    )
    return base.select(
        key_col, "bucket", "v", interp.alias("v_interp"), "is_gap"
    )


def ewma_bounded(
    df,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    alpha: float = 0.3,
    lookback: int = 20,
    join_partitions: int | None = None,
):
    """Exponentially weighted moving average with a BOUNDED lookback of
    ``lookback`` observations: ewma_t = Σ_{j<L} (1−α)^j·x_{t−j} /
    Σ_{j<L} (1−α)^j, renormalized over the rows actually present (so the
    series head isn't biased toward zero).

    The unbounded EWMA recurrence is inherently sequential; the bounded
    form is exact and embarrassingly parallel: one row_number window per
    entity, then a banded self-join on (entity, rank distance < L) with
    closed-form weights — fan-out is a constant L per row, the join keys
    on the entity, and both engines express it identically (which is what
    makes the oracle hash-exact; a float recurrence would accumulate
    engine-ordering ulps).

    ``join_partitions`` widens the banded join's shuffle beyond the
    session default: the join stream fans out ≤2L× the input, so at the
    third decade (100 M rows, L=20) the default 32-partition shuffle
    spills (SCALE.md round-8: 170.6 s vs ~100 s linear fit).  Both sides
    repartition on the join keys themselves, so the join reuses that
    partitioning (no extra exchange) and the per-task spill shrinks
    ~(join_partitions/default)×; the post-join aggregate is map-side
    combined before its own (session-width) exchange, so only the fat
    join stage needs the width.  None keeps the session default — on a
    real cluster, size it as rows·2L·row_bytes / 64 MB.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("_e").orderBy(F.col("_ts").asc(), F.col("_tb").asc())
    base = df.select(
        F.col(entity_col).alias("_e"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(value_col).cast("double").alias("_v"),
    ).withColumn("_rn", F.row_number().over(w))
    # Banded equi-join: bucket = rn div L; a row b can only serve rows a
    # with a.rn ∈ [b.rn, b.rn+L), i.e. a.bucket ∈ {b.bucket, b.bucket+1}.
    # Duplicating the b side into those two buckets turns the band into an
    # EQUI join on (entity, bucket) with fan-out ≤ 2L per row — a bare
    # join on the entity would be O(n²) per entity at 100 TB.
    a = base.select(
        F.col("_e"),
        F.col("_ts"),
        F.col("_tb"),
        F.col("_rn").alias("_rna"),
        F.floor(F.col("_rn") / lookback).alias("_bkt"),
    )
    b = base.select(
        F.col("_e"),
        F.col("_rn").alias("_rnb"),
        F.col("_v"),
        F.explode(
            F.array(
                F.floor(F.col("_rn") / lookback),
                F.floor(F.col("_rn") / lookback) + 1,
            )
        ).alias("_bkt"),
    )
    if join_partitions is not None:
        a = a.repartition(join_partitions, "_e", "_bkt")
        b = b.repartition(join_partitions, "_e", "_bkt")
    wgt = F.pow(F.lit(1.0 - alpha), F.col("_rna") - F.col("_rnb"))
    joined = a.join(b, ["_e", "_bkt"]).filter(
        (F.col("_rnb") <= F.col("_rna"))
        & (F.col("_rnb") > F.col("_rna") - lookback)
    )
    return (
        joined.groupBy("_e", "_ts", "_tb")
        .agg(F.round(F.sum(wgt * F.col("_v")) / F.sum(wgt), 6).alias("ewma"))
        .select(
            F.col("_e").alias(entity_col),
            F.col("_ts").alias(ts_col),
            F.col("_tb").alias(tiebreak_col),
            "ewma",
        )
    )


def mad_outliers(
    df,
    entity_col: str,
    value_col: str,
    threshold: float = 3.0,
):
    """Robust per-entity outlier flags via MAD (median absolute
    deviation): flag |v − median| > threshold · 1.4826 · MAD (the normal
    consistency constant).  Immune to the outliers themselves, unlike a
    z-score.  Two exact per-entity percentile aggregates (median of v,
    then median of |v − med|) — map-combined group aggs keyed on the
    entity, no windows.  Returns the input plus (med, mad, is_outlier)."""
    from pyspark.sql import functions as F

    med = df.groupBy(entity_col).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("med")
    )
    j = df.join(med, entity_col)
    mad = (
        j.withColumn("_ad", F.abs(F.col(value_col) - F.col("med")))
        .groupBy(entity_col)
        .agg(F.percentile(F.col("_ad"), F.lit(0.5)).alias("mad"))
    )
    out = j.join(mad, entity_col)
    return out.withColumn(
        "is_outlier",
        F.abs(F.col(value_col) - F.col("med"))
        > F.lit(threshold) * F.lit(1.4826) * F.col("mad"),
    )
