"""Change-data-capture operators: snapshot + changelog → new snapshot
(MERGE semantics) and SCD2 validity-interval builds.

Reference parity: the reference exposes ETL mutation through full-table
transforms (etl.py replace/update paths); these operators add the
warehouse-standard incremental shapes a Spark engine is expected to cover.
Both are single-shuffle designs: last-writer-wins rides ONE window keyed on
the business key (WindowGroupLimit prunes map-side), and SCD2 is two
narrow windows over the same (entity, time) sort — no self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC batch to a snapshot (SQL MERGE / upsert semantics).

    ``changes`` carries the snapshot's data columns plus ``op_col``
    ('I'/'U'/'D') and a monotone ``seq_col`` (change sequence number;
    must be unique per key — binlog offsets are).  Snapshot rows enter the
    race as op='I' with seq = -1, so any change beats the base row.
    Last writer wins per key; a winning 'D' removes the key.

    Plan: union → ONE row_number window on (key, seq desc) → rank-1
    filter (map-side pruned) → drop tombstones.  One shuffle keyed on the
    business key; at 100 TB this is the canonical merge-on-read compaction
    shape, and a skewed key contributes at most one surviving row per
    input partition to the exchange.
    """
    data_cols = [c for c in snapshot.columns]
    base = snapshot.select(
        *data_cols,
        F.lit("I").alias(op_col),
        F.lit(-1).cast("long").alias(seq_col),
    )
    chg = changes.select(
        *data_cols, F.col(op_col), F.col(seq_col).cast("long")
    )
    w = Window.partitionBy(*key_cols).orderBy(F.desc(seq_col))
    return (
        base.unionByName(chg)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != "D"))
        .select(*data_cols)
    )


def scd2_intervals(
    df: DataFrame,
    entity_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) validity intervals from an event
    stream: per entity, each RUN of equal ``attr_col`` values (ordered by
    ``ts_col`` with a unique tiebreak) becomes one row
    (entity, attr, valid_from, valid_to) — ``valid_to`` NULL for the
    current run.

    Two narrow windows over the SAME (entity → ts, tiebreak) sort — Spark
    plans them in a single exchange+sort: lag() marks run heads, a running
    count of heads assigns run ids, then one groupBy(entity, run) takes
    min(ts) and the lead of the next run's start via a final lag-free
    max/lead on the aggregated (already small) run table.
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(entity_col).orderBy(*order)
    runs = (
        df.select(entity_col, attr_col, ts_col, tiebreak_col)
        .withColumn(
            "_head",
            F.when(
                F.lag(attr_col).over(w).isNull()
                | (F.lag(attr_col).over(w) != F.col(attr_col)),
                1,
            ).otherwise(0),
        )
        .withColumn("_run", F.sum("_head").over(w))
    )
    agg = runs.groupBy(entity_col, "_run").agg(
        F.first(attr_col).alias(attr_col),
        F.min(ts_col).alias("valid_from"),
    )
    w2 = Window.partitionBy(entity_col).orderBy(F.col("_run").asc())
    return agg.select(
        entity_col,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    entity_col: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension version valid
    at its timestamp (valid_from ≤ ts < valid_to, NULL valid_to = open).
    The standard consumer of :func:`scd2_intervals`.

    Plan: equi-join on the entity plus a range filter — each fact matches
    AT MOST ONE version because SCD2 intervals partition the timeline, so
    the join output is fact-sized (never a fan-out).  The per-entity
    version list is short (run count), so the range predicate evaluates on
    a bounded candidate set per fact row."""
    cond = (
        (facts[entity_col] == dim[entity_col])
        & (facts[ts_col] >= dim[valid_from])
        & (dim[valid_to].isNull() | (facts[ts_col] < dim[valid_to]))
    )
    return facts.join(dim, cond, "left").drop(dim[entity_col])


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Key-level diff of two table versions: one row per key present in
    either side, with change_type ∈ {added, removed, changed, unchanged}
    and the sorted list of columns whose values differ (NULL-safe
    comparison; empty for added/removed/unchanged).

    The regression gate of every snapshot pipeline ("what did this rerun
    change?").  Plan shape: ONE full-outer sort-merge join on the key —
    the two sides co-partition on the same key so at 100 TB this is the
    minimal possible shuffle (two scans, one exchange each); every
    column comparison is a narrow NULL-safe equality, and the changed-
    column list is a filtered array literal, not a per-column job.
    """
    cols = compare_cols or [c for c in new.columns if c not in keys]
    # presence markers (a NULL-laden row can't distinguish "absent" from
    # "present with nulls" — the literal flag can)
    o = old.select(
        *keys,
        *[F.col(c).alias(f"_o_{c}") for c in cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"_n_{c}") for c in cols],
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, keys, "full_outer")
    diff_cols = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")),
                        F.lit(c),
                    )
                    for c in cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    return j.select(
        *keys,
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(diff_cols) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        F.when(
            F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull(),
            diff_cols,
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_columns"),
    )
