"""Custom stateful streaming operators (applyInPandasWithState).

Extension surface beyond the reference (which has no streaming at all —
SURVEY.md §2.10): arbitrary per-key state maintained across micro-batches,
the Structured Streaming analogue of a custom stateful operator.

Scale notes: state lives in the state store (RocksDB-backed on a real
cluster), partitioned by the grouping key — the same hash shuffle as a
groupBy.  Watermark + timeout bound state size; without them per-key state
grows with key cardinality only (two numbers per key here).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals_stateful(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) maintained in state across micro-batches.

    Streaming-only (applyInPandasWithState requires a streaming DataFrame);
    batch equivalent is ``groupBy(key).agg(count, sum)`` — tests assert the
    two agree after replaying the same data.
    """

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [round(total, 2)]})

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} bigint, n bigint, total double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_ewma(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    alpha: float = 0.3,
    round_dp: int | None = 6,
) -> DataFrame:
    """TRUE (unbounded-recurrence) EWMA as a stateful streaming operator:
    e ← α·x + (1−α)·e per observation, per key, seeded by the key's first
    observation.  The inherently-sequential recurrence that the BATCH
    operator (operators/timeseries.ewma_bounded) deliberately truncates
    becomes natural here: state is ONE number per key, and arrival order
    supplies the sequence.  Rows are sorted by (ts, tiebreak) within each
    micro-batch; cross-batch order is the stream's delivery contract
    (bound disorder upstream with a watermark).

    Emits (key, n_obs, ewma) per key per micro-batch (update mode).
    ``round_dp=None`` emits the raw accumulator — with an exactly-
    representable alpha (0.25, 0.5) the recurrence is bit-deterministic,
    so an oracle running the same IEEE ops in the same order matches the
    full double (how the registry query hash-proves this operator)."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, e = state.get if state.exists else (0, None)
        # Concatenate the key's Arrow chunks BEFORE sorting: a group larger
        # than arrow.maxRecordsPerBatch arrives as several pdfs in source
        # order, and sorting each chunk independently silently violates the
        # documented within-batch (ts, tiebreak) order (caught at the
        # sfgen10 density — 2k rows/key — where 425/500 keys diverged from
        # the sequential oracle; sf0.01's ~67 rows/key fit one chunk).
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values([ts_col, tiebreak_col])
            for x in pdf[value_col]:
                x = float(x)
                e = x if e is None else alpha * x + (1.0 - alpha) * e
                n += 1
        state.update((n, e))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_obs": [n],
             "ewma": [e if round_dp is None else round(e, round_dp)]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} bigint, n_obs bigint, ewma double",
        stateStructType="n bigint, e double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
