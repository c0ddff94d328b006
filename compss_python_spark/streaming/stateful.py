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
