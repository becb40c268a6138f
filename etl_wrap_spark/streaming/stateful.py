"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.9 extension surface).

The state store holds one pandas-serializable tuple per group key;
watermark-driven timeouts expire idle state. This is the engine's home
for streaming semantics the built-in windowed aggregates can't express
(running totals that never re-emit history, cross-batch counters,
custom session payloads).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTAL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = "n BIGINT, total DOUBLE"


def running_totals(events: DataFrame, key_col: str = "user_id", value_col: str = "value") -> DataFrame:
    """Per-key running (event count, value sum) across micro-batches —
    state survives batches and restarts via the checkpoint.

    Emits one updated row per key per batch (update output mode)."""

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].astype(float).sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTAL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
