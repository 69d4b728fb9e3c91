"""Custom stateful streaming operators via ``applyInPandasWithState``.

The engine's example of an operator Spark's built-in windows can't express:
a per-user *running profile* (event count, value sum, last-seen timestamp)
maintained as explicit state across micro-batches, emitting one updated
row per user per batch.  State lives in the checkpointed state store —
resumable and partitioned by key, the 100 TB-safe shape for custom
aggregations.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.exists:
        n, s, last = state.get
    else:
        n, s, last = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            last = max(last, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, s, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s],
            "last_ts_micros": [last],
        }
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """Stateful per-user running profile over a *streaming* events frame
    (columns: user_id, ts, value).  Each micro-batch emits the updated
    cumulative row per active user; state persists in the checkpoint."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
