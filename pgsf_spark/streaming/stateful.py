"""Custom stateful streaming operator: running per-key accumulators.

The reference's only state is the per-table watermark; a general engine
needs arbitrary keyed state across micro-batches. This is the
applyInPandasWithState pattern (Arrow-batched, executor-side state store,
checkpoint-durable): here a running (count, value-sum) per user -- the
canonical shape for streaming feature computation / per-entity counters.

Scale notes: state lives in the state store partitioned by the group key
(one shuffle per batch on user_id); each group's pandas frames stream
through the function without materializing the group history.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_user_stats(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running totals, updated every micro-batch.

    Works only on streaming DataFrames (state requires a streaming query);
    the batch equivalent is a plain groupBy aggregate (q_user_activity)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
