"""Custom stateful streaming operator via applyInPandasWithState.

The engine's extension point for operators Structured Streaming lacks
natively (SURVEY.md §2B streaming row): arbitrary per-key state carried
across micro-batches, Arrow-batched. Demonstrated with a per-user
running aggregate (count + sum + max event_id) whose final values must
equal the batch groupBy — asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, max_event_id bigint"
STATE_SCHEMA = "n bigint, total double, max_id bigint"


def _update_user_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, max_id = state.get
    else:
        n, total, max_id = 0, 0.0, -1
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        max_id = max(max_id, int(pdf["event_id"].max()))
    state.update((n, total, max_id))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "max_event_id": [max_id],
        }
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running stats with explicit state across micro-batches."""
    from batch_processing_new_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(events_stream.sparkSession)
    return (
        events_stream.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
