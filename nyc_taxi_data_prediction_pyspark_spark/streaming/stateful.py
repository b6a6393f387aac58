"""Custom stateful streaming operator (SURVEY.md §2.9 extension):
applyInPandasWithState — the escape hatch for semantics the built-in
windowed aggregates can't express (cross-batch accumulators, custom
eviction, session objects).

Demonstrated operator: per-user lifetime event counter + last-seen
timestamp, carried in explicit GroupState across micro-batches. State
is per-key and partitioned by the grouping key, so it scales with the
key space, not the stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, total_events long, last_value double"
STATE_SCHEMA = "total bigint, last_value double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        total, last_value = state.get
    else:
        total, last_value = 0, float("nan")
    for pdf in pdfs:
        total += len(pdf)
        if len(pdf):
            ordered = pdf.sort_values(["ts", "event_id"])
            last_value = float(ordered["value"].iloc[-1])
    state.update((total, last_value))
    yield pd.DataFrame(
        {"user_id": [user_id], "total_events": [total], "last_value": [last_value]}
    )


def user_totals_stateful(events: DataFrame) -> DataFrame:
    """events stream → per-user running totals with explicit state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
