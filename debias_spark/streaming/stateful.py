"""Custom stateful streaming operator via applyInPandasWithState — the
escape hatch for session/state logic the declarative window forms can't
express (SURVEY §2.H guidance).  State lives in the checkpointed state
store, keyed by group; each trigger feeds the group's new rows as Arrow
batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user running event count + running value sum, maintained in
    explicit group state across triggers (a custom stateful aggregate —
    the hand-rolled equivalent of what window aggs get for free, shown
    for the cases that need arbitrary state shapes)."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
