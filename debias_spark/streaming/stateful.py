"""Custom stateful streaming operator via applyInPandasWithState — the
escape hatch for session/state logic the declarative window forms can't
express (SURVEY §2.H guidance).  State lives in the checkpointed state
store, keyed by group; each trigger feeds the group's new rows as Arrow
batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user running event count + running value sum, maintained in
    explicit group state across triggers (a custom stateful aggregate —
    the hand-rolled equivalent of what window aggs get for free, shown
    for the cases that need arbitrary state shapes).

    The sum is carried as INTEGER CENTS, converted per row before any
    accumulation (floor(v*100 + 0.5) of the identical double is
    bit-stable across engines and batch orders) — integer addition is
    associative, so neither Arrow batch order nor batch split can drift
    the final state.  That determinism is what lets the query key carry
    a full DuckDB value oracle instead of a rows-only check."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(
                np.floor(pdf["value"].to_numpy(dtype="float64") * 100.0 + 0.5)
                .astype("int64")
                .sum()
            )
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_cents": [cents]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, value_cents long",
        stateStructType="n long, total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
