"""Custom arbitrary-stateful streaming operators via
``applyInPandasWithState`` (PySpark's route to hand-written state
machines — ``flatMapGroupsWithState`` is JVM-only; SURVEY.md §7).

The state store holds one Arrow-encodable tuple per key; each
micro-batch delivers that key's new rows as pandas batches, the
callback folds them into state and emits output rows. Keys are
hash-partitioned, state is per-key and checkpointed — the operator
scales horizontally exactly like a streaming aggregation and recovers
from the checkpoint like any built-in stateful op.

Used sparingly by design: windowed aggs, streaming dedup, and
session_window cover the common cases JVM-side (see ``windows.py``);
this surface exists for semantics Catalyst cannot express — running
per-key accumulators with custom emission rules, decaying counters,
cross-event pattern state."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _running_counts_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (n_events, total_value) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n_events += len(pdf)
        total_value += float(pdf["value"].sum())
    state.update((n_events, total_value))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n_events],
            "total_value": [total_value],
        }
    )


def stateful_running_counts(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) accumulator: every micro-batch
    emits the updated cumulative totals for the users it touched.

    The built-in unbounded streaming aggregation expresses the same
    SUM/COUNT — this exists as the canonical template for state
    machines that aren't aggregations (emission-on-change, custom
    merge logic), with the same scale shape: one shuffle on the key,
    state in the store, no driver involvement."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_counts_fn,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n_events long, total_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
