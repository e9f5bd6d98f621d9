"""Custom stateful streaming operator: per-key running flight status.

Demonstrates the engine's path for operators Spark's built-ins cannot
express (SURVEY.md §7.3 escalation ladder step b): an
``applyInPandasWithState`` operator maintaining, per flight_key, the latest
snapshot and a monotone update counter across micro-batches — the streaming
form of the fact table's last-write-wins upsert (M4), with explicit state
instead of a table rewrite.

Batch-mode twin (for verification): latest_per_key + count per key.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "flight_key string, n_updates long, last_ingest timestamp, last_status string"
)
STATE_SCHEMA = "n_updates long, last_ingest timestamp, last_status string"


def _update_flight_state(
    key: tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one flight_key into running state.

    Rows are reduced by (ingest_time, status): the max-ingest row wins the
    snapshot, every row increments the counter — at-least-once replays of a
    whole batch are NOT deduplicated here (counter semantics are per
    delivery); exactly-once counters would key state on (batch_id, row_id).
    """
    (n_updates, last_ingest, last_status) = (
        state.get if state.exists else (0, None, None)
    )
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n_updates += len(pdf)
        batch_max = pdf.loc[pdf["ingest_time"].idxmax()]
        if last_ingest is None or batch_max["ingest_time"] >= last_ingest:
            last_ingest = batch_max["ingest_time"]
            last_status = batch_max["status"]
    state.update((n_updates, last_ingest, last_status))
    yield pd.DataFrame(
        {
            "flight_key": [key[0]],
            "n_updates": [n_updates],
            "last_ingest": [last_ingest],
            "last_status": [last_status],
        }
    )


def running_flight_state(staged: DataFrame) -> DataFrame:
    """Streaming DataFrame (staging schema) -> per-key running state stream.

    Emits one row per key per micro-batch in update mode. State never times
    out here (flight keys are bounded by the 3-day retention filter
    upstream; production would set an event-time timeout at the same 3 days).
    """
    return (
        staged.select("flight_key", "ingest_time", "status")
        .groupBy("flight_key")
        .applyInPandasWithState(
            _update_flight_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithState variant (Spark 4 arbitrary-state API): typed ValueState,
# the successor to applyInPandasWithState above. Same engine tier, newer
# contract — per-key running totals over integer cents.
# ---------------------------------------------------------------------------
try:  # the API is Spark 4+; import-gate so Spark 3 deployments still load
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningUserTotals(StatefulProcessor):
        """Per-user running (count, sum-of-cents) in a typed ValueState,
        emitted as an updated row per key per micro-batch."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n long, cents long")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            prev = self._state.get()
            n, cents = (prev[0], prev[1]) if prev is not None else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "total_value": [cents / 100]}
            )

        def close(self) -> None:
            pass

    def running_user_totals(events: DataFrame) -> DataFrame:
        """Streaming events -> per-user running totals via transformWithState.

        Exact money math (scaled-long cents folded in state, one division at
        emit); state is one fixed-width row per user, so memory is O(users)
        however long the stream runs."""
        from pyspark.sql import functions as F

        return (
            events.select(
                "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
            )
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=RunningUserTotals(),
                outputStructType="user_id long, n long, total_value double",
                outputMode="Update",
                timeMode="None",
            )
        )

except ImportError:  # pragma: no cover
    RunningUserTotals = None  # type: ignore[assignment]

    def running_user_totals(events: DataFrame) -> DataFrame:  # type: ignore[misc]
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark 4+ "
            "(use running_flight_state / applyInPandasWithState instead)"
        )
