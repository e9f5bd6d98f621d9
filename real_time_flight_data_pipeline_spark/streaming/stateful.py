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


FUNNEL_OUTPUT_SCHEMA = (
    "user_id long, view_ts timestamp, click_ts timestamp, "
    "purchase_ts timestamp, reached_stage int, n_seen long"
)
FUNNEL_STATE_SCHEMA = (
    "view_ts timestamp, click_ts timestamp, purchase_ts timestamp, n_seen long"
)


def _update_funnel_state(
    key: tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch rows into funnel progression state.

    Streaming twin of the funnel_view_click_purchase catalog query: first
    view, first click strictly after it, first purchase strictly after
    that. State is three timestamps + a monotone row counter — O(1) per
    user forever. EXACT under per-user event-time-ordered arrival (rows
    within a batch are sorted here; across batches the source must not
    deliver a user's earlier event after a later one — the property a
    watermark-sorted replay or per-key ordered log gives). Under disorder
    an earlier-arriving view cannot retroactively re-qualify clicks that
    were rejected against the older minimum; that reconciliation is the
    batch query's job.
    """
    view_ts, click_ts, purchase_ts, n_seen = (
        state.get if state.exists else (None, None, None, 0)
    )
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n_seen += len(pdf)
        for _, row in pdf.sort_values(["ts"]).iterrows():
            t, ts = row["event_type"], row["ts"]
            if t == "view":
                if view_ts is None or ts < view_ts:
                    view_ts = ts
            elif t == "click":
                if view_ts is not None and ts > view_ts and (
                    click_ts is None or ts < click_ts
                ):
                    click_ts = ts
            elif t == "purchase":
                if click_ts is not None and ts > click_ts and (
                    purchase_ts is None or ts < purchase_ts
                ):
                    purchase_ts = ts
    state.update((view_ts, click_ts, purchase_ts, n_seen))
    if view_ts is None:  # no funnel entry yet: keep state, emit nothing
        return
    stage = 3 if purchase_ts is not None else (2 if click_ts is not None else 1)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "view_ts": [view_ts],
            "click_ts": [click_ts],
            "purchase_ts": [purchase_ts],
            "reached_stage": [stage],
            "n_seen": [n_seen],
        }
    )


def running_funnel_state(events: DataFrame) -> DataFrame:
    """Streaming events -> per-user funnel progression (update mode).

    Emits the user's current funnel row each micro-batch that touches them
    (once they have entered the funnel); the latest emission per user is
    the live conversion table the batch funnel query recomputes offline.
    """
    return (
        events.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel_state,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
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
