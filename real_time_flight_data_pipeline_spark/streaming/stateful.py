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
    "view_ts timestamp, clicks array<timestamp>, purchases array<timestamp>, "
    "n_seen long"
)
# Per-stage candidate cap. Exactness under arbitrary arrival order is
# guaranteed while a user has <= FUNNEL_CAND_CAP clicks (resp. purchases)
# that precede the stage they would qualify against; beyond the cap the
# largest retained candidate is shed (the funnel can then over-state a
# stage timestamp, never invent a stage). Real clickstreams keep these
# lists at 0-2 entries — candidates only accumulate while events arrive
# BEFORE the stage that admits them.
FUNNEL_CAND_CAP = 64


def _funnel_resolve(
    view_ts: Any, clicks: list, purchases: list
) -> tuple[Any, Any]:
    """Derive (click_ts, purchase_ts) from the min view and candidate lists
    — the batch query's semantics (first view, first click strictly after
    it, first purchase strictly after that) replayed over retained
    candidates, so the result is a pure function of state, independent of
    arrival order."""
    click_ts = None
    if view_ts is not None:
        after = [c for c in clicks if c > view_ts]
        click_ts = min(after) if after else None
    purchase_ts = None
    if click_ts is not None:
        after = [p for p in purchases if p > click_ts]
        purchase_ts = min(after) if after else None
    return click_ts, purchase_ts


def _prune(cands: list, answer: Any) -> list:
    """Keep only candidates that can still become the stage answer.

    The qualifying threshold (min view / min qualifying click) only ever
    DECREASES as earlier events arrive, so the stage answer is monotone
    non-increasing: any candidate above the current answer is dead. With no
    answer yet every candidate may still qualify. Capped at
    FUNNEL_CAND_CAP, shedding the largest (documented approximation)."""
    alive = sorted(c for c in cands if answer is None or c <= answer)
    return alive[:FUNNEL_CAND_CAP]


def _update_funnel_state(
    key: tuple[Any],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch rows into funnel progression state.

    Streaming twin of the funnel_view_click_purchase catalog query: first
    view, first click strictly after it, first purchase strictly after
    that. The fold is ORDER-INDEPENDENT: state keeps the min view plus
    capped candidate lists of click/purchase timestamps, and the stage
    answers are re-derived from state at emit time (_funnel_resolve), so
    late or out-of-order arrivals — a click before its view, a purchase
    replayed across chunk boundaries — converge to the same result as the
    batch query. Arrow may split one group's micro-batch across several
    chunks (maxRecordsPerBatch); because the fold is commutative the chunk
    boundaries and intra-chunk ordering are irrelevant, no sort needed.
    State is O(1) + two lists bounded by FUNNEL_CAND_CAP.
    """
    view_ts, clicks, purchases, n_seen = (
        state.get if state.exists else (None, [], [], 0)
    )
    clicks = list(clicks) if clicks is not None else []
    purchases = list(purchases) if purchases is not None else []
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n_seen += len(pdf)
        for t, ts in zip(pdf["event_type"], pdf["ts"]):
            if t == "view":
                if view_ts is None or ts < view_ts:
                    view_ts = ts
            elif t == "click":
                clicks.append(ts)
            elif t == "purchase":
                purchases.append(ts)
    click_ts, purchase_ts = _funnel_resolve(view_ts, clicks, purchases)
    clicks = _prune(clicks, click_ts)
    purchases = _prune(purchases, purchase_ts)
    state.update((view_ts, clicks, purchases, n_seen))
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
