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
