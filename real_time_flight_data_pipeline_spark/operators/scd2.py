"""Incremental SCD2 maintenance: apply a change batch to a type-2 table.

`plans.relational_ext.user_state_scd2_from` REBUILDS the full history from
the raw stream — correct, but a rebuild per micro-batch rescans history.
This operator is the incremental path: given the current SCD2 state and a
batch of observed states, close the open interval of every key whose
state changed and append the new current version — one keyed outer join,
no history rescan (closed rows pass through untouched).

Semantics per key in the batch (one change row per key; pre-collapse a
multi-event batch with latest_per_key):

* unseen key                  -> insert version 1, open;
* same state as the open row  -> no-op (idempotent replay of the same
  observation changes nothing);
* different state, ts AFTER the open row's valid_from -> close the open
  row at ts (half-open [valid_from, ts)), insert version+1, open;
* ts at/before the open row's valid_from -> ignored (out-of-order
  observation; the batch rebuild is the reconciliation path, same
  contract as the streaming funnel).

With one observation per key per batch, folding batches through this
operator reproduces the batch rebuild exactly — pinned by
tests/test_scd2.py::test_incremental_apply_matches_rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    state: DataFrame,
    changes: DataFrame,
    key: str = "user_id",
    state_col: str = "state",
    ts_col: str = "ts",
) -> DataFrame:
    """Return the new SCD2 state. ``state`` columns: key, version,
    state_col, valid_from, valid_to (NULL = open). ``changes`` columns:
    key, state_col, ts_col — at most one row per key."""
    ch = changes.select(
        F.col(key),
        F.col(state_col).alias("_new_state"),
        F.col(ts_col).alias("_ts"),
    )
    closed = state.filter(F.col("valid_to").isNotNull())
    opens = state.filter(F.col("valid_to").isNull())

    j = opens.join(ch, key, "full_outer")
    has_open = F.col("valid_from").isNotNull()
    has_change = F.col("_ts").isNotNull()
    is_transition = (
        has_open
        & has_change
        & (F.col("_new_state") != F.col(state_col))
        & (F.col("_ts") > F.col("valid_from"))
    )

    # Surviving open rows: untouched, or closed by a transition.
    kept_opens = j.filter(has_open).select(
        key,
        "version",
        state_col,
        "valid_from",
        F.when(is_transition, F.col("_ts")).alias("valid_to"),
    )
    # New open rows: transitions (version+1) and unseen keys (version 1).
    new_rows = j.filter(
        is_transition | (has_change & ~has_open)
    ).select(
        key,
        F.coalesce(F.col("version") + 1, F.lit(1)).cast("int").alias("version"),
        F.col("_new_state").alias(state_col),
        F.col("_ts").alias("valid_from"),
        F.lit(None).cast(
            dict(state.dtypes)["valid_from"]
        ).alias("valid_to"),
    )
    return closed.unionByName(kept_opens).unionByName(new_rows)
