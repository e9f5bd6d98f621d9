"""Incremental SCD2 maintenance: apply a change batch to a type-2 table.

`plans.relational_ext.user_state_scd2_from` REBUILDS the full history from
the raw stream — correct, but a rebuild per micro-batch rescans history.
This operator is the incremental path: given the current SCD2 state and a
batch of observed states, extend each affected key's history with the
batch's transitions — keyed joins and batch-sized windows only, no history
rescan (closed rows pass through untouched).

Batches may carry MULTIPLE observations per key (r7; previously the
contract was one-row-per-key and a violation silently corrupted state —
ADVICE r6). The batch's rows are ordered per key by (ts, tie-break),
appended after the key's open row, and collapsed exactly like the batch
rebuild's gaps-and-islands pass: consecutive same-state observations
extend the current interval, each state change closes the open interval
at its ts (half-open [valid_from, ts)) and opens the next version.

Per key:

* unseen key                   -> versions 1..n from the batch's islands;
* observation(s) equal to the open row's state (and nothing newer that
  differs)                     -> no-op (idempotent replay);
* state changes with ts AFTER the open row's valid_from -> each change
  point closes the previous interval and appends version+1, +2, ...;
* ts at/before the open row's valid_from -> ignored (out-of-order
  observation; the batch rebuild is the reconciliation path, same
  contract as the streaming funnel);
* key with only CLOSED rows (externally mutated table — this operator
  itself always leaves one open row per key) -> versions continue from
  the key's max closed version, never colliding with existing history.

Folding event-ordered batches of ANY size through this operator
reproduces the batch rebuild exactly — pinned by tests/test_scd2.py
(per-event fold, multi-event batches, and the availableNow streaming
drive in tests/test_streaming_scd2.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    state: DataFrame,
    changes: DataFrame,
    key: str = "user_id",
    state_col: str = "state",
    ts_col: str = "ts",
    tie_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Return the new SCD2 state. ``state`` columns: key, version,
    state_col, valid_from, valid_to (NULL = open). ``changes`` columns:
    key, state_col, ts_col, plus any ``tie_cols`` used to totalize the
    within-batch order at equal ts (the rebuild uses event_id; without a
    tie column, equal-ts rows order by state value — deterministic but
    arbitrary). Any number of rows per key.
    """
    ts_type = dict(state.dtypes)["valid_from"]
    ch = changes.select(
        F.col(key),
        F.col(state_col).alias("_st"),
        F.col(ts_col).cast(ts_type).alias("_ts"),
        *[F.col(c).alias(f"_tie{i}") for i, c in enumerate(tie_cols)],
    )
    tie = [F.col(f"_tie{i}") for i in range(len(tie_cols))] or [F.col("_st")]

    closed = state.filter(F.col("valid_to").isNotNull())
    opens = state.filter(F.col("valid_to").isNull())
    bkeys = ch.select(key).distinct()
    # Open rows of keys the batch never mentions: pass through untouched
    # (never enter a window — the whole pass is O(batch), not O(state)).
    untouched = opens.join(bkeys, key, "left_anti")
    heads = opens.join(bkeys, key, "semi")
    # Version base for batch keys with NO open row (possible only via
    # external table mutation — this operator always leaves each key one
    # open row): continue from the key's max CLOSED version instead of
    # restarting at 1 and colliding with existing history (ADVICE r7).
    # Keyed semi-join + max, O(closed rows of batch keys) — the closed
    # partition was already scanned once for the pass-through union.
    closed_base = (
        closed.join(bkeys, key, "semi")
        .groupBy(key)
        .agg(F.max("version").alias("_closed_base"))
    )

    null_tie = [
        F.lit(None).cast(dict(ch.dtypes)[f"_tie{i}"]).alias(f"_tie{i}")
        for i in range(len(tie_cols))
    ]
    seq = heads.select(
        F.col(key),
        "version",
        F.col(state_col).alias("_st"),
        F.col("valid_from").alias("_ts"),
        F.lit(0).alias("_src"),  # head sorts before any same-ts batch row
        *null_tie,
    ).unionByName(
        # Stale observations (at/before the open row's valid_from) drop out
        # here; for unseen keys _head_from is NULL and everything survives.
        ch.join(
            heads.select(F.col(key), F.col("valid_from").alias("_head_from")),
            key,
            "left",
        )
        .filter(F.col("_head_from").isNull() | (F.col("_ts") > F.col("_head_from")))
        .select(
            F.col(key),
            F.lit(None).cast("int").alias("version"),
            "_st",
            "_ts",
            F.lit(1).alias("_src"),
            *[F.col(f"_tie{i}") for i in range(len(tie_cols))],
        )
    )

    order: list[Column] = [F.col("_ts"), F.col("_src"), *tie]
    w = Window.partitionBy(key).orderBy(*order)
    # Gaps-and-islands collapse, exactly the rebuild's: keep only rows
    # that START an island (first row, or state differs from predecessor).
    kept = seq.withColumn("_prev", F.lag("_st").over(w)).filter(
        F.col("_prev").isNull() | (F.col("_prev") != F.col("_st"))
    )
    # Same window spec over the FILTERED frame: row numbers / leads now
    # step over island starts only.
    wk = w
    wkey = Window.partitionBy(key)
    kept = kept.join(closed_base, key, "left")
    # The head (if any) is always kept (row 1, carries the key's current
    # version); island i continues the numbering from it. With no head
    # (closed-only key), numbering continues from the max closed version
    # (no -1: every kept row is a NEW version in that case).
    head_base = F.max("version").over(wkey)
    rn = F.row_number().over(wk)
    version = (
        F.coalesce(head_base, F.col("_closed_base"), F.lit(0))
        + rn
        - F.when(head_base.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    )
    valid_to = F.lead("_ts").over(wk)
    applied = kept.select(
        F.col(key),
        version.cast("int").alias("version"),
        F.col("_st").alias(state_col),
        F.col("_ts").alias("valid_from"),
        valid_to.alias("valid_to"),
    )
    return closed.unionByName(untouched).unionByName(applied)
