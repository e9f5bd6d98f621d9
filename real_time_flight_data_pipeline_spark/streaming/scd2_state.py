"""Streaming SCD2 maintenance: a foreachBatch sink over ``scd2_apply``.

``plans.relational_ext.user_state_scd2_from`` is the batch rebuild;
``operators.scd2.scd2_apply`` is its incremental twin (close + append per
key, no history rescan). This module wires the incremental operator into
the micro-batch loop the same way ``agg_ivm.DailyAggState`` wires the
additive rollup: state lives in a versioned ``ParquetTable`` (atomic
pointer-flip commits), ``apply_batch`` is the ``foreachBatch`` body.

Replay safety: ``scd2_apply`` is idempotent on its own output — replaying
a batch against the post-apply state drops every row as stale
(ts <= open valid_from) or same-state no-op — so checkpoint-recovery
replay of the last epoch leaves the table unchanged without any
epoch-tracking sidecar (the property test_streaming_scd2 pins).

Ordering contract: micro-batches must arrive in event-time order for the
fold to equal the rebuild (out-of-order observations are dropped by
contract, reconciled only by a rebuild). Within a batch any number of
rows per key is fine — ``scd2_apply`` runs the rebuild's own
gaps-and-islands collapse over (open row + batch rows).

Reference: streaming/pipeline.py foreachBatch warehouse merge (T1-T3);
this adds the versioned-history state shape the LWW merge cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.scd2 import scd2_apply
from .pipeline import ParquetTable

USER_STATE_SCD2_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("state", T.StringType()),
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("valid_to", T.TimestampType()),
    ]
)


class Scd2State:
    """SCD2 state table with an incremental ``apply_batch`` — the
    foreachBatch sink body for a user-state stream."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema: T.StructType = USER_STATE_SCD2_SCHEMA,
        key: str = "user_id",
        state_col: str = "state",
        ts_col: str = "ts",
        tie_cols: tuple[str, ...] = (),
    ):
        self.table = ParquetTable(spark, path, schema)
        self.key = key
        self.state_col = state_col
        self.ts_col = ts_col
        self.tie_cols = tie_cols

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        """Fold one micro-batch of observations (key, state, ts[, ties])
        into the SCD2 table — one atomic versioned-parquet commit."""
        state = self.table.read()
        self.table.overwrite(
            scd2_apply(
                state,
                batch,
                key=self.key,
                state_col=self.state_col,
                ts_col=self.ts_col,
                tie_cols=self.tie_cols,
            )
        )

    def read(self) -> DataFrame:
        return self.table.read()
