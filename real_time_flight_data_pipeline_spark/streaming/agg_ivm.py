"""Streaming incremental aggregate maintenance (additive-state IVM sink).

The batch query ``events_daily_agg_ivm`` proves merge == recompute for
mergeable partials (count / exact-cents sum / min / max). This module is
its streaming twin: a ``foreachBatch`` sink that maintains the daily
rollup table across micro-batches WITHOUT rescanning history — and stays
exactly-once under micro-batch replay.

Exactly-once design: additive merges are NOT idempotent (re-applying a
replayed batch would double-count), and unlike the fact pipeline's keyed
LWW merge there is no natural key to absorb the replay. The standard fix,
used here: state is stored as EPOCH PARTIALS ``(epoch_id, day, partials)``
— applying batch N means *replacing* every epoch-N row (delete + insert,
one versioned-parquet commit), which is idempotent by construction. The
queryable rollup is a tiny re-aggregate over the partials, O(epochs x
days-per-epoch), and ``compact()`` folds old epochs into a base epoch so
state never grows with stream lifetime. This is the same commit discipline
Structured Streaming's own sinks use (epoch-scoped atomic commits), built
on the repo's versioned ``ParquetTable``.

Reference: streaming/pipeline.py foreachBatch warehouse merge (T1-T3) —
this adds the additive-aggregate state shape the LWW merge cannot express.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .pipeline import ParquetTable

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("epoch_id", T.LongType()),
        T.StructField("day", T.DateType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
        T.StructField("min_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_BASE_EPOCH = -1  # compacted history lives under this reserved epoch

_WM_SCHEMA = T.StructType([T.StructField("up_to_epoch", T.LongType())])


def _partials(batch: DataFrame) -> DataFrame:
    return batch.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def _merge(partials: DataFrame) -> DataFrame:
    return partials.groupBy("day").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_cents").alias("sum_cents"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


class DailyAggState:
    """Epoch-partial additive state over (day) with an idempotent
    ``apply_batch`` — the foreachBatch sink body."""

    def __init__(self, spark: SparkSession, path: str):
        self.table = ParquetTable(spark, path, _STATE_SCHEMA)
        # Compaction watermark, PERSISTED (r7, ADVICE r6): a compacted
        # epoch's rows were merged into the base epoch, so the epoch
        # filter in apply_batch would remove nothing and a replay would
        # double-count. The horizon therefore lives in durable state
        # (not a caller convention) and apply_batch refuses anything at
        # or below it.
        self._wm_table = ParquetTable(
            spark, os.path.join(path, "_compaction_wm"), _WM_SCHEMA
        )
        # In-memory cache of the persisted horizon: the durable table is
        # the source of truth across restarts, but a high-frequency
        # stream must not pay a parquet read per micro-batch for a value
        # that only changes in compact(). Freshness is checked against
        # the ParquetTable's commit POINTER (one tiny local file read,
        # no Spark job): any writer — including ANOTHER handle on the
        # same path — flips the pointer, so a stale cache can never pass
        # a guard a fresh read would fail (r7 review: a version-blind
        # cache let a second handle regress the watermark).
        self._wm_cache = None
        self._wm_cache_ver = object()  # sentinel: != any real version

    def _watermark(self) -> int | None:
        ver = self._wm_table._current_version()
        if ver != self._wm_cache_ver:
            row = self._wm_table.read().agg(F.max("up_to_epoch")).head()
            self._wm_cache = row[0] if row and row[0] is not None else None
            self._wm_cache_ver = ver
        return self._wm_cache

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        """Replace epoch ``epoch_id``'s partials with this batch's —
        replaying the same (batch, epoch) pair is a no-op on the final
        state, which is what checkpoint-recovery replay requires.
        Raises for epochs at/below the persisted compaction watermark:
        those partials were folded into the base epoch and are final —
        re-applying them would double-count."""
        if epoch_id == _BASE_EPOCH:
            raise ValueError(f"epoch {_BASE_EPOCH} is reserved for compaction")
        wm = self._watermark()
        if wm is not None and epoch_id <= wm:
            raise ValueError(
                f"epoch {epoch_id} is at/below the compaction watermark "
                f"{wm}: its partials are final (folded into the base "
                "epoch); a replay here would double-count"
            )
        new = _partials(batch).select(
            F.lit(epoch_id).cast("long").alias("epoch_id"), "*"
        )
        state = self.table.read().filter(F.col("epoch_id") != epoch_id)
        self.table.overwrite(state.unionByName(new))

    def compact(self, up_to_epoch: int) -> None:
        """Fold every epoch <= up_to_epoch into the base epoch: state size
        becomes O(days) + O(open epochs) regardless of stream lifetime.
        Epochs above the horizon stay replayable (their replacement is
        still idempotent); compacted ones are final — enforced by the
        persisted watermark, so the caller contract is 'pass a horizon
        the checkpoint can no longer replay' and a violation fails loudly
        instead of corrupting the rollup. The watermark is MONOTONE: a
        compact BELOW the current horizon is rejected — persisting a
        lower value would re-open already-final epochs for replay —
        while an == re-compact is allowed (and idempotent), which is
        what crash recovery needs given the write order below.

        Write order (r7 review fix): the watermark commits BEFORE the
        fold. A crash between the two leaves epochs <= horizon marked
        final but not yet folded — apply_batch then refuses their
        replay (fail-loud) and re-running compact(horizon) completes
        the fold. The reverse order would leave folded epochs
        unguarded: a replay would double-count silently."""
        wm = self._watermark()
        if wm is not None and up_to_epoch < wm:
            raise ValueError(
                f"compaction horizon {up_to_epoch} is below the current "
                f"watermark {wm}: the watermark is monotone (lowering it "
                "would re-open final epochs for double-counting replay)"
            )
        self._wm_table.overwrite(
            self.table.spark.createDataFrame(
                [(int(up_to_epoch),)], _WM_SCHEMA
            )
        )
        self._wm_cache_ver = object()  # invalidate: next read re-resolves
        state = self.table.read()
        old = state.filter(F.col("epoch_id") <= up_to_epoch)
        rest = state.filter(F.col("epoch_id") > up_to_epoch)
        base = _merge(old).select(
            F.lit(_BASE_EPOCH).cast("long").alias("epoch_id"), "*"
        )
        self.table.overwrite(base.unionByName(rest))

    def view(self) -> DataFrame:
        """The queryable rollup: derive the non-mergeable columns (avg)
        from the merged partials at read time."""
        merged = _merge(self.table.read())
        sum_value = F.col("sum_cents").cast("double") / 100
        return merged.select(
            "day",
            "n_events",
            sum_value.alias("sum_value"),
            (sum_value / F.col("n_events")).alias("avg_value"),
            "min_value",
            "max_value",
        )
