"""Skew mitigation: salting for hot keys (the algebraic complement of AQE).

AQE's runtime skew-join splitting (on by default in session.py:58) is the
first line of defense — it needs no code changes and splits oversized
shuffle partitions after the map stage. Salting is the *plan-level* tool for
the cases AQE cannot fix:

* ``salted_equi_join`` — a hot key on the big side of a shuffle join is
  split across ``n_salts`` sub-partitions by joining on (key, salt) with the
  small side replicated per salt. Use when the small side is too big to
  broadcast but small enough to replicate n_salts times.
* ``salted_sum_count`` — a hot group key in an aggregation is first reduced
  per (key, salt) — map-side combine still applies — then merged per key.
  Two shuffles, but each partition is bounded by rows/n_salts per key.

Salts are deterministic (xxhash64 of the full row, mod n_salts), so results
and tests are reproducible; distinct rows under a hot key scatter uniformly.
(Identical duplicate rows share a salt — for degenerate all-identical-row
skew use a monotonically_increasing_id salt instead and give up replay
determinism.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def _row_salt(df: DataFrame, n_salts: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast("int")


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi join on ``keys`` with the big side's hot keys split n_salts ways.

    The small side is replicated once per salt (n_salts x rows — it must be
    modest, just not broadcastable), so every (key, salt) bucket of the big
    side finds its match. Semantics preserved for inner and left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_equi_join preserves semantics for inner/left only")
    big_s = big.withColumn(_SALT, _row_salt(big, n_salts))
    small_s = small.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias(_SALT)
    )
    return big_s.join(small_s, [*keys, _SALT], how).drop(_SALT)


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    n_salts: int = 32,
) -> DataFrame:
    """Per-key sum(value_cols) + count(*) via salted two-phase aggregation.

    Phase 1 reduces on (keys, salt): the shuffle for a hot key is spread
    over n_salts reducers. Phase 2 merges the <= n_salts partials per key —
    a trivially small second shuffle.
    """
    salted = df.withColumn(_SALT, _row_salt(df, n_salts))
    partial = salted.groupBy(*keys, _SALT).agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(c).alias(f"_s_{c}") for c in value_cols],
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n"),
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in value_cols],
    )
