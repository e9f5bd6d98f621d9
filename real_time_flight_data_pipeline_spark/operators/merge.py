"""Keyed upsert (MERGE) with per-column merge policies — no Delta required.

The reference's loader realizes four distinct upsert semantics in Postgres
(SURVEY.md §2.7): M1 insert-or-update-with-COALESCE (dims), M2 the
nullable-unique split update/insert (collapses into one merge here), M3
insert-ignore (routes), and M4 the fact's last-write-wins-with-exceptions
(apps/loader/load_warehouse.py:244-277): measures overwritten *including with
NULL*, ``ingest_time = GREATEST(old, new)``, ids ``COALESCE(new, old)``,
``last_updated = now()``.

Without delta-spark on the classpath, MERGE is emulated relationally: full
outer join of target and source on the key, then a per-column CASE. This is
itself a scale-correct plan — one shuffle on the merge key for each side
(and none for the target if it is bucketed/pre-partitioned by key). On a
Delta/Iceberg deployment the same policy table maps 1:1 onto
``MERGE WHEN MATCHED THEN UPDATE SET ...``.
"""

from __future__ import annotations

from collections.abc import Mapping
from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class MergePolicy(str, Enum):
    OVERWRITE = "overwrite"            # new value wins, even when NULL (M4 measures)
    COALESCE_NEW_OLD = "coalesce_new"  # new unless NULL, else keep old (M1 dims, M4 ids)
    COALESCE_OLD_NEW = "coalesce_old"  # keep old unless NULL (backfill-only)
    GREATEST = "greatest"              # pairwise max (M4 ingest_time)
    KEEP_OLD = "keep_old"              # insert-ignore for matched rows (M3)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    policies: Mapping[str, MergePolicy],
    default: MergePolicy = MergePolicy.OVERWRITE,
    set_on_update: Mapping[str, Column] | None = None,
    null_safe_keys: bool = True,
) -> DataFrame:
    """Return the merged table: target upserted with source, one row per key.

    ``policies`` overrides the merge rule per column; ``set_on_update`` forces
    an expression for matched rows regardless of values (e.g. last_updated =
    a literal batch timestamp). Source must already be deduplicated to one
    row per key (use operators.dedup.latest_per_key first).

    ``null_safe_keys=False`` switches the join to plain equality — ONLY for
    keys that are non-null by construction (e.g. the fact's synthesized
    flight_key behind the F3 guard). This matters at scale: Catalyst plans
    ``<=>`` keys by hashing ``coalesce(key)``, which does NOT line up with a
    bucketed target's hash-by-key layout, so the null-safe form re-shuffles
    a bucketed 100 TB target on every merge; plain equality lets the
    bucketed scan satisfy the join's distribution with zero target-side
    Exchange (tests/test_bucketed_merge.py asserts the executed plan).

    Column set of the result == column set of ``target``.
    """
    value_cols = [c for c in target.columns if c not in keys]
    src_cols = set(source.columns)
    missing = [c for c in value_cols if c not in src_cols]

    # Presence markers are dedicated TRUE columns, not key nullability: the
    # join uses eqNullSafe precisely so NULL keys match, so a NULL-key row
    # must still read as "present" on its side after the full outer join.
    # Columns are referenced through the alias qualifier (not DataFrame
    # attribute access, which pins plan ids): target and source may share
    # lineage — e.g. re-merging the same batch into a merge's own output
    # during replay — and qualified names keep that self-join unambiguous.
    t = target.withColumn("_t_present", F.lit(True)).alias("__mt")
    s = source.withColumn("_s_present", F.lit(True)).alias("__ms")

    def tcol(name: str) -> Column:
        return F.col(f"__mt.`{name}`")

    def scol(name: str) -> Column:
        return F.col(f"__ms.`{name}`")

    if null_safe_keys:
        cond = [tcol(k).eqNullSafe(scol(k)) for k in keys]
    else:
        cond = [tcol(k) == scol(k) for k in keys]
    joined = t.join(s, cond, "full_outer")

    t_present = F.coalesce(tcol("_t_present"), F.lit(False))
    s_present = F.coalesce(scol("_s_present"), F.lit(False))

    out_cols: list[Column] = []
    for k in keys:
        out_cols.append(F.coalesce(tcol(k), scol(k)).alias(k))

    set_on_update = dict(set_on_update or {})
    for c in value_cols:
        if c in missing and c not in set_on_update:
            out_cols.append(tcol(c).alias(c))
            continue
        pol = policies.get(c, default)
        tc = tcol(c)
        sc = scol(c) if c in src_cols else F.lit(None)
        if pol is MergePolicy.OVERWRITE:
            matched = sc
        elif pol is MergePolicy.COALESCE_NEW_OLD:
            matched = F.coalesce(sc, tc)
        elif pol is MergePolicy.COALESCE_OLD_NEW:
            matched = F.coalesce(tc, sc)
        elif pol is MergePolicy.GREATEST:
            matched = F.greatest(tc, sc)
        elif pol is MergePolicy.KEEP_OLD:
            matched = tc
        else:  # pragma: no cover
            raise ValueError(f"unknown policy {pol}")
        if c in set_on_update:
            matched = set_on_update[c]
        out_cols.append(
            F.when(t_present & s_present, matched)
            .when(s_present, sc if c not in set_on_update else set_on_update[c])
            .otherwise(tc)
            .alias(c)
        )
    return joined.select(*out_cols)


def insert_if_absent(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """M3 / J6: target ∪ (source rows whose key is absent from target).
    Anti-join shape: ``WHEN NOT MATCHED THEN INSERT`` with no matched clause."""
    fresh = source.join(target.select(*keys), keys, "left_anti")
    return target.unionByName(fresh.select(*target.columns))
