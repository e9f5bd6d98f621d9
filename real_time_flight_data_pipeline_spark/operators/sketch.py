"""Misra-Gries heavy-hitter candidates: bounded-memory frequency sketch.

The exact way to find items with frequency > N/φ⁻¹ is a full groupBy — a
shuffle keyed on EVERY distinct item. At 100 TB token/n-gram scale the
distinct set (vocab, n-grams, URLs) can be billions of keys while the
answer is a handful of rows; the shuffle is dominated by keys that cannot
possibly qualify. Misra-Gries bounds that: each partition keeps at most
``capacity`` counters, and any item whose TRUE partition frequency exceeds
n_p/(capacity+1) is guaranteed to survive the partition's summary
(Misra & Gries 1982, "Finding repeated elements"). Pigeonhole lifts the
guarantee to the global stream: if an item's global frequency exceeds
N/(capacity+1), it must exceed n_p/(capacity+1) in at least one partition,
so the UNION of per-partition survivors is a SUPERSET of every item with
global frequency > N/(capacity+1). A final exact recount over that small
candidate set (broadcast semi join — no full-vocab shuffle) turns the
superset into an exact answer for any threshold φ ≥ 1/(capacity+1).

Cost shape at 100 TB: one scan, O(partitions × capacity) candidate rows to
the driver-side of the plan (a broadcast), then one map-combined recount
shuffle bounded by the candidate set — never by the vocabulary.

The per-chunk update is the weighted (mergeable) form: value_counts() the
Arrow chunk (vectorized, no per-row Python), add into the running counter
dict, and when the dict exceeds capacity subtract the (capacity+1)-th
largest count from everything and drop the non-positive counters. That
subtraction is exactly the classic decrement step applied in bulk, so the
per-partition error stays ≤ n_p/(capacity+1) (Agarwal et al. 2013,
"Mergeable summaries", PODS'12).

No counterpart in the reference (its analytics are seven SQL statements —
SURVEY.md §2); this is north-star tooling for corpus/token analysis.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def misra_gries_candidates(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries over ``df[col]``.

    Returns a DataFrame (col STRING, lower_bound LONG): at most ``capacity``
    rows per input partition, guaranteed to include every item whose global
    frequency exceeds N/(capacity+1). ``lower_bound`` is the residual
    counter value — a lower bound on the item's partition frequency, kept
    for diagnostics; exact counts come from the caller's recount pass.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    def summarize(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One dict for the WHOLE partition: the iterator spans every Arrow
        # chunk of the task's partition, so candidates reflect the full
        # partition stream, not per-chunk islands.
        counters: dict[str, int] = {}
        for pdf in pdfs:
            for item, cnt in pdf[col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > capacity:
                # Bulk decrement: subtract the (capacity+1)-th largest count
                # so at most `capacity` counters stay positive.
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {k: v - cut for k, v in counters.items() if v > cut}
        yield pd.DataFrame(
            {
                col: list(counters.keys()),
                "lower_bound": pd.Series(list(counters.values()), dtype="int64"),
            }
        )

    return df.select(col).mapInPandas(summarize, f"{col} string, lower_bound long")
