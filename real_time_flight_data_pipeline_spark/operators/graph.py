"""Distributed connected components over an edge list.

The dedup pipeline's clustering step (near-dup pairs -> keep/drop groups)
reduced to its graph core: min-label propagation to a fixpoint. Each round
is one equi shuffle join of the label table across the edge set plus a
neighborhood-min aggregate — O(graph diameter) rounds, every one of them
shuffle-bounded by the EDGE count (for LSH pair graphs, orders of magnitude
below the corpus size). A lineage barrier per round keeps plans O(1) deep,
and convergence is probed with a 1-row count, not a driver collect of data.

For pathological diameters (long chains) the same fixpoint can be reached
in O(log n) rounds with large-star/small-star (Kiveris et al., 2014) — the
round structure below is the simple variant; the public API would not
change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_ITERS = 20


def connected_components(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = DEFAULT_MAX_ITERS,
) -> DataFrame:
    """Collapse an undirected edge list into components.

    Returns one row per node appearing in any edge: ``(node, component)``
    with ``component`` = the minimum node id reachable from it. Isolated
    nodes (in no pair) are absent by construction — callers union them in
    if singleton rows are wanted.
    """
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .localCheckpoint(eager=True)  # edge derivation runs once, not per round
    )
    labels = (
        edges.select("src").distinct().withColumn("lbl", F.col("src"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels.withColumnRenamed("src", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr_min, "src", "left")
            .select(
                "src",
                F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
                (F.coalesce("nbr_lbl", "lbl") < F.col("lbl")).alias("chg"),
            )
        ).localCheckpoint(eager=True)  # barrier: O(1) lineage per round
        changed = new_labels.filter(F.col("chg")).limit(1).count()  # 1-row probe
        labels = new_labels.drop("chg")
        if changed == 0:
            break
    return labels.select(F.col("src").alias("node"), F.col("lbl").alias("component"))
