"""Distributed connected components — cluster assignment over near-dup
pair graphs (the step after candidate generation + verification: pairs
say "these two are duplicates", components say "this is the dedup group
and this member survives").

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round pushes labels across edges and keeps the
minimum seen; convergence when no label changes. Rounds = graph
diameter. Near-dup graphs are unions of small cliques and stars
(diameter ≲ 3-4 even on web-scale corpora — a duplicate cluster is by
construction densely connected), so simple propagation with an early
exit beats the O(log n)-round large-star/small-star alternation in
practice; swap that in only for adversarial long-path graphs.

Scale design per round: one equi-join (labels onto edges) + one
groupBy-min (map-side partial) — both shuffles keyed by node id, so AQE
coalesces them, and ``localCheckpoint`` truncates the lineage each
round (an unbounded iterative plan otherwise re-executes every prior
round per action and overwhelms the optimizer). The result is exactly
``component = min(reachable node id)`` — deterministic, engine-portable
(the DuckDB oracle recomputes it with a recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``; component
    is the minimum node id reachable. Nodes with no edges don't appear —
    singletons are trivially their own component and the caller can
    left-join them back if wanted."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("comp")).first()[0]
    for _ in range(max_iter):
        msgs = sym.join(labels, sym["a"] == labels["id"]).select(
            F.col("b").alias("id"), "comp"
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        # labels only ever DECREASE (min over a growing reachable set),
        # so Σcomp is strictly monotone until the fixpoint — an O(n)
        # scan of the checkpointed labels detects convergence without
        # the per-round join-and-compare
        new_sum = new_labels.agg(F.sum("comp")).first()[0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    sym.unpersist()
    return labels
