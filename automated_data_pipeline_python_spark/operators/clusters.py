"""Duplicate-cluster resolution: connected components over near-dup pairs.

Dedup pipelines emit *pairs* (minhash/simhash/jaccard); production
dedup needs *clusters* (each doc → canonical representative). That is
connected components on the pair graph — an iterative algorithm, so it
can't be one Catalyst plan: we run label propagation (every node adopts
the minimum label among itself and its neighbors) to a fixpoint,
checkpointing each round to keep lineage flat.

Scale: each iteration is one join + one aggregation on the *edge* set
(which is candidate-pair-sized, ≪ corpus); iterations ≈ graph diameter
(near-dup clusters are tiny, so 2-4 rounds in practice). This is the
same scheme GraphX/GraphFrames use, expressed in plain DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Min-label propagation → ``(node, component)`` with component =
    the minimum node id reachable in the undirected pair graph.

    ``edges`` must have two id columns; isolated nodes may be absent
    (callers union them back if needed).
    """
    both = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        both.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            both.join(labels, both.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .filter(F.col("u.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels
