"""Canonicalization: iterative hash-min connected components (SURVEY.md
§2.10 G7). Semantic heir of the reference's merge_entities canonical-id
union (emma/kb/kb_utils_refactor.py:340-412, sorted-joined raw ids) —
the match graph's component id becomes the canonical entity id.

Algorithm: classic min-label propagation. Each round every node takes
min(own label, neighbor labels); converges in O(diameter) rounds. Each
round is one shuffle on node id; localCheckpoint truncates lineage so the
plan does not grow (critical for 10^12-node graphs; on a cluster this
would be a reliable checkpoint to HDFS/Iceberg instead).

Skew: head nodes (appearing in millions of edges) are handled by the
symmetric edge representation — messages aggregate per node with a
map-side partial min, so a hot node's inbox combines before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontoemma_spark import config


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = config.CC_MAX_ITERATIONS,
) -> DataFrame:
    """(node, component) with component = min node id (string order) in
    the node's connected component. Edges are treated as undirected.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # node universe from the ORIGINAL edges, not the symmetrized ones:
    # sym drops self-loops (a != b), and a node whose only edge is a
    # self-loop must still appear as its own singleton component
    # (caught by edge probing — it silently vanished before).
    labels = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        # neighbor-label messages; partial min combines map-side.
        msgs = (
            sym.join(labels.withColumnRenamed("node", "a"), "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        propagated = labels.join(msgs, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("nbr_component", F.col("component"))
            ).alias("component"),
            (
                F.col("nbr_component").isNotNull()
                & (F.col("nbr_component") < F.col("component"))
            ).alias("changed"),
        )
        # pointer jumping (label ← label-of-label): compresses chains so
        # convergence is O(log diameter) rounds instead of O(diameter) —
        # the difference between 40 and 10^6 rounds on long match chains.
        parent = propagated.select(
            F.col("node").alias("component"), F.col("component").alias("grand")
        ).groupBy("component").agg(F.min("grand").alias("grand"))
        new_labels = (
            propagated.join(parent, "component", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("grand", F.col("component"))).alias(
                    "component"
                ),
                "changed",
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("changed").limit(1).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            return labels
    # silent non-convergence would split one component across several
    # canonical ids — fail loudly instead.
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds "
        "(graph diameter exceeds the bound); raise max_iterations"
    )


def canonical_ids_from_matches(matches: DataFrame) -> DataFrame:
    """Match pairs (s_id, t_id) → (node, component) canonical mapping,
    singletons excluded (they keep their own id by definition)."""
    return connected_components(matches, src="s_id", dst="t_id")
