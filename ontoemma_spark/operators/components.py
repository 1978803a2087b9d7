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


def _min_reach_labels_bidir(
    edges: DataFrame, nodes: DataFrame, max_iterations: int,
    seed_col: str | None = None,
) -> DataFrame:
    """(node, label, blabel): label = min node id that can REACH node
    along directed edges, blabel = min node id node can reach (both
    including node itself). The forward and backward propagations are
    the SAME fixpoint on a direction-tagged union (dir='f' walks edges,
    dir='b' walks them reversed), so both run in ONE loop — half the
    per-iteration job count of two separate loops, which at toy scale
    is half the wall-clock (fixed job overhead dominates) and at
    cluster scale halves the scheduling rounds. Min-label propagation
    is accelerated by transitive compression (label ← label-of-label
    within the same direction): if m reaches v and k reaches m then k
    reaches v, giving O(log diameter) convergence like the undirected
    pointer jumping above.

    seed_col: optional column ON `nodes` holding the initial label
    (default the node id). SOUNDNESS CONSTRAINT for the compression
    step: every seed value must be either the node's own id or a
    sentinel that is NOT any node's id (label-of-label assumes a label
    value that looks like a node id IS a node that reached here —
    bow_tie_classes' below-everything core sentinel satisfies this,
    arbitrary relabels would not).
    """
    edges2 = edges.select("src", "dst", F.lit("f").alias("dir")).union(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            F.lit("b").alias("dir"),
        )
    )
    labels = (
        nodes.select(
            "node",
            F.explode(F.array(F.lit("f"), F.lit("b"))).alias("dir"),
            (F.col("node") if seed_col is None else F.col(seed_col)).alias(
                "label"
            ),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        msgs = (
            edges2.join(labels.withColumnRenamed("node", "src"), ["src", "dir"])
            .groupBy(F.col("dst").alias("node"), "dir")
            .agg(F.min("label").alias("nbr"))
        )
        stepped = labels.join(msgs, ["node", "dir"], "left").select(
            "node", "dir",
            F.least(F.col("label"), F.coalesce("nbr", F.col("label"))).alias("label"),
            F.col("label").alias("_old"),
        )
        # transitive compression: label ← label of label (per direction)
        thru = stepped.select(
            F.col("node").alias("label"), "dir", F.col("label").alias("grand")
        ).groupBy("label", "dir").agg(F.min("grand").alias("grand"))
        new_label = F.least(F.col("label"), F.coalesce("grand", F.col("label")))
        jumped = (
            stepped.join(thru, ["label", "dir"], "left")
            .select(
                "node", "dir", new_label.alias("label"),
                # changed flag carried in-plan: one count on the
                # checkpointed frame, no extra self-join per iteration
                (new_label != F.col("_old")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = jumped.filter("_changed").limit(1).count()
        labels = jumped.drop("_changed")
        if changed == 0:
            return (
                labels.groupBy("node")
                .pivot("dir", ["f", "b"])
                .agg(F.first("label"))
                .select("node", F.col("f").alias("label"), F.col("b").alias("blabel"))
            )
    raise RuntimeError(
        f"directed min-label propagation did not converge in {max_iterations} "
        "rounds; raise max_iterations"
    )


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
    max_iterations: int = config.CC_MAX_ITERATIONS,
) -> DataFrame:
    """(node, component) over a DIRECTED graph, component = min node id
    in the node's strongly connected component. The web-graph shape:
    link farms / mutually-citing clusters are SCCs; the bow-tie DAG
    around the giant SCC is singletons.

    Forward-backward min-coloring (the distributed-SCC family of Orzan
    2004 / Hong et al. 2013, relational form): per outer round, over
    the still-unsettled subgraph compute fwd(v) = min id that reaches v
    and bwd(v) = min id v reaches (two min-label propagations, each
    O(log diameter) via transitive compression). fwd(v) = bwd(v) = m
    certifies v ∈ SCC(m) (m reaches v and v reaches m); every SCC whose
    min-reaching id lies inside it settles this round. Settled nodes
    and their edges drop out; repeat. A one-pass degree trim settles
    source/sink singletons (in- or out-degree 0) before each coloring —
    at web scale the IN/OUT bow-tie lobes are shallow, so the observed
    outer-round count is small (the giant SCC settles in round 1); a
    pathological depth-D id-ordered DAG chain needs D rounds, bounded
    by ``max_rounds`` with a loud failure, never a silent partial
    answer.

    Each propagation step is one shuffle with map-side partial min;
    localCheckpoint truncates lineage per step (cluster: durable
    checkpoint). Output covers every node present in ``edges``
    (self-loops contribute the node as a singleton-or-member, never a
    dropped row).
    """
    # ADVICE r5: a null endpoint would enter the node universe (union/
    # distinct keeps NULL) but every null-unsafe anti-join below fails
    # to remove it, so it re-settles every round and the loop exhausts
    # max_rounds with a misleading "did not settle". Null endpoints
    # carry no reachability information — drop them up front, consistent
    # with upsert_edges/fusion's explicit null handling.
    edges = edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
    live = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # seed with an empty, correctly-typed part so zero-edge input
    # returns an empty (node, component) frame instead of crashing
    done_parts: list[DataFrame] = [
        nodes.withColumn("component", F.col("node")).limit(0)
    ]

    for _ in range(max_rounds):
        if nodes.limit(1).count() == 0:
            break
        # trim: a node with no in-edges or no out-edges (within the live
        # subgraph) is its own SCC — settles DAG periphery cheaply.
        has_in = live.select(F.col("dst").alias("node")).distinct()
        has_out = live.select(F.col("src").alias("node")).distinct()
        trimmed = nodes.join(has_in, "node", "left_anti").union(
            nodes.join(has_out, "node", "left_anti")
        ).distinct()
        done_parts.append(
            trimmed.withColumn("component", F.col("node")).localCheckpoint(eager=True)
        )
        nodes = nodes.join(trimmed, "node", "left_anti").localCheckpoint(eager=True)
        if nodes.limit(1).count() == 0:
            break
        live = (
            live.join(trimmed.withColumnRenamed("node", "src"), "src", "left_anti")
            .join(trimmed.withColumnRenamed("node", "dst"), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )

        both = _min_reach_labels_bidir(live, nodes, max_iterations)
        settled = (
            both.filter(F.col("label") == F.col("blabel"))
            .select("node", F.col("label").alias("component"))
            .localCheckpoint(eager=True)
        )
        if settled.limit(1).count() == 0:  # pragma: no cover — defensive
            raise RuntimeError("SCC coloring made no progress (bug)")
        done_parts.append(settled)
        nodes = both.join(settled, "node", "left_anti").select("node").localCheckpoint(
            eager=True
        )
        live = (
            live.join(settled.withColumnRenamed("node", "src"), "src", "left_anti")
            .join(settled.withColumnRenamed("node", "dst"), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nodes.limit(1).count() == 0:
            break
    else:
        raise RuntimeError(
            f"strongly_connected_components did not settle in {max_rounds} "
            "rounds (DAG periphery deeper than the bound); raise max_rounds"
        )

    out = done_parts[0]
    for part in done_parts[1:]:
        out = out.union(part)
    return out.select("node", "component")


BOW_TIE_SENTINEL = "\x00"


def bow_tie_classes(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
    max_iterations: int = config.CC_MAX_ITERATIONS,
) -> DataFrame:
    """Broder et al. (2000) bow-tie anatomy of a directed link graph:
    every node classified as

      core     — member of the LARGEST strongly connected component
                 (ties broken by min component id, deterministically),
      in       — reaches the core but is not in it,
      out      — reached from the core but not in it,
      tendril_or_disconnected — neither.

    The first structural question asked of any crawl snapshot (is the
    core shrinking? did a bad extraction round inflate IN?).

    Composition, all bounded-iteration relational ops: SCC labels →
    core pick (one 1-row argmax to the driver) → ONE bidirectional
    min-label propagation seeded with a below-everything sentinel on
    core nodes ("\\x00" — guarded against colliding with a real node
    id): the forward label reaching v turns sentinel iff core reaches
    v (OUT side), the backward label iff v reaches core (IN side) —
    O(log diameter) rounds via the same transitive compression as SCC,
    instead of an O(diameter) frontier BFS from the core.

    Output: (node, component, cls). Empty input → empty output.
    """
    scc = strongly_connected_components(
        edges, src=src, dst=dst, max_rounds=max_rounds,
        max_iterations=max_iterations,
    ).localCheckpoint(eager=True)
    top = (
        scc.groupBy("component")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("component"))
        .limit(1)
        .collect()
    )
    if not top:
        return scc.withColumn("cls", F.lit(""))
    core_id = top[0]["component"]
    if scc.filter(F.col("node") == BOW_TIE_SENTINEL).limit(1).count():
        raise ValueError(
            "a node id equals the reserved bow-tie sentinel (chr 0)"
        )
    seeded = scc.withColumn(
        "_seed",
        F.when(F.col("component") == core_id, F.lit(BOW_TIE_SENTINEL))
        .otherwise(F.col("node")),
    )
    live = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        # null endpoints carry no reachability (same rule as SCC's
        # universe above — ADVICE r5)
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    reach = _min_reach_labels_bidir(
        live, seeded, max_iterations, seed_col="_seed"
    )
    sent = F.lit(BOW_TIE_SENTINEL)
    return scc.join(reach, "node").select(
        "node",
        "component",
        F.when(F.col("component") == core_id, F.lit("core"))
        .when(F.col("blabel") == sent, F.lit("in"))
        .when(F.col("label") == sent, F.lit("out"))
        .otherwise(F.lit("tendril_or_disconnected"))
        .alias("cls"),
    )
