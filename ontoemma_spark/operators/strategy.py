"""Alignment strategies over a scores DF (s_id, t_id, score).

Reference: emma/OntoEmma.py:542-629 (_apply_best/_all/_modh) and
emma/utils/modified_hungarian.py. BEST/ALL are pure window/filter plans;
MODH (global assignment) is inherently sequential in the reference
(randomized greedy iteration, modified_hungarian.py:8-145) — here it is a
deterministic distributed greedy: iterate mutual-best matching rounds,
which yields a maximal matching. On the reference's fixture semantics
(tests/test_assignment_strategies.py) all strategies agree on count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ontoemma_spark import config


def best_alignment(scores: DataFrame, threshold: float = config.SIM_SCORE_THRESHOLD) -> DataFrame:
    """BEST (OntoEmma.py:542-563): per source entity, the single
    highest-scoring target if its score ≥ threshold. Explicit t_id
    tiebreak for distributed determinism."""
    w = Window.partitionBy("s_id").orderBy(F.desc("score"), F.asc("t_id"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("score") >= threshold))
        .drop("rn")
    )


def all_alignment(scores: DataFrame, threshold: float = config.SIM_SCORE_THRESHOLD) -> DataFrame:
    """ALL (OntoEmma.py:565-574): every pair ≥ threshold."""
    return scores.filter(F.col("score") >= threshold)


def greedy_one_to_one_alignment(
    scores: DataFrame,
    threshold: float = config.SIM_SCORE_THRESHOLD,
) -> DataFrame:
    """MODH stand-in (OntoEmma.py:576-611): approximate global 1:1
    assignment. Deterministic mutual-best rounds: a pair is matched when
    it is simultaneously the best remaining candidate of its source AND
    of its target; matched rows are removed and the round repeats. This
    is the classic distributed greedy-matching algorithm — every round is
    two window ranks + a filter, no driver-side state.

    Termination: the globally best remaining pair is always mutual-best,
    so every round matches ≥1 pair and the loop ends in ≤ min(|S|, |T|)
    rounds — the result is a maximal matching by construction.

    Diverges from the reference's randomized row-order greedy
    (modified_hungarian.py:113-118 shuffles rows) — documented
    deliberate determinism (SURVEY.md §7.3 hard part 2).

    For OUTPUT FIDELITY with the reference algorithm (including its
    iterative cost reduction and quirks), use
    operators.assignment.modified_hungarian_alignment — the faithful
    seeded port, KB-bounded driver-side numpy, pinned against the
    reference's own fixture in tests/test_modh.py. This greedy remains
    the unbounded-input scale path.
    """
    remaining = scores.filter(F.col("score") >= threshold)
    matched = None
    ws = Window.partitionBy("s_id").orderBy(F.desc("score"), F.asc("t_id"))
    wt = Window.partitionBy("t_id").orderBy(F.desc("score"), F.asc("s_id"))
    while True:
        ranked = remaining.withColumn("rs", F.row_number().over(ws)).withColumn(
            "rt", F.row_number().over(wt)
        )
        # column order is NOT stable across rounds: the using-column
        # anti-joins below move their key to the front, so round 2's
        # `remaining` has columns [t_id, s_id, score] — select by name
        # before the union (positional union swapped s/t for every
        # round after the first; caught by the modh_greedy oracle row).
        mutual = ranked.filter((F.col("rs") == 1) & (F.col("rt") == 1)).select(
            *scores.columns
        )
        mutual = mutual.localCheckpoint(eager=True)
        if mutual.isEmpty():
            break
        matched = mutual if matched is None else matched.unionByName(mutual)
        remaining = (
            remaining.join(mutual.select("s_id").distinct(), "s_id", "left_anti")
            .join(mutual.select("t_id").distinct(), "t_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if remaining.isEmpty():
            break
    if matched is None:
        return scores.filter(F.lit(False))
    return matched.select(*scores.columns)


def apply_alignment_strategy(
    scores: DataFrame, strategy: str = "best", threshold: float = config.SIM_SCORE_THRESHOLD
) -> DataFrame:
    """Dispatch per OntoEmma.py:613-629 (_compute_alignment)."""
    if strategy == "best":
        return best_alignment(scores, threshold)
    if strategy == "all":
        return all_alignment(scores, threshold)
    if strategy == "modh":
        return greedy_one_to_one_alignment(scores, threshold)
    raise NotImplementedError(f"Unknown alignment strategy: {strategy}")
