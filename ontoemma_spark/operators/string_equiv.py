"""String-equivalence alignment (emma/OntoEmma.py:506-540).

The reference lowercases each alias, maps '_'→' ', deletes '-'
(:520-527 — note: NO trim, unlike normalize_string), then aligns
(s, t) where normalized alias sets intersect, restricted to the
candidate-selected pairs. Score is the constant 1.0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _equiv_norm(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(F.lower(c), "_-", " ")


def exploded_aliases(entities: DataFrame, id_alias: str) -> DataFrame:
    return entities.select(
        F.col("research_entity_id").alias(id_alias),
        F.explode("aliases").alias("alias"),
    ).select(id_alias, _equiv_norm("alias").alias("norm_alias")).distinct()


def string_equiv_alignment(
    s_entities: DataFrame,
    t_entities: DataFrame,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(s_id, t_id, 1.0) for pairs sharing a normalized alias. When a
    candidate DF (s_id, t_id, ...) is given, the result is restricted to
    it (the reference only tests candidate pairs, OntoEmma.py:530-534)."""
    pairs = (
        exploded_aliases(s_entities, "s_id")
        .join(exploded_aliases(t_entities, "t_id"), "norm_alias")
        .select("s_id", "t_id")
        .distinct()
    )
    if candidates is not None:
        pairs = pairs.join(candidates.select("s_id", "t_id").distinct(), ["s_id", "t_id"], "left_semi")
    return pairs.withColumn("score", F.lit(1.0))


def remaining_after(entities: DataFrame, matched: DataFrame, side_col: str) -> DataFrame:
    """Ids not matched by string equivalence (OntoEmma.py:536-538) —
    the anti-join that short-circuits exact matches out of the expensive
    model-scoring stage."""
    return entities.select(F.col("research_entity_id")).join(
        matched.select(F.col(side_col).alias("research_entity_id")).distinct(),
        "research_entity_id",
        "left_anti",
    )
