"""End-to-end ontology alignment (the reference's flagship entry point,
emma/OntoEmma.py:816-873 `align`) as one lazy DataFrame composition:

  1. candidate selection  (CandidateSelection)      blocking.py
  2. string-equiv fast path (OntoEmma.py:506-540)   string_equiv.py
  3. feature gen + LR scoring for the remainder     features.py/scoring.py
  4. neighborhood propagation (default 0 iters ==
     identity, matching OntoEmma.py:859)            graph.py
  5. strategy (best/all/modh) at threshold 0.90     strategy.py

The string-equiv anti-join short-circuit mirrors the reference: sources
matched exactly skip model scoring entirely (OntoEmma.py:693-715).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontoemma_spark import config
from ontoemma_spark.operators.blocking import (
    candidate_pairs,
    candidate_pairs_broadcast_index,
    entity_tokens,
)
from ontoemma_spark.operators.features import entity_feature_table, featurize_pairs
from ontoemma_spark.operators.scoring import DEFAULT_LR_MODEL, LRModel
from ontoemma_spark.operators.strategy import apply_alignment_strategy
from ontoemma_spark.operators.string_equiv import string_equiv_alignment


@dataclass
class AlignmentResult:
    candidates: DataFrame  # (s_id, t_id, cand_score, rank)
    string_equiv: DataFrame  # (s_id, t_id, score=1.0)
    scores: DataFrame  # all scored pairs (s_id, t_id, score)
    alignment: DataFrame  # strategy output (s_id, t_id, score)


def align(
    s_entities: DataFrame,
    t_entities: DataFrame,
    model: LRModel | None = None,
    strategy: str = "best",
    threshold: float = config.SIM_SCORE_THRESHOLD,
    top_k: int = config.KEEP_TOP_K_CANDIDATES,
    broadcast_index: bool = True,
    normalize: bool = True,
) -> AlignmentResult:
    """broadcast_index: compute candidates with the broadcast-inverted-
    index kernel (target KB index fits in memory — always true for the
    KB side; bit-identical to the shuffle plan, ~12x faster). Set False
    to force the pure-relational plan (both-sides-big regime).

    normalize: apply P1 KB normalization first (the reference align()
    calls normalize_kb on both sides before candidate selection,
    OntoEmma.py:846-848 — tokenization is case-sensitive, so skipping it
    loses candidates on mixed-case input)."""
    from ontoemma_spark.operators.normalize import normalize_entities

    model = model or DEFAULT_LR_MODEL
    if normalize:
        s_entities = normalize_entities(s_entities)
        t_entities = normalize_entities(t_entities)
    s_count = s_entities.count()
    t_count = t_entities.count()

    block = candidate_pairs_broadcast_index if broadcast_index else candidate_pairs
    cands = block(
        entity_tokens(s_entities), entity_tokens(t_entities), s_count, t_count, top_k=top_k
    )

    equiv = string_equiv_alignment(s_entities, t_entities, candidates=cands)

    # model scoring short-circuit (OntoEmma.py:695-722 _apply_model_align):
    # skip sources AND targets already string-equiv matched, and skip
    # unnamed entities whose canonical name equals their id (P8,
    # :710-715 — unnamed OWL imports are never model-scored).
    s_named = s_entities.filter(
        F.col("canonical_name") != F.col("research_entity_id")
    ).select(F.col("research_entity_id").alias("s_id"))
    t_named = t_entities.filter(
        F.col("canonical_name") != F.col("research_entity_id")
    ).select(F.col("research_entity_id").alias("t_id"))
    to_score = (
        cands.join(equiv.select("s_id").distinct(), "s_id", "left_anti")
        .join(equiv.select("t_id").distinct(), "t_id", "left_anti")
        .join(s_named, "s_id", "left_semi")
        .join(t_named, "t_id", "left_semi")
    )
    from ontoemma_spark.operators.scoring_nn import NN_PAIR_FEATURES, MLPModel
    from ontoemma_spark.operators.siamese import SiameseScorer, score_pairs_siamese

    if isinstance(model, SiameseScorer):
        # full siamese BiLSTM/char-CNN scorer (reference architecture,
        # ontoemma_model.py:73-164): hydrate names/aliases/definitions
        # via broadcast (KB-sized), compute the 32 engineered features
        # natively, then run the Arrow-batched numpy forward pass — the
        # compatibility path for reference-trained weights
        # (SiameseScorer.from_allennlp_state).
        def _text_side(ents: DataFrame, p: str) -> DataFrame:
            return ents.select(
                F.col("research_entity_id").alias(f"{p}_id"),
                F.col("canonical_name").alias(f"{p}_name"),
                F.coalesce(F.col("aliases"), F.array().cast("array<string>")).alias(
                    f"{p}_aliases"
                ),
                F.coalesce(F.col("definition"), F.lit("")).alias(f"{p}_def"),
            )

        featurized = featurize_pairs(
            to_score.select("s_id", "t_id"),
            entity_feature_table(s_entities),
            entity_feature_table(t_entities),
        )
        hydrated = featurized.join(
            F.broadcast(_text_side(s_entities, "s")), "s_id"
        ).join(F.broadcast(_text_side(t_entities, "t")), "t_id")
        model_scores = score_pairs_siamese(hydrated, model)
        scores = equiv.select("s_id", "t_id", "score").unionByName(model_scores)
        alignment = apply_alignment_strategy(scores, strategy, threshold)
        return AlignmentResult(cands, equiv, scores, alignment)

    if isinstance(model, MLPModel) and list(model.feature_names) == NN_PAIR_FEATURES:
        # NN pair scorer (reference _align_nn, OntoEmma.py:737,766-797):
        # the MLP's features are computed from the pair's canonical
        # names, not the 32 engineered features — rehydrate names via
        # broadcast (KB-sized) and score with the native column forward
        # pass (zero Python in the hot path).
        from ontoemma_spark.operators.scoring_nn import nn_pair_features

        s_nm = s_entities.select(
            F.col("research_entity_id").alias("s_id"),
            F.col("canonical_name").alias("s_name"),
        )
        t_nm = t_entities.select(
            F.col("research_entity_id").alias("t_id"),
            F.col("canonical_name").alias("t_name"),
        )
        featurized = (
            to_score.select("s_id", "t_id")
            .join(F.broadcast(s_nm), "s_id")
            .join(F.broadcast(t_nm), "t_id")
            .select("s_id", "t_id", *nn_pair_features("s_name", "t_name"))
        )
    else:
        featurized = featurize_pairs(
            to_score.select("s_id", "t_id"),
            entity_feature_table(s_entities),
            entity_feature_table(t_entities),
        )
    model_scores = model.score_pairs(featurized).select("s_id", "t_id", "score")

    scores = equiv.select("s_id", "t_id", "score").unionByName(model_scores)
    alignment = apply_alignment_strategy(scores, strategy, threshold)
    return AlignmentResult(cands, equiv, scores, alignment)
