"""Trained-LR end-to-end (reference contract: tests/test_ontoemma.py:42-71
test_lr — train on labeled pairs, align, assert P ≥ 0.8 / R ≥ 0.6 /
F1 ≥ 0.7). Training pairs are generated from the synthetic KBs:
positives = overlapping concepts, negatives = hard negatives from the
candidate ranking (M1 → M2 → BEST, the full model path with NO
string-equiv shortcut, unlike the align() fast path)."""

import pytest
from pyspark.sql import functions as F

from ontoemma_spark.datagen import gold_alignment, synthetic_kb
from ontoemma_spark.operators.blocking import candidate_pairs, entity_tokens
from ontoemma_spark.operators.evaluate import hard_negatives, precision_recall_f1
from ontoemma_spark.operators.features import entity_feature_table, featurize_pairs
from ontoemma_spark.operators.scoring import fit_lr
from ontoemma_spark.operators.strategy import best_alignment


@pytest.fixture(scope="module")
def setup(spark):
    s_ents, _ = synthetic_kb(spark, "SRC", n_entities=80, id_offset=0)
    t_ents, _ = synthetic_kb(spark, "TGT", n_entities=70, id_offset=30)
    gold = gold_alignment(spark, "SRC", "TGT", 80, 30, 70).select("s_id", "t_id")
    cands = candidate_pairs(entity_tokens(s_ents), entity_tokens(t_ents), 80, 70)
    s_feat = entity_feature_table(s_ents)
    t_feat = entity_feature_table(t_ents)
    return s_ents, t_ents, gold, cands, s_feat, t_feat


def test_trained_lr_meets_reference_thresholds(spark, setup):
    s_ents, t_ents, gold, cands, s_feat, t_feat = setup

    # training set: gold positives that are candidates + 1 hard negative each
    pos = cands.join(gold, ["s_id", "t_id"], "left_semi").select("s_id", "t_id").withColumn(
        "label", F.lit(1.0)
    )
    neg = hard_negatives(cands, gold, per_source=1).select("s_id", "t_id").withColumn(
        "label", F.lit(0.0)
    )
    train_pairs = pos.unionByName(neg)
    train_feats = featurize_pairs(train_pairs, s_feat, t_feat)
    model = fit_lr(train_feats, "label")

    # score ALL candidates with the trained model (full model path)
    scored = model.score_pairs(
        featurize_pairs(cands.select("s_id", "t_id"), s_feat, t_feat)
    ).select("s_id", "t_id", "score")
    alignment = best_alignment(scored, threshold=0.9)

    row = precision_recall_f1(alignment, gold).collect()[0]
    assert row["precision"] >= 0.8, row
    assert row["recall"] >= 0.6, row
    assert row["f1"] >= 0.7, row


def test_model_round_trip(spark, setup):
    from ontoemma_spark.operators.scoring import LRModel

    _, _, gold, cands, s_feat, t_feat = setup
    pos = cands.join(gold, ["s_id", "t_id"], "left_semi").select("s_id", "t_id").withColumn(
        "label", F.lit(1.0)
    )
    neg = hard_negatives(cands, gold, per_source=1).select("s_id", "t_id").withColumn(
        "label", F.lit(0.0)
    )
    feats = featurize_pairs(pos.unionByName(neg), s_feat, t_feat)
    model = fit_lr(feats, "label", epochs=50)
    restored = LRModel.from_dict(model.to_dict())
    a = model.score_pairs(feats).select("s_id", "t_id", "score").collect()
    b = restored.score_pairs(feats).select("s_id", "t_id", "score").collect()
    assert a == b
