"""Engineered features (EngineeredFeatureGenerator.py:226-338) +
LR scoring (OntoEmmaLRModel.py:35-66)."""

import math

import pytest

from ontoemma_spark.operators.features import (
    FEATURE_NAMES,
    entity_feature_table,
    featurize_pairs,
)
from ontoemma_spark.operators.scoring import LRModel, fit_lr

ENT_SCHEMA = (
    "research_entity_id string, canonical_name string, aliases array<string>,"
    " definition string, source_urls array<string>, category string,"
    " other_contexts array<string>, additional_details map<string,array<string>>"
)


@pytest.fixture(scope="module")
def pair_features(spark):
    s = spark.createDataFrame(
        [
            ("S:1", "heart attack", ["heart attack", "myocardial infarction"],
             "necrosis of heart muscle", [], None, [], {"wiki_entities": ["Myocardial_infarction"]}),
            ("S:2", "renal failure", ["renal failure"], "kidney stops working", [], None, [], {}),
        ],
        ENT_SCHEMA,
    )
    t = spark.createDataFrame(
        [
            ("T:1", "heart attack", ["heart attack", "MI"],
             "necrosis of heart muscle tissue", [], None, [], {"wiki_entities": ["Myocardial_infarction"]}),
            ("T:2", "liver failure", ["liver failure", "hepatic failure"], "", [], None, [], {}),
        ],
        ENT_SCHEMA,
    )
    pairs = spark.createDataFrame(
        [("S:1", "T:1"), ("S:1", "T:2"), ("S:2", "T:2")], "s_id string, t_id string"
    )
    feats = featurize_pairs(pairs, entity_feature_table(s), entity_feature_table(t))
    return {(r["s_id"], r["t_id"]): r for r in feats.collect()}


def test_all_32_features_present(pair_features):
    row = pair_features[("S:1", "T:1")]
    for name in FEATURE_NAMES:
        assert name in row.asDict(), name
    assert len(FEATURE_NAMES) == 32


def test_exact_match_features(pair_features):
    r = pair_features[("S:1", "T:1")]
    assert r["has_same_canonical_name"] == 1.0
    assert r["has_same_canonical_name_tokens"] == 1.0
    assert r["name_char_4gram_jaccard"] == 1.0
    assert r["has_alias_in_common"] == 1.0
    assert r["max_alias_token_jaccard"] == 1.0
    assert r["has_same_wiki_entity"] == 1.0
    assert r["wiki_entity_jaccard"] == 1.0
    # definitions differ by one token: {necrosis, heart, muscle} vs +tissue
    assert abs(r["definition_token_jaccard"] - 3 / 4) < 1e-12
    assert r["has_same_root_word"] == 1.0


def test_disjoint_pair_features(pair_features):
    r = pair_features[("S:1", "T:2")]
    assert r["has_same_canonical_name"] == 0.0
    assert r["has_alias_in_common"] == 0.0
    assert r["max_alias_token_jaccard"] == 0.0  # floor 0.0, not -1.0 (ref :156)
    # empty wiki on T:2 → jaccard -1.0 empty convention
    assert r["wiki_entity_jaccard"] == -1.0


def test_partial_overlap(pair_features):
    r = pair_features[("S:2", "T:2")]
    # "renal failure" vs "liver failure": token-set jaccard 1/3
    assert abs(r["max_alias_token_jaccard"] - 1 / 3) < 1e-12
    # overlap is over whole token-TUPLES (ref _overlaps on lists of
    # tuples, EngineeredFeatureGenerator.py:255) → disjoint here
    assert r["has_alias_tokens_in_common"] == 0.0
    assert r["has_same_root_word"] == 1.0  # shared head word "failure"


def test_lr_score_is_sigmoid(spark):
    model = LRModel(weights={"f1": 2.0, "f2": -1.0}, bias=0.5)
    df = spark.createDataFrame([(1.0, 0.5)], "f1 double, f2 double")
    got = model.score_pairs(df).collect()[0]["score"]
    assert abs(got - 1 / (1 + math.exp(-(0.5 + 2.0 - 0.5)))) < 1e-12


def test_fit_lr_separates_labels(spark):
    rows = [(float(i % 2), float(i % 2), float((i + 1) % 2)) for i in range(40)]
    df = spark.createDataFrame(rows, "label double, pos double, neg double")
    model = fit_lr(df, "label", feature_names=["pos", "neg"])
    assert model.weights["pos"] > 1.0 and model.weights["neg"] < -1.0
    scored = model.score_pairs(df).collect()
    for r in scored:
        assert (r["score"] > 0.5) == (r["label"] == 1.0)
