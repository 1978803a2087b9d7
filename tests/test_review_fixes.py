"""Regression tests for the round-1 review findings: neighborhood
propagation formula (G3), empty-stage pipeline resume, null-tolerant
entity_tokens, OBO typedef cutoff, greedy matching maximality,
additional_details loading, align() short-circuit."""

import math

import pytest
from pyspark.sql import functions as F

from ontoemma_spark.operators.blocking import entity_tokens
from ontoemma_spark.operators.graph import bfs_region, neighborhood_similarity
from ontoemma_spark.operators.strategy import greedy_one_to_one_alignment

ENT_DDL = (
    "research_entity_id string, canonical_name string, aliases array<string>,"
    " definition string, source_urls array<string>, category string,"
    " other_contexts array<string>, additional_details map<string,array<string>>"
)
EDGE_DDL = (
    "subject_id string, object_id string, relation_type string,"
    " symmetric boolean, labels array<string>"
)


def test_neighborhood_zero_iterations_is_identity(spark):
    scores = spark.createDataFrame([("a", "x", 0.8)], "s_id string, t_id string, score double")
    empty_regions = spark.createDataFrame([], "seed string, node string, path_len int")
    out = neighborhood_similarity(scores, empty_regions, empty_regions, iterations=0)
    assert out.collect() == scores.collect()


def test_neighborhood_one_iteration_weighted_replacement(spark):
    """Reference formula (OntoEmma.py:666-677): new = Σ(w·s)/Σw over
    equal-path-length scored neighbor pairs INCLUDING the self pair at
    weight 1."""
    s_edges = spark.createDataFrame([("a", "a2", "is_a", False, None)], EDGE_DDL)
    t_edges = spark.createDataFrame([("x", "x2", "is_a", False, None)], EDGE_DDL)
    # regions around EVERY scored entity (the reference recomputes them
    # per pair, OntoEmma.py:654-656)
    s_regions = bfs_region(
        s_edges, spark.createDataFrame([("a",), ("a2",)], "seed string"), steps=2
    )
    t_regions = bfs_region(
        t_edges, spark.createDataFrame([("x",), ("x2",)], "seed string"), steps=2
    )
    scores = spark.createDataFrame(
        [("a", "x", 0.8), ("a2", "x2", 0.4)], "s_id string, t_id string, score double"
    )
    out = {
        (r["s_id"], r["t_id"]): r["score"]
        for r in neighborhood_similarity(scores, s_regions, t_regions, iterations=1).collect()
    }
    # pair (a,x): self term w=1·0.8, neighbor (a2,x2) at path len 1 both
    # sides → w = exp(-1), score 0.4
    w = math.exp(-1.0)
    expected_ax = (1.0 * 0.8 + w * 0.4) / (1.0 + w)
    assert abs(out[("a", "x")] - expected_ax) < 1e-12
    # pair (a2,x2): leaf, only self term → score preserved
    assert abs(out[("a2", "x2")] - 0.4) < 1e-12
    assert set(out) == {("a", "x"), ("a2", "x2")}  # key set preserved


def test_entity_tokens_null_definition_and_aliases(spark):
    ents = spark.createDataFrame(
        [("E:1", "alpha", ["alpha beta"], None, [], None, [], None),
         ("E:2", "gamma", None, "gamma def", [], None, [], None)],
        ENT_DDL,
    )
    toks = entity_tokens(ents).groupBy("entity_id").count().collect()
    got = {r["entity_id"]: r["count"] for r in toks}
    assert got.get("E:1", 0) > 0  # null definition must not erase tokens
    assert got.get("E:2", 0) > 0  # null aliases must not erase def tokens


def test_obo_typedef_not_merged(spark, tmp_path):
    from ontoemma_spark.sources.obo import load_obo

    obo = """format-version: 1.2

[Term]
id: GO:1
name: thing one

[Typedef]
id: part_of
name: part of
is_a: overlaps
"""
    p = tmp_path / "t.obo"
    p.write_text(obo)
    ents, edges = load_obo(spark, str(p), kb_prefix="GO")
    assert ents.count() == 1
    assert edges.count() == 0  # typedef's is_a must NOT become a term edge


def test_greedy_matching_is_maximal_on_long_chain(spark):
    # preference chain longer than the old 10-round cap
    rows = []
    for i in range(15):
        rows.append((f"s{i:02d}", f"t{i:02d}", 0.99 - i * 0.001))
        if i + 1 < 15:
            rows.append((f"s{i:02d}", f"t{i+1:02d}", 0.985 - i * 0.001))
    scores = spark.createDataFrame(rows, "s_id string, t_id string, score double")
    out = greedy_one_to_one_alignment(scores, threshold=0.9)
    assert out.count() == 15  # every source matched — maximal


def test_kb_json_loads_additional_details(spark, tmp_path):
    import json as _json

    from ontoemma_spark.sources.kb_json import load_kb_json

    kb = {
        "name": "T",
        "entities": [
            {
                "research_entity_id": "T:1", "canonical_name": "one",
                "aliases": ["one"], "definition": "d", "source_urls": [],
                "category": None, "other_contexts": [],
                "additional_details": {
                    "wiki_entities": ["W1"],
                    "mesh_synonynms": ["M1"],  # legacy misspelling
                },
            }
        ],
        "relations": [],
    }
    p = tmp_path / "kb.json"
    p.write_text(_json.dumps(kb))
    ents, _ = load_kb_json(spark, str(p))
    row = ents.collect()[0]
    details = row["additional_details"]
    assert details["wiki_entities"] == ["W1"]
    assert details["mesh_synonyms"] == ["M1"]  # misspelling patched
    assert details["dbpedia_synonyms"] == []


def test_align_short_circuit_excludes_matched_targets_and_unnamed(spark):
    from ontoemma_spark.align import align

    # S1 exactly matches T1; S2 is similar to T1 (would score high);
    # S3 is unnamed (canonical == id). Reference behavior: (S2, T1) is
    # never model-scored because T1 was string-equiv matched; S3 is
    # never scored at all.
    # filler entities so the shared tokens clear the reference IDF floor
    # (ln 20 requires df ≤ N/19 — a 3-entity KB yields zero candidates,
    # faithfully to the reference)
    fillers_s = [
        (f"S:f{i}", f"sfiller{i} xnoise{i}", [f"sfiller{i} xnoise{i}"], "", [], None, [], None)
        for i in range(60)
    ]
    fillers_t = [
        (f"T:f{i}", f"tfiller{i} ynoise{i}", [f"tfiller{i} ynoise{i}"], "", [], None, [], None)
        for i in range(60)
    ]
    s = spark.createDataFrame(
        [
            ("S:1", "heart attack", ["heart attack"], "", [], None, [], None),
            ("S:2", "heart attacks", ["heart attacks"], "", [], None, [], None),
            ("S:3", "S:3", ["heart attack"], "", [], None, [], None),
        ]
        + fillers_s,
        ENT_DDL,
    )
    t = spark.createDataFrame(
        [("T:1", "heart attack", ["heart attack"], "", [], None, [], None)] + fillers_t,
        ENT_DDL,
    )
    res = align(s, t, threshold=0.5)
    model_scored = res.scores.exceptAll(res.string_equiv.select("s_id", "t_id", "score"))
    scored_pairs = {(r["s_id"], r["t_id"]) for r in model_scored.collect()}
    assert ("S:2", "T:1") not in scored_pairs  # T1 already matched
    assert not any(sid == "S:3" for sid, _ in scored_pairs)  # unnamed skipped
    # but note: S:3's alias matches T:1 via string-equiv (allowed there)
    equiv_pairs = {(r["s_id"], r["t_id"]) for r in res.string_equiv.collect()}
    assert ("S:1", "T:1") in equiv_pairs
