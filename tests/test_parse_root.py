"""F9 golden parity: the deterministic NP head finder
(functions/parse.py np_parse) vs hand-derived spaCy parses of the
reference's own fixture ontology names (reference
tests/data/test_source_ont.json / test_target_ont.json; reference
semantics emma/EngineeredFeatureGenerator.py:34-44 — root = ROOT token
text, root_words = {token.head.text for every token}).

The expected values below were derived by hand from the dependency
structure of each noun phrase (head noun per chunk, prepositions head
their objects' chunks, ROOT heads itself); they are what spaCy's NP
parses yield on these names. Coordinated names ("aplasia/hypoplasia
…") are excluded — np_parse documents that divergence.
"""

import pytest

from ontoemma_spark.functions.parse import np_parse

# (name, expected_root, expected_root_words) — names as P1-normalized
# (lowercase) canonical names from the reference fixture ontologies.
GOLDEN = [
    ("hypersensitivity", "hypersensitivity", {"hypersensitivity"}),
    ("type iv hypersensitivity", "hypersensitivity", {"hypersensitivity"}),
    ("regulation of hypersensitivity", "regulation", {"regulation", "of"}),
    ("negative regulation of hypersensitivity", "regulation", {"regulation", "of"}),
    (
        "acute inflammatory response to antigenic stimulus",
        "response",
        {"response", "to", "stimulus"},
    ),
    ("behavioral defense response to insect", "response", {"response", "to"}),
    ("behavioral defense response to nematode", "response", {"response", "to"}),
    ("aggressive behavior", "behavior", {"behavior"}),
    ("territorial aggressive behavior", "behavior", {"behavior"}),
    ("multi-organism reproductive behavior", "behavior", {"behavior"}),
    ("skeletal muscle atrophy", "atrophy", {"atrophy"}),
    ("skeletal muscle hypertrophy", "hypertrophy", {"hypertrophy"}),
    ("mitochondrion inheritance", "inheritance", {"inheritance"}),
    ("immune response", "response", {"response"}),
    # target ontology (HPO subset)
    ("fever", "fever", {"fever"}),
    ("low-grade fever", "fever", {"fever"}),
    ("abnormality of temperature regulation", "abnormality", {"abnormality", "of", "regulation"}),
    (
        "muscle hypertrophy of the lower extremities",
        "hypertrophy",
        {"hypertrophy", "of", "extremities"},
    ),
    ("generalized muscle hypertrophy", "hypertrophy", {"hypertrophy"}),
    ("abnormality of muscle size", "abnormality", {"abnormality", "of", "size"}),
    ("lewy bodies", "bodies", {"bodies"}),
    ("cerebral inclusion bodies", "bodies", {"bodies"}),
    # the classic motivating case from the round-2 review
    ("inflammation of the lung", "inflammation", {"inflammation", "of", "lung"}),
]


@pytest.mark.parametrize("name,root,heads", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_np_parse_golden(name, root, heads):
    got_root, got_heads = np_parse(name)
    assert got_root == root
    assert set(got_heads) == heads


def test_np_parse_edge_cases():
    assert np_parse("") == ("", [])
    assert np_parse(None) == ("", [])
    # determiner-only first chunk falls through to the preposition
    assert np_parse("the of x")[0] == "of"
    # root_words are sorted for deterministic array equality in Spark
    _, heads = np_parse("regulation of hypersensitivity")
    assert heads == sorted(heads)


def test_entity_feature_table_uses_np_parse(spark):
    from ontoemma_spark.operators.features import entity_feature_table

    ents = spark.createDataFrame(
        [
            ("E:1", "inflammation of the lung", ["pneumonitis"], "d", [], None, [], None),
            ("E:2", "lung inflammation", ["pneumonitis"], "d", [], None, [], None),
        ],
        "research_entity_id string, canonical_name string, aliases array<string>,"
        " definition string, source_urls array<string>, category string,"
        " other_contexts array<string>, additional_details map<string,array<string>>",
    )
    rows = {r["entity_id"]: r for r in entity_feature_table(ents).collect()}
    # pre-prepositional head, NOT the last token: this is the case the
    # old last-token heuristic got wrong ("lung" instead of "inflammation")
    assert rows["E:1"]["parse_root"] == "inflammation"
    assert rows["E:2"]["parse_root"] == "inflammation"
    assert set(rows["E:1"]["root_words"]) == {"inflammation", "of", "lung"}
