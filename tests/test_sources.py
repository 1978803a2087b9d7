"""Sources: KB JSON round trip (S1/S2), alignment TSV (S9/S12), OBO (S4),
MeSH (S6), UMLS RRF pipeline (S14, J8, A6, J9)."""

import os

from pyspark.sql import functions as F

from ontoemma_spark.datagen import synthetic_kb
from ontoemma_spark.sources.alignment import (
    load_alignment_tsv,
    positive_pairs,
    write_alignment_tsv,
)
from ontoemma_spark.sources.kb_json import (
    dump_kb_json,
    load_kb_json,
    validate_edges,
    validate_entities,
)
from ontoemma_spark.sources.obo import load_mesh, load_obo
from ontoemma_spark.sources.umls import (
    collapse_concepts,
    extract_concepts,
    extract_definitions,
    extract_mappings,
    extract_relationships,
)

OBO_SAMPLE = """format-version: 1.2

[Term]
id: GO:0000001
name: mitochondrion inheritance
def: "The distribution of mitochondria." [GOC:mcc]
synonym: "mitochondrial inheritance" EXACT []
is_a: GO:0048308 ! organelle inheritance
relationship: part_of GO:0048311 ! mito distribution

[Term]
id: GO:0048308
name: organelle inheritance
"""

MESH_SAMPLE = """*NEWRECORD
RECTYPE = D
MH = Calcimycin
ENTRY = A-23187|T109|NON|EQV
ENTRY = A23187
MS = An ionophorous antibiotic.
UI = D000001

*NEWRECORD
RECTYPE = D
MH = Temefos
UI = D000002
"""


def test_kb_json_round_trip(spark, tmp_path):
    ents, edges = synthetic_kb(spark, "RT", n_entities=12)
    p = str(tmp_path / "kb.json")
    dump_kb_json(ents, edges, "RT", p)
    ents2, edges2 = load_kb_json(spark, p)
    assert ents2.count() == 12
    assert edges2.count() == edges.count()
    ids = {r["research_entity_id"] for r in ents2.collect()}
    assert "RT:RT:0000000" in ids
    e = {(r["subject_id"], r["object_id"], r["relation_type"]) for r in edges2.collect()}
    assert ("RT:RT:0000001", "RT:RT:0000000", "is_a") in e


def test_validation_quarantine(spark):
    ents = spark.createDataFrame(
        [("", "x"), ("a", ""), ("b", "ok")], "research_entity_id string, canonical_name string"
    )
    ok, bad = validate_entities(ents)
    assert ok.count() == 1 and bad.count() == 2
    edges = spark.createDataFrame(
        [("a", "b", None), ("a", None, "is_a"), ("a", "b", "is_a")],
        "subject_id string, object_id string, relation_type string",
    )
    ok_e, bad_e = validate_edges(edges)
    assert ok_e.count() == 1 and bad_e.count() == 2


def test_alignment_tsv_round_trip(spark, tmp_path):
    align = spark.createDataFrame(
        [("a", "x", 0.95), ("b", "y", 0.99)], "s_id string, t_id string, score double"
    )
    p = str(tmp_path / "align_out")
    write_alignment_tsv(align, p)
    back = load_alignment_tsv(spark, p)
    rows = back.orderBy(F.desc("label")).collect()
    assert [(r["s_id"], r["t_id"]) for r in rows] == [("b", "y"), ("a", "x")]
    assert rows[0]["provenance"] == "OntoEmma"
    gold = spark.createDataFrame(
        [("a", "x", 1.0, "p"), ("a", "z", 0.0, "p"), ("q", "w", -1.0, "p")],
        "s_id string, t_id string, label double, provenance string",
    )
    assert positive_pairs(gold).count() == 1


def test_obo_parser(spark, tmp_path):
    p = tmp_path / "sample.obo"
    p.write_text(OBO_SAMPLE)
    ents, edges = load_obo(spark, str(p), kb_prefix="GO")
    e = {r["research_entity_id"]: r for r in ents.collect()}
    assert set(e) == {"GO:GO:0000001", "GO:GO:0048308"}
    ent = e["GO:GO:0000001"]
    assert ent["canonical_name"] == "mitochondrion inheritance"
    assert "mitochondrial inheritance" in ent["aliases"]
    assert ent["definition"] == "The distribution of mitochondria."
    rels = {(r["subject_id"], r["object_id"], r["relation_type"]) for r in edges.collect()}
    assert ("GO:GO:0000001", "GO:GO:0048308", "is_a") in rels
    assert ("GO:GO:0000001", "GO:GO:0048311", "part_of") in rels


def test_mesh_parser(spark, tmp_path):
    p = tmp_path / "d.bin"
    p.write_text(MESH_SAMPLE)
    ents = load_mesh(spark, str(p))
    e = {r["research_entity_id"]: r for r in ents.collect()}
    assert e["MSH:D000001"]["canonical_name"] == "Calcimycin"
    assert "A-23187" in e["MSH:D000001"]["aliases"]
    assert e["MSH:D000001"]["definition"] == "An ionophorous antibiotic."
    assert e["MSH:D000002"]["aliases"] == ["Temefos"]


def _write_rrf(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write("|".join(r) + "|\n")


def test_umls_pipeline(spark, tmp_path):
    # MRCONSO: 2 CUIs; C1 has atoms in GO + HPO (cross-KB mapping), C2 only GO
    conso = [
        ["C1", "ENG", "P", "L1", "PF", "S1", "Y", "A1", "", "", "", "GO", "PT", "G1", "alpha syndrome", "0", "N", ""],
        ["C1", "ENG", "P", "L2", "PF", "S2", "Y", "A2", "", "", "", "GO", "SY", "G1", "Alpha Disease", "0", "N", ""],
        ["C1", "ENG", "P", "L3", "PF", "S3", "Y", "A3", "", "", "", "HPO", "PT", "H1", "alpha disorder", "0", "N", ""],
        ["C2", "ENG", "P", "L4", "PF", "S4", "Y", "A4", "", "", "", "GO", "SY", "G2", "beta finding", "0", "N", ""],
        ["C2", "ENG", "P", "L5", "PF", "S5", "Y", "A5", "", "", "", "GO", "PT", "G2", "beta syndrome", "0", "N", ""],
        ["C3", "FRE", "P", "L6", "PF", "S6", "Y", "A6", "", "", "", "GO", "PT", "G3", "gamma", "0", "N", ""],  # non-ENG: dropped
        ["C4", "ENG", "P", "L7", "PF", "S7", "Y", "A7", "", "", "", "XXX", "PT", "X1", "other kb", "0", "N", ""],  # non-training SAB
    ]
    mrdef = [
        ["C1", "A1", "AT1", "", "GO", "a syndrome of alpha", "N", ""],
        ["C1", "A3", "AT2", "", "HPO", "alpha disorder def", "N", ""],
    ]
    mrrel = [
        ["C1", "A1", "AUI", "PAR", "C2", "A4", "AUI", "", "R1", "", "GO", "", "", "", "N", ""],
    ]
    _write_rrf(tmp_path / "MRCONSO.RRF", conso)
    _write_rrf(tmp_path / "MRDEF.RRF", mrdef)
    _write_rrf(tmp_path / "MRREL.RRF", mrrel)

    concepts = extract_concepts(spark, str(tmp_path / "MRCONSO.RRF"))
    assert concepts.count() == 5  # FRE + XXX filtered

    mappings = extract_mappings(concepts)
    m = [(r["id1"], r["id2"], r["CUI"]) for r in mappings.collect()]
    assert m == [("GO:G1", "HPO:H1", "C1")]

    ents = collapse_concepts(concepts)
    e = {r["research_entity_id"]: r for r in ents.collect()}
    assert set(e) == {"GO:G1", "HPO:H1", "GO:G2"}
    # PT beats SY for the canonical name (TTY priority)
    assert e["GO:G1"]["canonical_name"] == "alpha syndrome"
    assert e["GO:G2"]["canonical_name"] == "beta syndrome"
    assert e["GO:G1"]["aliases"] == ["alpha disease", "alpha syndrome"]

    with_defs = extract_definitions(ents, spark, str(tmp_path / "MRDEF.RRF"))
    d = {r["research_entity_id"]: r["definition"] for r in with_defs.collect()}
    assert d["GO:G1"] == "a syndrome of alpha"
    assert d["GO:G2"] == ""

    rels = extract_relationships(ents, spark, str(tmp_path / "MRREL.RRF"))
    assert [(r["subject_id"], r["object_id"], r["relation_type"]) for r in rels.collect()] == [
        ("GO:G1", "GO:G2", "PAR")
    ]


def test_kb_json_minimal_entities(spark, tmp_path):
    """Schema-on-read defaults (KBEntity, kb_utils_refactor.py:14-38):
    entities with ONLY id+name — fields absent from the inferred JSON
    struct entirely, not just null — load with the reference defaults
    (aliases [], definition '<s>', contexts []); relations lacking the
    required keys yield no edges instead of an AnalysisException."""
    import json

    from ontoemma_spark.sources.kb_json import load_kb_json

    p = str(tmp_path / "minimal.json")
    with open(p, "w") as f:
        json.dump({"name": "M",
                   "entities": [{"research_entity_id": "E1",
                                 "canonical_name": "only name"}],
                   "relations": [{"relation_id": 0}]}, f)
    ents, edges = load_kb_json(spark, p)
    row = ents.collect()[0]
    assert row["research_entity_id"] == "E1"
    assert row["aliases"] == [] and row["other_contexts"] == []
    assert row["definition"] == "<s>"
    assert row["category"] is None
    assert edges.count() == 0
