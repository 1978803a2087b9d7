"""OWL KB parser (S5) and OAEI alignment RDF round trip (S11/S13)."""

from ontoemma_spark.sources.owl import load_alignment_rdf, load_owl, write_alignment_rdf

OWL_SAMPLE = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:oboInOwl="http://www.geneontology.org/formats/oboInOwl#">
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/HP_0000001">
    <rdfs:label>All</rdfs:label>
    <oboInOwl:hasExactSynonym>root</oboInOwl:hasExactSynonym>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/HP_0000118">
    <rdfs:label>Phenotypic abnormality</rdfs:label>
    <rdfs:subClassOf rdf:resource="http://purl.obolibrary.org/obo/HP_0000001"/>
  </owl:Class>
  <owl:Class rdf:about="http://purl.obolibrary.org/obo/HP_0000999"/>
</rdf:RDF>
"""


def test_load_owl(spark, tmp_path):
    p = tmp_path / "ont.owl"
    p.write_text(OWL_SAMPLE)
    ents, edges = load_owl(spark, str(p), kb_prefix="HP")
    e = {r["research_entity_id"]: r for r in ents.collect()}
    assert e["HP:HP_0000001"]["canonical_name"] == "All"
    assert "root" in e["HP:HP_0000001"]["aliases"]
    # unnamed class keeps raw id as name (filtered later by P8)
    assert e["HP:HP_0000999"]["canonical_name"] == "HP_0000999"
    rels = {(r["subject_id"], r["object_id"], r["relation_type"]) for r in edges.collect()}
    assert rels == {("HP:HP_0000118", "HP:HP_0000001", "subClassOf")}


def test_oaei_alignment_round_trip(spark, tmp_path):
    align = spark.createDataFrame(
        [("http://a/1", "http://b/1", 0.95), ("http://a/2", "http://b/2", 0.99)],
        "s_id string, t_id string, score double",
    )
    p = str(tmp_path / "align.rdf")
    write_alignment_rdf(align, p)
    back = load_alignment_rdf(spark, p)
    rows = {(r["s_id"], r["t_id"]): r["score"] for r in back.collect()}
    assert rows == {("http://a/1", "http://b/1"): 0.95, ("http://a/2", "http://b/2"): 0.99}
