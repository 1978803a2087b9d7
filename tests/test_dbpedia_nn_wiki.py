"""S7 DBpedia N-Triples parser, M3 NN-scorer plumbing, F14 wiki clean."""

from pyspark.sql import functions as F

from ontoemma_spark.extract.html_text import clean_wiki_text, clean_wiki_text_py
from ontoemma_spark.operators.scoring_nn import score_pairs_nn
from ontoemma_spark.sources.dbpedia import load_dbpedia_ntriples

NT_SAMPLE = """<http://dbpedia.org/resource/Aspirin> <http://www.w3.org/2000/01/rdf-schema#label> "Aspirin"@en .
<http://dbpedia.org/resource/Aspirin> <http://www.w3.org/2000/01/rdf-schema#label> "Aspirine"@fr .
<http://dbpedia.org/resource/Aspirin> <http://dbpedia.org/ontology/abstract> "Aspirin is a medication."@en .
<http://dbpedia.org/resource/Aspirin> <http://dbpedia.org/ontology/wikiPageWikiLink> <http://dbpedia.org/resource/Drug> .
<http://dbpedia.org/resource/Ibuprofen> <http://www.w3.org/2000/01/rdf-schema#label> "Ibuprofen"@en .
"""


def test_dbpedia_ntriples(spark, tmp_path):
    p = tmp_path / "dump.nt"
    p.write_text(NT_SAMPLE)
    ents = {r["research_entity_id"]: r for r in load_dbpedia_ntriples(spark, str(p)).collect()}
    a = ents["DBP:Aspirin"]
    assert a["canonical_name"] == "Aspirin"
    assert a["aliases"] == ["Aspirin"]  # @fr label filtered by lang
    assert a["definition"] == "Aspirin is a medication."
    assert ents["DBP:Ibuprofen"]["definition"] == ""


def test_nn_scorer_plumbing(spark):
    pairs = spark.createDataFrame(
        [("s1", "t1", "heart attack", "heart attack"),
         ("s2", "t2", "heart attack", "liver failure")],
        "s_id string, t_id string, s_name string, t_name string",
    )
    got = {r["s_id"]: r["score"] for r in score_pairs_nn(pairs).collect()}
    assert got["s1"] > 0.9           # exact-name pair scores high
    assert 0.0 <= got["s2"] < 0.5    # trained model keeps non-matches below threshold
    # deterministic across runs
    again = {r["s_id"]: r["score"] for r in score_pairs_nn(pairs).collect()}
    assert got == again


def test_clean_wiki_text_length_preserving(spark):
    s = "Aspirin[3] is used[citation needed] widely."
    cleaned = clean_wiki_text_py(s)
    assert len(cleaned) == len(s)
    assert "[3]" not in cleaned and "citation" not in cleaned
    assert cleaned.startswith("Aspirin    is used")

    df = spark.createDataFrame([("u", s)], "url string, text string")
    row = clean_wiki_text(df).collect()[0]
    assert row["text"] == cleaned
