"""OWL/RDF-XML KB parser (SURVEY §2.1 S5) and OAEI alignment RDF
load/sink (S11/S13).

Reference: KBLoader.import_owl_kb (emma/kb/kb_load_refactor.py:288-452)
parses owl:Class elements with lxml, collecting rdfs:label / skos
labels / oboInOwl synonyms as aliases and rdfs:subClassOf as relations;
_load_alignment_from_rdf (emma/OntoEmma.py:127-154) and
_write_alignment_to_rdf (:970-1016) handle the OAEI alignment format.

XML is not a splittable source; ontologies are the SMALL side of every
join in this engine, so the parse is driver-side (stdlib ElementTree —
no lxml dependency) feeding createDataFrame, exactly like the
reference's in-memory load. Web-scale tables never arrive as XML.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from ontoemma_spark.schemas import EDGE_SCHEMA, ENTITY_SCHEMA

_NS = {
    "owl": "http://www.w3.org/2002/07/owl#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "obo": "http://www.geneontology.org/formats/oboInOwl#",
}
_RDF_ABOUT = f"{{{_NS['rdf']}}}about"
_RDF_RESOURCE = f"{{{_NS['rdf']}}}resource"

_ALIAS_TAGS = [
    f"{{{_NS['rdfs']}}}label",
    f"{{{_NS['skos']}}}prefLabel",
    f"{{{_NS['skos']}}}altLabel",
    f"{{{_NS['obo']}}}hasExactSynonym",
    f"{{{_NS['obo']}}}hasRelatedSynonym",
]
_DEF_TAGS = [f"{{{_NS['obo']}}}hasDefinition", f"{{{_NS['skos']}}}definition"]


def _frag(uri: str) -> str:
    """Local name of a URI (after # or last /) — the reference's raw id."""
    return re.split(r"[#/]", uri)[-1] if uri else uri


def load_owl(spark: SparkSession, path: str, kb_prefix: str = "OWL") -> tuple[DataFrame, DataFrame]:
    """S5: owl:Class elements → (entities, edges)."""
    tree = ET.parse(path)
    ents, edges = [], []
    for cls in tree.getroot().iter(f"{{{_NS['owl']}}}Class"):
        about = cls.get(_RDF_ABOUT)
        if not about:
            continue
        raw_id = _frag(about)
        eid = f"{kb_prefix}:{raw_id}"
        aliases: list[str] = []
        for tag in _ALIAS_TAGS:
            for el in cls.findall(tag):
                if el.text and el.text.strip():
                    aliases.append(el.text.strip())
        definition = ""
        for tag in _DEF_TAGS:
            el = cls.find(tag)
            if el is not None and el.text and el.text.strip():
                definition = el.text.strip()
                break
        # unnamed imports keep the raw id as name (reference behavior,
        # filtered later by P8 filter_named_entities)
        name = aliases[0] if aliases else raw_id
        ents.append((eid, name, aliases or [name], definition, [], None, [], None))
        for sub in cls.findall(f"{{{_NS['rdfs']}}}subClassOf"):
            res = sub.get(_RDF_RESOURCE)
            if res:
                edges.append((eid, f"{kb_prefix}:{_frag(res)}", "subClassOf", False, None))
    return (
        spark.createDataFrame(ents, ENTITY_SCHEMA),
        spark.createDataFrame(edges, EDGE_SCHEMA),
    )


# ---- OAEI alignment RDF (S11/S13) -----------------------------------------

_OAEI_HEADER = """<?xml version="1.0" encoding="utf-8"?>
<rdf:RDF xmlns="http://knowledgeweb.semanticweb.org/heterogeneity/alignment"
  xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  xmlns:xsd="http://www.w3.org/2001/XMLSchema#">
<Alignment>
<xml>yes</xml><level>0</level><type>??</type>
"""
_OAEI_CELL = """<map><Cell>
  <entity1 rdf:resource="{e1}"/>
  <entity2 rdf:resource="{e2}"/>
  <measure rdf:datatype="xsd:float">{m}</measure>
  <relation>=</relation>
</Cell></map>
"""
_OAEI_FOOTER = "</Alignment>\n</rdf:RDF>\n"
_A_NS = "http://knowledgeweb.semanticweb.org/heterogeneity/alignment"


def load_alignment_rdf(spark: SparkSession, path: str) -> DataFrame:
    """S11: OAEI alignment XML → (s_id, t_id, score)."""
    tree = ET.parse(path)
    rows = []
    for cell in tree.getroot().iter(f"{{{_A_NS}}}Cell"):
        e1 = cell.find(f"{{{_A_NS}}}entity1")
        e2 = cell.find(f"{{{_A_NS}}}entity2")
        m = cell.find(f"{{{_A_NS}}}measure")
        if e1 is None or e2 is None:
            continue
        rows.append(
            (
                e1.get(_RDF_RESOURCE),
                e2.get(_RDF_RESOURCE),
                float(m.text) if m is not None and m.text else 1.0,
            )
        )
    return spark.createDataFrame(rows, "s_id string, t_id string, score double")


def write_alignment_rdf(alignment: DataFrame, path: str) -> None:
    """S13: OAEI alignment XML, sorted by score desc (OntoEmma.py:999-1000)."""
    rows = alignment.select("s_id", "t_id", "score").orderBy(
        "score", ascending=False
    ).collect()
    with open(path, "w") as f:
        f.write(_OAEI_HEADER)
        for r in rows:
            f.write(_OAEI_CELL.format(e1=r["s_id"], e2=r["t_id"], m=r["score"]))
        f.write(_OAEI_FOOTER)
