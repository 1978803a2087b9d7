"""UMLS RRF scans + training-data extraction pipeline (SURVEY §3.3,
extract_training_data_from_umls.py) — the reference's most naturally
Spark-shaped component: every step is scan/filter/group/join/write.

  extract_concepts    (:122-143, S14/P6) → pipe-CSV scan + SAB filter
  extract_mappings    (:145-174, J8/O3)  → CUI self-join, cross-SAB,
                                           sab1 < sab2, deduped
  collapse_concepts   (:176-207, A6/W4)  → (SAB, CODE) group, TTY-priority
                                           canonical name, lowercased alias set
  extract_definitions (:209-227, J9/A7)  → MRDEF join on AUI, concat
  extract_relationships (:229-260, J9)   → MRREL join on AUI

TTY priority order mirrors :52-57 (PT > PN > MH > SY > others).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ontoemma_spark.schemas import MRCONSO_COLS, MRDEF_COLS, MRREL_COLS

TRAINING_KBS = [
    "CPT", "FMA", "GO", "HGNC", "HPO", "MSH", "NCI", "OMIM", "RXNORM", "SNOMEDCT_US",
]  # emma/constants.py:34-45

TTY_PRIORITY = ["PT", "PN", "MH", "SY"]  # extract_training_data_from_umls.py:52-57


def _rrf_schema(cols: list[str]) -> StructType:
    # trailing empty field from the terminal '|' becomes one extra col
    return StructType([StructField(c, StringType(), True) for c in cols + ["_trail"]])


def read_rrf(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """S14: pipe-delimited RRF scan with explicit schema (no inference)."""
    return spark.read.csv(path, sep="|", schema=_rrf_schema(cols), header=False).drop("_trail")


def extract_concepts(spark: SparkSession, mrconso_path: str) -> DataFrame:
    """English atoms of training KBs with real codes (P6 filters,
    extract_training_data_from_umls.py:136-137)."""
    conso = read_rrf(spark, mrconso_path, MRCONSO_COLS)
    return conso.filter(
        (F.col("LAT") == "ENG")
        & F.col("SAB").isin(TRAINING_KBS)
        & (F.col("CODE") != "NOCODE")
    ).select("CUI", "AUI", "SAB", "TTY", "CODE", "STR")


def extract_mappings(concepts: DataFrame) -> DataFrame:
    """J8/O3: positive cross-KB mappings — atom pairs sharing a CUI with
    sab1 < sab2 (so each unordered KB pair appears once), deduped on the
    composed ids (extract_training_data_from_umls.py:145-174)."""
    a = concepts.select(
        "CUI", F.col("SAB").alias("sab1"),
        F.concat_ws(":", "SAB", "CODE").alias("id1"),
    )
    b = concepts.select(
        "CUI", F.col("SAB").alias("sab2"),
        F.concat_ws(":", "SAB", "CODE").alias("id2"),
    )
    return (
        a.join(b, "CUI")
        .filter(F.col("sab1") < F.col("sab2"))
        .select("sab1", "sab2", "id1", "id2", "CUI")
        .dropDuplicates(["id1", "id2"])
    )


def collapse_concepts(concepts: DataFrame) -> DataFrame:
    """A6/W4: one entity per (SAB, CODE): canonical name = first STR by
    TTY priority (stable AUI tiebreak), aliases = sorted distinct
    lowercased strings (:176-207)."""
    tty_rank = F.when(F.col("TTY") == TTY_PRIORITY[0], 0)
    for i, tty in enumerate(TTY_PRIORITY[1:], start=1):
        tty_rank = tty_rank.when(F.col("TTY") == tty, i)
    tty_rank = tty_rank.otherwise(len(TTY_PRIORITY))
    ranked = concepts.withColumn("tty_rank", tty_rank)
    w = Window.partitionBy("SAB", "CODE").orderBy("tty_rank", "AUI")
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .groupBy("SAB", "CODE")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("STR"))).alias("canonical_name"),
            F.array_sort(F.collect_set(F.lower("STR"))).alias("aliases"),
            F.array_sort(F.collect_set("AUI")).alias("auis"),
        )
        .select(
            F.concat_ws(":", "SAB", "CODE").alias("research_entity_id"),
            "SAB", "CODE", "canonical_name", "aliases", "auis",
        )
    )


def extract_definitions(entities: DataFrame, spark: SparkSession, mrdef_path: str) -> DataFrame:
    """J9/A7: MRDEF rows resolved to entities via AUI; all definition
    texts concatenated with ' ' (:209-227, join at :290)."""
    mrdef = read_rrf(spark, mrdef_path, MRDEF_COLS).select("AUI", "DEF")
    aui_map = entities.select("research_entity_id", F.explode("auis").alias("AUI"))
    defs = (
        aui_map.join(mrdef, "AUI")
        .groupBy("research_entity_id")
        .agg(F.array_join(F.array_sort(F.collect_list("DEF")), " ").alias("definition"))
    )
    return entities.join(defs, "research_entity_id", "left").withColumn(
        "definition", F.coalesce("definition", F.lit(""))
    )


def extract_relationships(entities: DataFrame, spark: SparkSession, mrrel_path: str) -> DataFrame:
    """J9: MRREL rows resolved to entity ids via both AUI endpoints
    (:229-260). Output: (subject_id, object_id, relation_type)."""
    mrrel = read_rrf(spark, mrrel_path, MRREL_COLS).select("AUI1", "AUI2", "REL")
    aui_map = entities.select(
        F.col("research_entity_id").alias("eid"), F.explode("auis").alias("AUI")
    )
    return (
        mrrel.join(aui_map.withColumnRenamed("eid", "subject_id"),
                   mrrel["AUI1"] == aui_map["AUI"])
        .drop("AUI")
        .join(
            aui_map.select(F.col("eid").alias("object_id"), F.col("AUI").alias("AUI_o")),
            F.col("AUI2") == F.col("AUI_o"),
        )
        .select("subject_id", "object_id", F.col("REL").alias("relation_type"))
        .filter(F.col("subject_id") != F.col("object_id"))
        .distinct()
    )


def add_contexts(entities: DataFrame, contexts: DataFrame) -> DataFrame:
    """Context enrichment join (add_context_to_kb,
    extract_training_data_from_umls.py:596-627): the reference loads a
    name→contexts pickle and sets other_contexts on every entity whose
    canonical_name matches, dropping empty strings. Relationally: a
    broadcast left join on canonical_name (contexts tables are
    KB-sized); entities without a context row keep their existing
    other_contexts. contexts schema: (canonical_name, contexts
    ARRAY<STRING>)."""
    ctx = contexts.select(
        "canonical_name",
        F.filter("contexts", lambda c: c != "").alias("_new_contexts"),
    )
    return (
        entities.join(F.broadcast(ctx), "canonical_name", "left")
        .withColumn(
            "other_contexts",
            F.when(
                F.col("_new_contexts").isNotNull() & (F.size("_new_contexts") > 0),
                F.col("_new_contexts"),
            ).otherwise(F.col("other_contexts")),
        )
        .drop("_new_contexts")
    )
