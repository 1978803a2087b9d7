"""Engineered pairwise features (emma/EngineeredFeatureGenerator.py:226-338).

Architecture (SURVEY.md §4.1 "per-entity memoization"): the reference
memoizes per-entity token work in a dict (:199-207); here that becomes a
materialized per-entity feature table computed ONCE per entity
(entity_feature_table), which candidate pairs join against (broadcast —
the KB side is small). The 32 pairwise features are then pure native
column expressions over the joined row — no Python in the pair loop at
all, which is the hot path at 10^12 pairs.

Stemming/lemmatization run as Arrow-batched pandas UDFs
(iterator-of-series form) since they are per-token Python; everything
else (equality flags, jaccards, max-jaccards, overlaps, acronyms) is
JVM-side.

Known reference bug NOT replicated: _char_tokenize returns a generator
(string_utils.py:27-35 zip object) that the memoized dict entry stores;
after the first pair consumes it, later pairs see an empty set and the
4/5-gram jaccards collapse to -1.0. We materialize lists — documented
divergence (we implement the intended semantics).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from ontoemma_spark.functions.stem import simple_lemmatize, snowball_stem
from ontoemma_spark.functions.text import acronym, char_ngrams, tokenize


_NP_PARSE_TYPE = StructType(
    [
        StructField("root", StringType()),
        StructField("root_words", ArrayType(StringType())),
    ]
)


@pandas_udf(_NP_PARSE_TYPE)
def _np_parse_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """F9: noun-phrase head finder over the RAW canonical name (the
    reference parses ent['canonical_name'] with spaCy — the parse sees
    prepositions and determiners, so it must NOT run on the
    stopword-filtered token array). Backend-dispatching: executors with
    ONTOEMMA_PARSE_BACKEND=spacy + the public model run the real parser
    (parse.np_parse_auto); the default is the deterministic rules."""
    from ontoemma_spark.functions.parse import np_parse_auto

    for series in it:
        parsed = series.map(np_parse_auto)
        yield pd.DataFrame(
            {"root": parsed.map(lambda p: p[0]), "root_words": parsed.map(lambda p: p[1])}
        )


_DERIVED_TEXT_TYPE = StructType(
    [
        StructField("stemmed", ArrayType(StringType())),
        StructField("lemmatized", ArrayType(StringType())),
        StructField("root", StringType()),
        StructField("root_words", ArrayType(StringType())),
    ]
)


@pandas_udf(_DERIVED_TEXT_TYPE)
def _derived_text_udf(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.DataFrame]:
    """Fused per-entity Python work (F8 stem + F8 lemmatize + F9 parse)
    in ONE Arrow round trip — three separate pandas UDFs cost three
    serialize/deserialize passes over the entity table for no reason
    (they are independent per-row functions). Inputs: (name_tokens,
    canonical_name)."""
    from ontoemma_spark.functions.parse import np_parse_auto

    for toks_series, name_series in it:
        stemmed = toks_series.map(
            lambda toks: [snowball_stem(t) for t in toks] if toks is not None else None
        )
        lemmed = toks_series.map(
            lambda toks: [simple_lemmatize(t) for t in toks] if toks is not None else None
        )
        parsed = name_series.map(np_parse_auto)
        yield pd.DataFrame(
            {
                "stemmed": stemmed,
                "lemmatized": lemmed,
                "root": parsed.map(lambda p: p[0]),
                "root_words": parsed.map(lambda p: p[1]),
            }
        )


def _detail(key: str) -> Column:
    """additional_details[key] with the legacy-misspelling patch
    (EngineeredFeatureGenerator.py:216-224): mesh_synonynms accepted,
    missing keys default to []."""
    col = F.element_at(F.col("additional_details"), key)
    if key == "mesh_synonyms":
        col = F.coalesce(col, F.element_at(F.col("additional_details"), "mesh_synonynms"))
    return F.coalesce(col, F.array().cast("array<string>"))


def entity_feature_table(entities: DataFrame, id_out: str = "entity_id") -> DataFrame:
    """Per-entity precompute (EngineeredFeatureGenerator.py:175-197
    _form_dict_entry). One row per entity; joined (broadcast) into the
    candidate-pair DF by featurize_pairs."""
    aliases = F.coalesce(F.col("aliases"), F.array().cast("array<string>"))
    name_tokens = tokenize("canonical_name")
    alias_tokens = F.transform(aliases, lambda a: tokenize(a))
    df = entities.select(
        F.col("research_entity_id").alias(id_out),
        F.col("canonical_name"),
        aliases.alias("aliases"),
        name_tokens.alias("name_tokens"),
        F.array_distinct(char_ngrams("canonical_name", 4)).alias("name_char_4grams"),
        F.array_distinct(char_ngrams("canonical_name", 5)).alias("name_char_5grams"),
        alias_tokens.alias("alias_tokens"),
        F.transform(aliases, lambda a: F.array_distinct(char_ngrams(a, 4))).alias(
            "alias_char_4grams"
        ),
        F.transform(aliases, lambda a: F.array_distinct(char_ngrams(a, 5))).alias(
            "alias_char_5grams"
        ),
        F.transform(alias_tokens, lambda t: acronym(t)).alias("acronyms"),
        F.transform(alias_tokens, lambda t: F.array_sort(t)).alias("alias_token_set"),
        tokenize(F.coalesce(F.col("definition"), F.lit(""))).alias("def_tokens"),
        _detail("wiki_entities").alias("wiki_entities"),
        _detail("mesh_synonyms").alias("mesh_synonyms"),
        _detail("dbpedia_synonyms").alias("dbpedia_synonyms"),
    )
    df = df.withColumn(
        "wiki_ent_tokens", F.transform("wiki_entities", lambda s: tokenize(s))
    ).withColumn(
        "mesh_syn_tokens", F.transform("mesh_synonyms", lambda s: tokenize(s))
    ).withColumn(
        "dbpedia_syn_tokens", F.transform("dbpedia_synonyms", lambda s: tokenize(s))
    )
    # All per-entity Python (F8 stem/lemmatize, F9 parse root — the NP
    # head finder of functions/parse.py, golden-tested in
    # tests/test_parse_root.py) runs in ONE fused Arrow pass.
    df = (
        df.withColumn("_d", _derived_text_udf("name_tokens", "canonical_name"))
        .withColumn("stemmed_name_tokens", F.col("_d.stemmed"))
        .withColumn("lemmatized_name_tokens", F.col("_d.lemmatized"))
        .withColumn("parse_root", F.col("_d.root"))
        .withColumn("root_words", F.col("_d.root_words"))
        .drop("_d")
    )
    return df


def _set_jaccard(a: Column, b: Column) -> Column:
    """Jaccard over arrays treated as sets; -1.0 if either empty
    (string_utils.py:52-63)."""
    nonempty = (F.size(a) > 0) & (F.size(b) > 0)
    return F.when(
        nonempty,
        F.size(F.array_intersect(a, b)).cast("double")
        / F.size(F.array_union(a, b)).cast("double"),
    ).otherwise(F.lit(-1.0))


def _max_jaccard(alists: Column, blists: Column) -> Column:
    """Max pairwise jaccard over two arrays-of-token-arrays
    (EngineeredFeatureGenerator.py:149-163). Reference floor is 0.0 even
    when a pair would score -1.0 (max starts at 0.0). Native nested
    transform + array_max — no Python."""
    all_scores = F.flatten(
        F.transform(alists, lambda a: F.transform(blists, lambda b: _set_jaccard(a, b)))
    )
    return F.coalesce(
        F.greatest(F.array_max(all_scores), F.lit(0.0)), F.lit(0.0)
    )


def _overlaps(a: Column, b: Column) -> Column:
    """Non-disjoint test (EngineeredFeatureGenerator.py:165-173)."""
    return F.coalesce(F.arrays_overlap(a, b), F.lit(False))


# Fixed feature order per the NN dataset reader
# (emma/allennlp_classes/ontoemma_dataset_reader.py:103-141).
FEATURE_NAMES = [
    "has_same_canonical_name",
    "has_same_canonical_name_tokens",
    "has_same_canonical_name_token_set",
    "has_same_stemmed_name_tokens",
    "has_same_stemmed_name_token_set",
    "has_same_lemmatized_name_tokens",
    "has_same_lemmatized_name_token_set",
    "name_char_4gram_jaccard",
    "name_char_5gram_jaccard",
    "has_alias_in_common",
    "has_alias_tokens_in_common",
    "has_alias_token_set_in_common",
    "alias_token_jaccard",
    "max_alias_token_jaccard",
    "max_alias_4gram_jaccard",
    "max_alias_5gram_jaccard",
    "has_same_acronym",
    "definition_token_jaccard",
    "has_same_wiki_entity",
    "wiki_entity_jaccard",
    "max_wiki_entity_jaccard",
    "has_same_mesh_synonym",
    "mesh_synonym_jaccard",
    "max_mesh_synonym_jaccard",
    "has_same_dbpedia_synonym",
    "dbpedia_synonym_jaccard",
    "max_dbpedia_synonym_jaccard",
    "has_overlapping_synonym",
    "all_synonym_jaccard",
    "max_all_synonym_jaccard",
    "has_same_root_word",
    "root_word_jaccard",
]


def featurize_pairs(
    pairs: DataFrame,
    s_features: DataFrame,
    t_features: DataFrame,
    broadcast_features: bool = True,
) -> DataFrame:
    """Candidate pairs (s_id, t_id, ...) × entity feature tables → the 32
    engineered features (EngineeredFeatureGenerator.py:226-338), all as
    native column expressions. Feature tables are broadcast by default
    (KB side is small; at 10^12 pairs the pair side must never move)."""
    s_feat = s_features.select([F.col(c).alias(f"s_{c}") for c in s_features.columns])
    t_feat = t_features.select([F.col(c).alias(f"t_{c}") for c in t_features.columns])
    if broadcast_features:
        s_feat, t_feat = F.broadcast(s_feat), F.broadcast(t_feat)
    df = pairs.join(s_feat, pairs["s_id"] == s_feat["s_entity_id"]).join(
        t_feat, pairs["t_id"] == t_feat["t_entity_id"]
    )

    s, t = (lambda c: F.col(f"s_{c}")), (lambda c: F.col(f"t_{c}"))
    sort = F.array_sort

    s_all = F.concat(s("aliases"), s("wiki_entities"), s("mesh_synonyms"), s("dbpedia_synonyms"))
    t_all = F.concat(t("aliases"), t("wiki_entities"), t("mesh_synonyms"), t("dbpedia_synonyms"))
    s_all_tokens = F.concat(
        s("alias_tokens"), s("wiki_ent_tokens"), s("mesh_syn_tokens"), s("dbpedia_syn_tokens")
    )
    t_all_tokens = F.concat(
        t("alias_tokens"), t("wiki_ent_tokens"), t("mesh_syn_tokens"), t("dbpedia_syn_tokens")
    )

    feats = {
        "has_same_canonical_name": s("canonical_name") == t("canonical_name"),
        "has_same_canonical_name_tokens": s("name_tokens") == t("name_tokens"),
        "has_same_canonical_name_token_set": sort(F.array_distinct(s("name_tokens")))
        == sort(F.array_distinct(t("name_tokens"))),
        "has_same_stemmed_name_tokens": s("stemmed_name_tokens") == t("stemmed_name_tokens"),
        "has_same_stemmed_name_token_set": sort(F.array_distinct(s("stemmed_name_tokens")))
        == sort(F.array_distinct(t("stemmed_name_tokens"))),
        "has_same_lemmatized_name_tokens": s("lemmatized_name_tokens")
        == t("lemmatized_name_tokens"),
        "has_same_lemmatized_name_token_set": sort(F.array_distinct(s("lemmatized_name_tokens")))
        == sort(F.array_distinct(t("lemmatized_name_tokens"))),
        "name_char_4gram_jaccard": _set_jaccard(s("name_char_4grams"), t("name_char_4grams")),
        "name_char_5gram_jaccard": _set_jaccard(s("name_char_5grams"), t("name_char_5grams")),
        "has_alias_in_common": _overlaps(s("aliases"), t("aliases")),
        "has_alias_tokens_in_common": _overlaps(s("alias_tokens"), t("alias_tokens")),
        "has_alias_token_set_in_common": _overlaps(s("alias_token_set"), t("alias_token_set")),
        "alias_token_jaccard": _set_jaccard(s("alias_token_set"), t("alias_token_set")),
        "max_alias_token_jaccard": _max_jaccard(s("alias_token_set"), t("alias_token_set")),
        "max_alias_4gram_jaccard": _max_jaccard(s("alias_char_4grams"), t("alias_char_4grams")),
        "max_alias_5gram_jaccard": _max_jaccard(s("alias_char_5grams"), t("alias_char_5grams")),
        "has_same_acronym": _overlaps(s("acronyms"), t("acronyms"))
        | _overlaps(s("acronyms"), t("aliases"))
        | _overlaps(s("aliases"), t("acronyms")),
        "definition_token_jaccard": _set_jaccard(s("def_tokens"), t("def_tokens")),
        "has_same_wiki_entity": _overlaps(s("wiki_entities"), t("wiki_entities")),
        "wiki_entity_jaccard": _set_jaccard(s("wiki_entities"), t("wiki_entities")),
        "max_wiki_entity_jaccard": _max_jaccard(s("wiki_ent_tokens"), t("wiki_ent_tokens")),
        "has_same_mesh_synonym": _overlaps(s("mesh_synonyms"), t("mesh_synonyms")),
        "mesh_synonym_jaccard": _set_jaccard(s("mesh_synonyms"), t("mesh_synonyms")),
        "max_mesh_synonym_jaccard": _max_jaccard(s("mesh_syn_tokens"), t("mesh_syn_tokens")),
        "has_same_dbpedia_synonym": _overlaps(s("dbpedia_synonyms"), t("dbpedia_synonyms")),
        "dbpedia_synonym_jaccard": _set_jaccard(s("dbpedia_synonyms"), t("dbpedia_synonyms")),
        "max_dbpedia_synonym_jaccard": _max_jaccard(
            s("dbpedia_syn_tokens"), t("dbpedia_syn_tokens")
        ),
        "has_overlapping_synonym": _overlaps(s_all, t_all),
        "all_synonym_jaccard": _set_jaccard(s_all, t_all),
        "max_all_synonym_jaccard": _max_jaccard(s_all_tokens, t_all_tokens),
        "has_same_root_word": s("parse_root") == t("parse_root"),
        "root_word_jaccard": _set_jaccard(
            F.array_distinct(s("root_words")), F.array_distinct(t("root_words"))
        ),
    }
    out_cols = [F.col(c) for c in pairs.columns]
    out_cols += [feats[name].cast("double").alias(name) for name in FEATURE_NAMES]
    return df.select(*out_cols)
