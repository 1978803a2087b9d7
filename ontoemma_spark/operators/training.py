"""Training-data assembly (SURVEY §2.9 M5/M6, §2.8 F13).

Reference: split_training_data (extract_training_data_from_umls.py:
498-533) does an unseeded 60/20/20 split; sample_negative_mappings
(:311-352) draws 1 hard (candidate) + 1 easy (uniform) negative per
positive with random.sample. Both are made DETERMINISTIC here
(hash-ordered pseudo-randomness) — documented divergence (SURVEY §7.3
hard part 2): reproducibility is a requirement the reference lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ontoemma_spark import config
from ontoemma_spark.functions.text import tokenize


def train_dev_test_split(
    pairs: DataFrame,
    train: float = config.TRAINING_PART,
    dev: float = config.DEVELOPMENT_PART,
    label_col: str = "label",
) -> DataFrame:
    """M5: stratified deterministic split — within each label, rows are
    ordered by a content hash and assigned by quantile position. Adds a
    'split' column ∈ {train, dev, test}."""
    key_cols = [c for c in pairs.columns if c != label_col]
    # md5 hex order as the pseudo-random key: deterministic, engine-
    # portable (identical in DuckDB → oracle-checkable), uniform enough
    # for quantile assignment.
    h = F.md5(F.concat_ws("|", *[F.col(c) for c in key_cols]))
    w = Window.partitionBy(label_col).orderBy(h)
    frac = (F.row_number().over(w) - 0.5) / F.count(F.lit(1)).over(
        Window.partitionBy(label_col)
    )
    return pairs.withColumn(
        "split",
        F.when(frac <= train, "train").when(frac <= train + dev, "dev").otherwise("test"),
    )


def easy_negatives(
    positives: DataFrame,
    t_entities: DataFrame,
    per_positive: int = config.NUM_EASY_NEGATIVE_PER_POSITIVE,
) -> DataFrame:
    """M6 easy half: per positive source, pseudo-random target(s) drawn
    by hash order, excluding its gold targets. Deterministic stand-in
    for random.sample (extract_training_data_from_umls.py:334-337)."""
    t_ids = t_entities.select(F.col("research_entity_id").alias("t_id"))
    s_ids = positives.select("s_id").distinct()
    ranked = s_ids.crossJoin(t_ids).withColumn(
        "h", F.md5(F.concat_ws("|", "s_id", "t_id"))
    ).join(positives.select("s_id", "t_id"), ["s_id", "t_id"], "left_anti")
    w = Window.partitionBy("s_id").orderBy("h")
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_positive)
        .select("s_id", "t_id")
    )


def definition_tfidf_cosine(
    s_entities: DataFrame,
    t_entities: DataFrame,
    pairs: DataFrame,
) -> DataFrame:
    """F13: tf-idf cosine over definition tokens for candidate pairs.
    Sparse-vector cosine as pure relational algebra: explode definition
    tokens with tf, weight by idf over the union corpus, then the cosine
    numerator is a token equi-join restricted to the pair set and the
    norms are per-entity aggregates — no vectors materialized, no UDF.
    Adds 'def_tfidf_cosine' (0.0 when either side has no tokens)."""
    s_tok = s_entities.select(
        F.col("research_entity_id").alias("s_id"),
        F.explode(tokenize(F.coalesce(F.col("definition"), F.lit("")))).alias("token"),
    ).groupBy("s_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    t_tok = t_entities.select(
        F.col("research_entity_id").alias("t_id"),
        F.explode(tokenize(F.coalesce(F.col("definition"), F.lit("")))).alias("token"),
    ).groupBy("t_id", "token").agg(F.count(F.lit(1)).alias("tf"))

    n_docs = s_entities.count() + t_entities.count()
    df = (
        s_tok.select(F.col("s_id").alias("eid"), "token")
        .union(t_tok.select(F.col("t_id").alias("eid"), "token"))
        .groupBy("token")
        .agg(F.countDistinct("eid").alias("df"))
        .select("token", F.log(F.lit(float(n_docs)) / F.col("df") + 1).alias("idf"))
    )
    s_w = s_tok.join(F.broadcast(df), "token").select(
        "s_id", "token", (F.col("tf") * F.col("idf")).alias("s_w")
    )
    t_w = t_tok.join(F.broadcast(df), "token").select(
        "t_id", "token", (F.col("tf") * F.col("idf")).alias("t_w")
    )
    s_norm = s_w.groupBy("s_id").agg(F.sqrt(F.sum(F.col("s_w") ** 2)).alias("s_norm"))
    t_norm = t_w.groupBy("t_id").agg(F.sqrt(F.sum(F.col("t_w") ** 2)).alias("t_norm"))

    numer = (
        pairs.select("s_id", "t_id")
        .join(s_w, "s_id")
        .join(t_w, ["t_id", "token"])
        .groupBy("s_id", "t_id")
        .agg(F.sum(F.col("s_w") * F.col("t_w")).alias("dot"))
    )
    return (
        pairs.join(numer, ["s_id", "t_id"], "left")
        .join(F.broadcast(s_norm), "s_id", "left")
        .join(F.broadcast(t_norm), "t_id", "left")
        .withColumn(
            "def_tfidf_cosine",
            F.when(
                F.col("dot").isNotNull() & (F.col("s_norm") > 0) & (F.col("t_norm") > 0),
                F.col("dot") / (F.col("s_norm") * F.col("t_norm")),
            ).otherwise(F.lit(0.0)),
        )
        .drop("dot", "s_norm", "t_norm")
    )
