"""Alignment evaluation (emma/OntoEmma.py:875-950 compare_alignment_to_gold,
emma/CandidateSelection.py:151-222 eval@k, emma/EvaluateAlignments.py:57-65).

Set semantics: TP = pred ∩ gold (inner join), FP = pred \\ gold,
FN = gold \\ pred (anti-joins). Metrics are a single-row select.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ontoemma_spark import config


def precision_recall_f1(predicted: DataFrame, gold: DataFrame) -> DataFrame:
    """One row: tp, fp, fn, precision, recall, f1. Inputs: (s_id, t_id)."""
    p = predicted.select("s_id", "t_id").distinct()
    g = gold.select("s_id", "t_id").distinct()
    tp = p.join(g, ["s_id", "t_id"], "left_semi").count()
    n_pred = p.count()
    n_gold = g.count()
    fp, fn = n_pred - tp, n_gold - tp
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gold if n_gold else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    spark = predicted.sparkSession
    return spark.createDataFrame(
        [(tp, fp, fn, precision, recall, f1)],
        "tp long, fp long, fn long, precision double, recall double, f1 double",
    )


def missed_gold(predicted: DataFrame, gold: DataFrame) -> DataFrame:
    """gold \\ predicted (OntoEmma.py:904; the missed-pairs sink S15)."""
    return gold.select("s_id", "t_id").distinct().join(
        predicted.select("s_id", "t_id").distinct(), ["s_id", "t_id"], "left_anti"
    )


def candidates_eval_at_k(
    candidates: DataFrame,
    gold: DataFrame,
    top_ks: list[int] | None = None,
) -> DataFrame:
    """Precision@k / recall@k over ranked candidates
    (CandidateSelection.py:151-196): for each k, candidate count, positive
    count, p@k = pos/cands, r@k = pos/|gold|. Only source entities that
    appear in gold are evaluated (:172). Expects (s_id, t_id, rank)."""
    top_ks = top_ks or config.EVAL_TOP_KS
    spark = candidates.sparkSession
    g = gold.select("s_id", "t_id").distinct()
    gold_count = g.count()
    cands = candidates.join(g.select("s_id").distinct(), "s_id", "left_semi")
    flagged = cands.join(
        g.withColumn("is_gold", F.lit(1)), ["s_id", "t_id"], "left"
    ).withColumn("is_gold", F.coalesce("is_gold", F.lit(0)))

    ks = spark.createDataFrame([(k,) for k in top_ks], "k int")
    return (
        flagged.join(F.broadcast(ks), flagged["rank"] <= ks["k"])
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cand_count"),
            F.sum("is_gold").alias("pos_count"),
        )
        .select(
            "k",
            "cand_count",
            "pos_count",
            (F.col("pos_count") / F.col("cand_count")).alias("precision_at_k"),
            (F.col("pos_count") / F.lit(gold_count)).alias("recall_at_k"),
        )
        .orderBy("k")
    )


def hard_negatives(
    candidates: DataFrame,
    positives: DataFrame,
    per_source: int = config.NUM_HARD_NEGATIVE_PER_POSITIVE,
) -> DataFrame:
    """Hard-negative sampling (extract_training_data_from_umls.py:311-352):
    per gold source entity, the top-ranked candidates that are NOT gold.
    Deterministic (rank order) instead of the reference's random.sample —
    documented divergence for reproducibility."""
    negs = candidates.join(positives.select("s_id", "t_id"), ["s_id", "t_id"], "left_anti").join(
        positives.select("s_id").distinct(), "s_id", "left_semi"
    )
    w = Window.partitionBy("s_id").orderBy(F.asc("rank"))
    return (
        negs.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= per_source)
        .drop("neg_rank")
    )
