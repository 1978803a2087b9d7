"""Neural pair scorer plumbing (SURVEY §2.9 M3).

Reference: OntoEmmaNN (emma/allennlp_classes/ontoemma_model.py:73-164) —
a siamese name/alias/definition encoder + decision FF, applied in
batches of 128 (emma/OntoEmma.py:737,766-797).

Torch/AllenNLP are not available in this container, so the MODEL is
stubbed — but the Spark-side plumbing is the production shape and is
tested: grouped Arrow batches via mapInPandas (iterator form → model
loaded ONCE per executor/partition, not per batch), fixed input schema,
score column out. Swapping `_load_model` for a real torch load is the
only change needed; everything around it already handles 10^12 pairs
(the pair DF is the big side and never collects).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

TORCH_AVAILABLE = False  # no torch in this container

NN_INPUT_COLS = ["s_id", "t_id", "s_name", "t_name"]
NN_OUTPUT_SCHEMA = "s_id string, t_id string, score double"


def _load_model(model_path: str | None):
    """Executor-side model load — called once per partition iterator.
    Production: torch.load + eval(); here: a deterministic fake that
    scores by name-hash agreement (stable, testable plumbing)."""
    if TORCH_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("plug torch.load(model_path) here")

    def fake_score(s_name: str, t_name: str) -> float:
        if s_name == t_name:
            return 1.0
        h = hashlib.md5(f"{s_name}|{t_name}".encode()).digest()
        return h[0] / 512.0  # ∈ [0, 0.5): below any alignment threshold

    return fake_score


def score_pairs_nn(
    pairs_with_names: DataFrame,
    model_path: str | None = None,
    batch_size: int = 128,
) -> DataFrame:
    """M3: batched NN inference over (s_id, t_id, s_name, t_name).
    Arrow batch size is configured at the session level
    (spark.sql.execution.arrow.maxRecordsPerBatch); the reference's
    batch_size=128 analog."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _load_model(model_path)  # once per partition
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "s_id": pdf["s_id"],
                    "t_id": pdf["t_id"],
                    "score": [
                        model(s, t) for s, t in zip(pdf["s_name"], pdf["t_name"])
                    ],
                }
            )

    return pairs_with_names.select(*NN_INPUT_COLS).mapInPandas(
        run, schema=NN_OUTPUT_SCHEMA
    )
