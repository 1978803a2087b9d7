"""Corpus-curation operators for training-data pipelines: PII
redaction, deterministic mixture sampling, and sequence packing.

These are the stages between "raw deduped webtext" and "tokenizer
input" in an LLM data pipeline (the ROOTS/Dolma-style curation pass);
the reference has no analog — they belong to the beyond-the-reference
operator family the brief makes first-class.

All hot paths are native column expressions; sequence packing is the
one genuinely sequential-per-group computation and runs as a
deterministic Arrow applyInPandas keyed by an EXPLICIT group column
(never by physical partition — results must not depend on the
cluster's partitioning).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Conservative patterns chosen to behave identically under Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{4}"
IPV4_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"

_PII = [("email", EMAIL_RE, "<EMAIL>"), ("phone", PHONE_RE, "<PHONE>"),
        ("ip", IPV4_RE, "<IP>")]


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / phone numbers / IPv4 addresses, replacing each
    with a typed placeholder token, and count hits per class.

    Returns (doc_id, text, n_email, n_phone, n_ip) with text redacted.
    Pure narrow regexp_replace/extract_all column math — runs inside
    the scan stage at any corpus size, zero shuffle, zero Python.
    """
    out = F.col(text_col)
    counts = []
    for name, pat, repl in _PII:
        # null text → null extract array; report 0 hits, not null
        counts.append(
            F.coalesce(F.size(F.regexp_extract_all(out, F.lit(pat), 0)), F.lit(0))
            .cast("bigint")
            .alias(f"n_{name}")
        )
        out = F.regexp_replace(out, pat, repl)
    return docs.select(
        F.col(id_col).alias("doc_id"), *counts, out.alias("text")
    )


def mixture_sample(
    docs: DataFrame,
    weights: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-source mixture sampling (the Pile/Dolma-style
    source weighting): keep each doc with its source's probability,
    decided by a salted content hash — stable across runs, machines,
    and partitionings, so a resumed or re-sharded job keeps exactly
    the same documents.

    weights: (source, weight) with weight in [0, 1]. The draw is
    md5(salt:doc_id) compared lexicographically against the weight's
    8-hex-digit threshold — string comparison is engine-portable
    (identical in Spark, DuckDB, Python), unlike float division of
    hash ints.

    Scale: weights is sources-sized (thousands of hosts at most) →
    broadcast; the draw is narrow. No shuffle of the corpus.
    """
    # weight → 8-hex-digit threshold; weight ≥ 1.0 would need 9 digits
    # ('100000000'), so it maps to a sentinel above every hex draw.
    thresh = F.when(F.col("weight") >= 1.0, F.lit("zzzzzzzz")).otherwise(
        F.lower(
            F.lpad(
                F.conv(
                    F.floor(F.col("weight") * F.lit(float(16**8)))
                    .cast("bigint")
                    .cast("string"),
                    10,
                    16,
                ),
                8,
                "0",
            )
        )
    )
    w = weights.select(
        F.col("source").alias(source_col), thresh.alias("_thresh")
    )
    draw = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8
    )
    return (
        docs.join(F.broadcast(w), source_col)
        .filter(draw < F.col("_thresh"))
        .drop("_thresh")
    )


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    n_groups: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """Greedy sequence packing: fill fixed-capacity training contexts
    with whole documents (first-fit in doc-id order), the standard
    pretraining batch-prep step.

    Documents are assigned to n_groups EXPLICIT groups by id hash (or
    a caller-supplied group_col) — packing runs independently per
    group, so the result is deterministic for a given (corpus,
    max_tokens, grouping) no matter how the cluster partitions the
    data. Within a group, docs are taken in doc_id order; a doc that
    does not fit the open bin closes it. Docs longer than max_tokens
    get a bin of their own (never split — splitting is the tokenizer's
    job downstream).

    Returns (grp, bin_idx, doc_id, n_tokens, bin_fill): one row per
    doc, with bin_fill the bin's running total after the doc. Bins are
    (grp, bin_idx)-scoped.

    Scale: one shuffle keyed by the group hash; each group's packing
    is a single in-memory pass over its docs inside an Arrow batch.
    n_groups bounds task memory: size it so corpus_tokens / n_groups
    fits an executor (at 10^12 docs you raise n_groups, not executor
    memory).
    """
    toks = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    grp = (
        F.col(group_col).cast("bigint")
        if group_col is not None
        else F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_groups)).cast(
            "bigint"
        )
    )
    base = docs.select(
        grp.alias("grp"),
        F.col(id_col).alias("doc_id"),
        toks.alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)  # null/empty text has nothing to pack

    schema = (
        "grp bigint, bin_idx bigint, doc_id bigint, n_tokens bigint, "
        "bin_fill bigint"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        bins, fills = [], []
        bin_idx, fill = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > max_tokens:
                bin_idx += 1
                fill = 0
            fill += n
            bins.append(bin_idx)
            fills.append(fill)
        pdf["bin_idx"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf[["grp", "bin_idx", "doc_id", "n_tokens", "bin_fill"]]

    return base.groupBy("grp").applyInPandas(pack, schema=schema)


def pack_sequences_py(
    rows: list[tuple[int, int, int]], max_tokens: int
) -> list[tuple[int, int, int, int, int]]:
    """Pure-python spec of pack_sequences for property tests. The
    xxhash64 group assignment is not reproducible in pure python, so
    the spec takes pre-grouped input rows = [(group, doc_id,
    n_tokens)] and returns [(group, bin_idx, doc_id, n_tokens,
    bin_fill)]."""
    from collections import defaultdict

    by_group: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for g, d, n in rows:  # type: ignore[misc]
        by_group[g].append((d, n))
    out = []
    for g, docs in by_group.items():
        bin_idx, fill = 0, 0
        for d, n in sorted(docs):
            if fill > 0 and fill + n > max_tokens:
                bin_idx += 1
                fill = 0
            fill += n
            out.append((g, bin_idx, d, n, fill))
    return out
