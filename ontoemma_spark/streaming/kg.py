"""Streaming KG edge ingest: fold each micro-batch of extracted
triples into the standing weighted-edge table.

The continuous face of `graph.upsert_edges` — the batch pipeline's
materialize stage assumes a finished crawl; production ingest sees an
unbounded stream of (subj, pred, obj, url, ts) emissions and must keep
the consolidated edge table current WITHOUT ever re-aggregating
history. Structured Streaming cannot express the standing-table merge
as a streaming aggregation (the state is an externally-readable table,
not operator state), so this is the canonical foreachBatch shape:

  per micro-batch (exactly-once via the sink's own idempotence):
    1. consolidate the batch: weighted_edges — ONE map-side-combinable
       aggregate over the batch only;
    2. sketch the batch's pages per edge (sketch.hll_sketch) so the
       distinct-page count survives cross-batch merging;
    3. merge into the newest state version: upsert_edges — ONE
       full-outer equi join, batch-sized side vs standing side;
    4. write state version v{batch_id} and prune old versions.

Exactly-once: Structured Streaming replays a failed micro-batch with
the SAME batch_id. State versions are keyed by batch_id and a replay
OVERWRITES v{batch_id} after re-reading its PREDECESSOR (the newest
version with id < batch_id) — never its own partial output — so the
merge is idempotent: rerunning batch k yields byte-identical v{k}.
Version dirs are committed by Spark's parquet _SUCCESS marker; readers
(`read_edge_state`) only trust marked versions.

At 10^12 pages the standing table is the large side: written bucketed
by the triple key (tableio.write_stage bucket_col) the merge join is
exchange-free on it; the plain-parquet default here keeps the local
test hermetic while the layout seam stays the same.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (callers compose exprs)

from ontoemma_spark.operators.graph import upsert_edges, weighted_edges
from ontoemma_spark.operators.sketch import hll_sketch

_STATE_PREFIX = "v"


def _versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    out = []
    for name in os.listdir(state_dir):
        if name.startswith(_STATE_PREFIX) and name[len(_STATE_PREFIX):].isdigit():
            if os.path.exists(os.path.join(state_dir, name, "_SUCCESS")):
                out.append(int(name[len(_STATE_PREFIX):]))
    return sorted(out)


def _version_path(state_dir: str, version: int) -> str:
    return os.path.join(state_dir, f"{_STATE_PREFIX}{version:010d}")


def read_edge_state(
    spark: SparkSession, state_dir: str, before: int | None = None
) -> DataFrame | None:
    """Newest committed state version (optionally: newest with id <
    `before`, which is what a replayed batch must read). None when no
    committed version exists yet."""
    versions = _versions(state_dir)
    if before is not None:
        versions = [v for v in versions if v < before]
    if not versions:
        return None
    return spark.read.parquet(_version_path(state_dir, versions[-1]))


def apply_edge_batch(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    key_cols: tuple[str, ...] = ("subj", "pred", "obj"),
    page_col: str = "url",
    ts_col: str = "ts",
    sketch_m: int = 64,
    keep_versions: int = 2,
) -> None:
    """The foreachBatch body, callable directly for batch-mode tests.
    Idempotent in batch_id (see module docstring).

    keep_versions must be 0 (keep everything) or >= 2: the replay
    contract reads the PREDECESSOR version, so keep_versions=1 — which
    deletes it right after writing v{batch_id} — would make a replayed
    batch read current=None and silently replace the whole standing
    table with that batch alone. Refused loudly.
    """
    from pyspark import StorageLevel

    if keep_versions == 1:
        raise ValueError(
            "keep_versions=1 deletes the predecessor a replayed batch "
            "must re-read (exactly-once breaks); use 0 (unlimited) or >= 2"
        )
    spark = batch.sparkSession
    # the batch feeds TWO aggregates (weighted_edges + hll_sketch);
    # unpersisted, the stream source is scanned twice per trigger
    batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        consolidated = weighted_edges(
            batch, key_cols=key_cols, page_col=page_col, ts_col=ts_col
        )
        # null-SAFE key join: weighted_edges and hll_sketch both keep
        # null-key groups (groupBy treats NULL as a group); a
        # null-unsafe equi join would silently drop those edges and
        # diverge from the batch reference
        sk = hll_sketch(batch, list(key_cols), page_col, m=sketch_m)
        cond = None
        for k in key_cols:
            this = F.col(f"w.{k}").eqNullSafe(F.col(f"s.{k}"))
            cond = this if cond is None else cond & this
        sketched = (
            consolidated.alias("w")
            .join(sk.alias("s"), cond)
            .select("w.*", F.col("s.hll").alias("hll"))
        )
        current = read_edge_state(spark, state_dir, before=batch_id)
        merged = (
            sketched
            if current is None
            else upsert_edges(
                current, sketched, key_cols=key_cols,
                sketch_col="hll", sketch_m=sketch_m,
            )
        )
        merged.write.mode("overwrite").parquet(
            _version_path(state_dir, batch_id)
        )
    finally:
        batch.unpersist()
    prunable = _versions(state_dir)[:-keep_versions] if keep_versions else []
    for v in prunable:
        if v != batch_id:
            shutil.rmtree(_version_path(state_dir, v), ignore_errors=True)


def upsert_edge_stream(
    triples: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key_cols: tuple[str, ...] = ("subj", "pred", "obj"),
    page_col: str = "url",
    ts_col: str = "ts",
    sketch_m: int = 64,
):
    """Attach the incremental edge merge to a streaming triples frame;
    returns the started StreamingQuery (availableNow-style callers
    should `awaitTermination()`)."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_edge_batch(
            batch, batch_id, state_dir,
            key_cols=key_cols, page_col=page_col, ts_col=ts_col,
            sketch_m=sketch_m,
        )

    return (
        triples.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
