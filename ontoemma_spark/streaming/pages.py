"""Streaming corpus ingest with an inline curation gate.

Continuous crawl ingest is the streaming face of the curation family:
pages arrive at-least-once (recrawls, mirror replays), and the gate
must run BEFORE anything expensive. Structured Streaming forbids
chained stateful aggregations on one stream, so the gate is built
from NARROW signals only — that is the design point, not a
workaround: per-doc quality and repetition are computable in-row, and
the single stateful op is the watermarked content-hash dedup
(bounded state, exactly-once within the horizon).

The repetition signal here is the in-row form 1 − distinct/total over
w-grams (computable without a shuffle), not the batch
repetition_scores dup-occurrence fraction (which needs a per-gram
count aggregation). Both rank degenerate docs the same way; the batch
op remains the corpus-analytics tool, this one is the ingest gate.

Batch/stream parity: every function works identically on a batch
DataFrame (watermark/dedup degrade to plain distinct), which is how
the equivalence test pins correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ontoemma_spark.operators.dedup import shingle_array
from ontoemma_spark.operators.textstats import quality_score_col

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_page_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a directory of parquet page files
    (north-rule input shape), explicit schema, bounded trigger size."""
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def gram_repeat_ratio(text_col: str = "text", w: int = 2) -> F.Column:
    """In-row repetition signal: 1 − distinct/total over w-grams.
    Zero-shuffle (array math inside the row), hence streamable."""
    grams = shingle_array(text_col, w)
    n = F.size(grams)
    return F.when(
        n > 0,
        1.0 - F.size(F.array_distinct(grams)).cast("double") / n.cast("double"),
    ).otherwise(F.lit(0.0))


def gate_page_stream(
    pages: DataFrame,
    min_quality: float = 0.5,
    max_repeat_ratio: float = 0.3,
    watermark: str = "2 hours",
    w: int = 2,
) -> DataFrame:
    """The ingest curation gate: narrow quality + narrow repetition
    filters, then exactly-once content dedup within the watermark
    horizon (recrawled/mirrored pages with identical text are dropped;
    state is bounded — hashes older than the horizon expire).

    Returns the gated pages with (quality_score, repeat_ratio,
    content_hash) attached. Works identically on a batch DataFrame.
    """
    scored = pages.withColumn(
        # the SAME gates as batch quality_scores, as one in-row
        # expression (a join against quality_scores' output would be a
        # stream-stream join; the gate must stay single-pass)
        "quality_score", quality_score_col("text"),
    ).withColumn("repeat_ratio", gram_repeat_ratio("text", w))
    gated = scored.filter(
        (F.col("quality_score") >= min_quality)
        & (F.col("repeat_ratio") < max_repeat_ratio)
    ).withColumn("content_hash", F.md5(F.col("text")))
    if gated.isStreaming:
        return gated.withWatermark(
            "warc_ts", watermark
        ).dropDuplicatesWithinWatermark(["content_hash"])
    return gated.dropDuplicates(["content_hash"])


def flag_stream_against_state(pages: DataFrame, seen_hashes: DataFrame) -> DataFrame:
    """Stream-static incremental dedup (the streaming face of
    dedup.incremental_dedup's exact probe): left-join the ingest stream
    against the admitted corpus' content-hash state and flag rehits.
    A stream-static equi join is stateless on the stream side —
    composable after gate_page_stream's watermark dedup with no second
    stateful operator.

    The LSH band probe deliberately stays batch-only
    (incremental_dedup): its exploded band collisions need a per-doc
    re-aggregation, a second stateful op Structured Streaming disallows
    after the dedup — run it on the materialized micro-batch output
    instead (the state table is static either way).

    Adds (content_hash if absent, exact_rehit). Works identically on a
    batch DataFrame — the parity test pins it."""
    src = (
        pages
        if "content_hash" in pages.columns
        else pages.withColumn("content_hash", F.md5(F.col("text")))
    )
    seen = seen_hashes.select("content_hash").distinct().withColumn(
        "_seen", F.lit(True)
    )
    return (
        src.join(seen, "content_hash", "left")
        .withColumn("exact_rehit", F.coalesce(F.col("_seen"), F.lit(False)))
        .drop("_seen")
    )
