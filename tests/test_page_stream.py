"""Streaming page-ingest curation gate: narrow signals, watermarked
content dedup, streaming == batch."""

import time
from datetime import datetime, timezone

from pyspark.sql import functions as F

from ontoemma_spark.streaming.pages import (
    gate_page_stream,
    gram_repeat_ratio,
    read_page_stream,
)


def _pages(spark, n=60):
    epoch = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = []
    for i in range(n):
        if i % 10 == 0:
            text = "dup dup dup dup dup dup dup dup dup dup"  # degenerate
        else:
            text = " ".join(
                f"word{(i * 13 + j * 5) % 997} item{(i + j * 3) % 53}"
                for j in range(15)
            )
        rows.append((f"u{i:04d}", epoch, bytearray(b""), text, "en"))
    # replayed content: u0001's text under a different url
    rows.append(("u9999", epoch, bytearray(b""), rows[1][3], "en"))
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def test_page_gate_quality_matches_batch_op(spark):
    """The gate's inline quality score must equal textstats
    quality_scores on the same text."""
    from ontoemma_spark.operators.textstats import quality_score_col, quality_scores

    pages = _pages(spark)
    batch = {
        r["doc_id"]: r["quality_score"]
        for r in quality_scores(pages, text_col="text", id_col="url").collect()
    }
    inline = {
        r["url"]: r["q"]
        for r in pages.select(
            "url", F.round(quality_score_col("text"), 6).alias("q")
        ).collect()
    }
    assert inline == batch


def test_gram_repeat_ratio_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z w"), (3, "q")], ["i", "t"]
    )
    got = {
        r["i"]: r["rr"]
        for r in df.select("i", gram_repeat_ratio("t", 2).alias("rr")).collect()
    }
    assert abs(got[1] - 0.5) < 1e-9  # 4 grams, 2 distinct
    assert got[2] == 0.0
    assert got[3] == 0.0  # no grams


def test_page_gate_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages_stream")
    pages = _pages(spark)
    pages.repartition(3).write.mode("overwrite").parquet(src)

    batch = gate_page_stream(spark.read.parquet(src))
    expected_hashes = {r["content_hash"] for r in batch.collect()}
    # degenerate docs gated out; replayed content collapsed to one row
    assert 0 < len(expected_hashes) < 61

    gated = gate_page_stream(read_page_stream(spark, src))
    q = (
        gated.writeStream.format("memory")
        .queryName("t_page_gate")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        got = set()
        while time.time() < deadline:
            q.processAllAvailable()
            got = {
                r["content_hash"] for r in spark.table("t_page_gate").collect()
            }
            if got == expected_hashes:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert got == expected_hashes


def test_flag_stream_against_state_matches_batch(spark, tmp_path):
    """Stream-static rehit flagging composes after the gate's watermark
    dedup (no second stateful op) and produces exactly the batch
    operator's exact flags; fresh content is unflagged."""
    from ontoemma_spark.operators.dedup import dedup_state
    from ontoemma_spark.streaming.pages import flag_stream_against_state

    prior = _pages(spark, n=30).select(
        F.col("url").alias("doc_id"), "text"
    )
    hashes, _ = dedup_state(prior, id_col="doc_id")

    src = str(tmp_path / "pages_incr")
    batch_pages = _pages(spark, n=60)  # first 30 texts rehit the state
    batch_pages.repartition(3).write.mode("overwrite").parquet(src)

    # batch twin through the same composition
    expected = {
        r["content_hash"]: r["exact_rehit"]
        for r in flag_stream_against_state(
            gate_page_stream(spark.read.parquet(src)), hashes
        ).collect()
    }
    assert True in expected.values() and False in expected.values()

    flagged = flag_stream_against_state(
        gate_page_stream(read_page_stream(spark, src)), hashes
    )
    q = (
        flagged.writeStream.format("memory")
        .queryName("t_incr_flags")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        got = {}
        while time.time() < deadline:
            q.processAllAvailable()
            got = {
                r["content_hash"]: r["exact_rehit"]
                for r in spark.table("t_incr_flags").collect()
            }
            if got == expected:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert got == expected
