"""Distributed WARC reader: Common-Crawl's native archive format →
the north-rule pages table (url, warc_ts, html, text, lang).

A WARC file is a sequence of records, each:

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...
    \r\n
    <Content-Length bytes of payload>\r\n\r\n

Common Crawl ships ~1 GiB gzipped WARCs, ~60k per crawl; the unit of
parallelism is the FILE (one task per archive), which is exactly how
production CC pipelines shard — Spark's binaryFile source lists the
archives and each task parses its own file with a pure-python record
scanner inside mapInPandas (Arrow-batched output). Response records
with an http payload become pages rows; the html payload is kept as
opaque binary for the extract stage (extract/html_text.py) and `text`
stays null so the pipeline's `coalesce(text, extract_text_col(html))`
fills it.

Member-gzip archives (each record its own gzip member — the CC
layout) and plain-gzip and uncompressed files are all handled:
gzip.decompress consumes concatenated members.

No reference counterpart (the reference ingests ontologies, not web
archives); this is the S-north pages-scan source materialized from
the archive format instead of parquet.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime
import gzip

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _split_records(raw: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC record from one archive."""
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        head_end = raw.find(b"\r\n\r\n", pos)
        if head_end < 0 or not raw[pos : pos + 5].startswith(b"WARC/"):
            return
        headers: dict[str, str] = {}
        for line in raw[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return  # malformed length: stop scanning this archive
        body_start = head_end + 4
        yield headers, raw[body_start : body_start + length]
        pos = body_start + length


def _http_payload(body: bytes) -> bytes:
    """Response-record bodies carry an HTTP message; strip its header
    block. Records without an HTTP preamble pass through unchanged."""
    if body[:5] in (b"HTTP/",):
        sep = body.find(b"\r\n\r\n")
        if sep >= 0:
            return body[sep + 4 :]
    return body


def _parse_ts(value: str):
    """WARC-Date is ISO-8601 (e.g. 2026-01-17T08:51:02Z)."""
    try:
        return datetime.fromisoformat(value.replace("Z", "+00:00")).astimezone(
            timezone.utc
        ).replace(tzinfo=None)
    except ValueError:
        try:
            return parsedate_to_datetime(value).astimezone(timezone.utc).replace(
                tzinfo=None
            )
        except (TypeError, ValueError):
            return None


def parse_warc_bytes(raw: bytes) -> list[tuple]:
    """Pure-python archive → pages rows (the per-task kernel; also the
    twin the tests pin against). Handles gzip (incl. concatenated
    members) transparently."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    rows = []
    for headers, body in _split_records(raw):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        rows.append(
            (url, _parse_ts(headers.get("warc-date", "")), _http_payload(body),
             None, None)
        )
    return rows


def load_warc(spark: SparkSession, path: str) -> DataFrame:
    """Pages table from a directory/glob of .warc / .warc.gz archives.

    Parallelism = one task per archive file (binaryFile source), the
    production CC sharding unit; each task runs the pure-python record
    scanner and emits Arrow batches. At 10^12 pages you have ~10^5
    archives per crawl — ample task parallelism with zero shuffle.
    """
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for content in pdf["content"]:
                for url, ts, html, text, lang in parse_warc_bytes(bytes(content)):
                    out["url"].append(url)
                    out["warc_ts"].append(ts)
                    out["html"].append(html)
                    out["text"].append(text)
                    out["lang"].append(lang)
            pdf_out = pd.DataFrame(out)
            # empty batches infer float64 for the ts column, which Arrow
            # cannot cast to timestamp — coerce explicitly
            pdf_out["warc_ts"] = pd.to_datetime(pdf_out["warc_ts"])
            yield pdf_out

    return files.mapInPandas(parse, schema=PAGES_SCHEMA)


def write_warc(rows: list[tuple], fileobj, gzip_members: bool = False) -> None:
    """Serialize (url, ts, html_bytes) rows as WARC response records —
    the test/fixture writer (member-gzip like Common Crawl when
    gzip_members)."""
    for url, ts, html in rows:
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        )
        ts_s = (ts or datetime(2026, 1, 1)).strftime("%Y-%m-%dT%H:%M:%SZ")
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"WARC-Date: {ts_s}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
            + payload
            + b"\r\n\r\n"
        )
        fileobj.write(gzip.compress(rec) if gzip_members else rec)
