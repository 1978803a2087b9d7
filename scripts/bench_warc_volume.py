#!/usr/bin/env python
"""WARC→pipeline volume bench (VERDICT r3 item 4): generate N synthetic
pages as member-gzip WARC archives (the Common-Crawl layout), then run
the FULL pipeline (extract → link → canonicalize → materialize) with
the archives — not parquet — as the pages input, exercising the
streamed per-member decompress + bounded-batch scan at volume.

    python scripts/bench_warc_volume.py [--pages 2000000] [--archives 32]
           [--workdir /tmp/warc_volume] [--cpus 32] [--keep]

Prints one JSON line: scan + pipeline timings, pages/s, and the
rows-per-batch ceiling that bounds task memory.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate_archives(workdir: str, n_pages: int, n_archives: int) -> str:
    """Round-robin the synthetic pages into member-gzip archives,
    streaming — no page list is ever materialized."""
    from datetime import datetime, timedelta

    from ontoemma_spark.datagen import page_html
    from ontoemma_spark.sources.warc import write_warc

    d = os.path.join(workdir, f"warcs_{n_pages}x{n_archives}")
    if os.path.isdir(d):  # reuse across runs (generation is the slow part)
        return d
    shutil.rmtree(d + ".tmp", ignore_errors=True)  # stale crashed run
    os.makedirs(d + ".tmp")
    t0 = datetime(2026, 1, 1)
    per = -(-n_pages // n_archives)
    for a in range(n_archives):
        lo, hi = a * per, min((a + 1) * per, n_pages)
        with open(os.path.join(d + ".tmp", f"part{a:04d}.warc.gz"), "wb") as f:
            for i in range(lo, hi):
                write_warc(
                    [(f"http://vol.example/{i}", t0 + timedelta(seconds=i % 86400),
                      page_html(i, 150))],
                    f, gzip_members=True,
                )
    os.rename(d + ".tmp", d)
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--archives", type=int, default=32)
    ap.add_argument("--workdir", default="/tmp/warc_volume")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--keep", action="store_true", help="keep generated archives")
    args = ap.parse_args()

    t_gen0 = time.perf_counter()
    warc_dir = generate_archives(args.workdir, args.pages, args.archives)
    t_gen = time.perf_counter() - t_gen0

    from ontoemma_spark import datagen
    from ontoemma_spark.pipeline import run_pipeline
    from ontoemma_spark.session import get_spark
    from ontoemma_spark.sources.warc import load_warc

    spark = get_spark(
        app_name="warc-volume", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    try:
        # scan-only timing first (the new source in isolation)
        t0 = time.perf_counter()
        n_scanned = load_warc(spark, warc_dir).count()
        t_scan = time.perf_counter() - t0

        out_dir = os.path.join(args.workdir, "kg_out")
        shutil.rmtree(out_dir, ignore_errors=True)
        kb_ents, _ = datagen.synthetic_kb(spark, "kb", n_entities=150)
        t0 = time.perf_counter()
        manifest = run_pipeline(spark, load_warc(spark, warc_dir), kb_ents,
                                out_dir=out_dir)
        t_pipe = time.perf_counter() - t0
        m = {s: manifest["stages"][s]["metrics"] for s in manifest["stages"]}
        print(json.dumps({
            "metric": "warc_pipeline_volume",
            "pages": n_scanned,
            "gen_sec": round(t_gen, 1),
            "scan_sec": round(t_scan, 2),
            "scan_pages_per_sec": round(n_scanned / t_scan, 1),
            "pipeline_sec": round(t_pipe, 2),
            "pipeline_pages_per_sec": round(n_scanned / t_pipe, 1),
            "triples": m.get("extract", {}).get("triples"),
            "stages": m,
            "cpus": args.cpus,
            "archives": args.archives,
        }))
    finally:
        spark.stop()
        if not args.keep:
            shutil.rmtree(warc_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
