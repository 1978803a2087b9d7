#!/usr/bin/env python
"""spark-submit entry point for the KG-construction pipeline.

Cluster usage (north-rule ship clause):

    zip -r ontoemma_spark.zip ontoemma_spark
    spark-submit --py-files ontoemma_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        scripts/run_pipeline.py \
        --pages /path/to/pages_parquet_or_iceberg \
        --kb /path/to/kb_entities_parquet \
        --out /path/to/out_dir

Local smoke (synthetic input):

    python scripts/run_pipeline.py --synthetic --out /tmp/kgpipe_out
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages table path (url, warc_ts, html, text, lang)")
    ap.add_argument("--kb", help="KB entities parquet path")
    ap.add_argument("--out", required=True, help="output/checkpoint dir")
    ap.add_argument("--synthetic", action="store_true", help="use synthetic fixtures")
    ap.add_argument("--threshold", type=float, default=0.90)
    ap.add_argument("--fuse", action="store_true",
                    help="append the evidence-fusion stage (one row per "
                         "canonical (s,r,o) with support/n_hosts/belief)")
    args = ap.parse_args()

    from ontoemma_spark.pipeline import run_pipeline
    from ontoemma_spark.session import get_spark

    spark = get_spark(app_name="ontoemma-kg-pipeline")
    if args.synthetic:
        from ontoemma_spark.datagen import synthetic_kb, synthetic_pages

        pages = synthetic_pages(spark, n_pages=200)
        kb, _ = synthetic_kb(spark, "KB", n_entities=150)
    else:
        if not (args.pages and args.kb):
            ap.error("--pages and --kb are required without --synthetic")
        import glob as _glob

        if args.pages.endswith((".warc", ".warc.gz")):
            from ontoemma_spark.sources.warc import load_warc

            pages = load_warc(spark, args.pages)
        elif _glob.glob(os.path.join(args.pages, "*.warc*")):
            from ontoemma_spark.sources.warc import load_warc

            # glob only the archives — the directory may hold other data
            pages = load_warc(spark, os.path.join(args.pages, "*.warc*"))
        else:
            pages = spark.read.parquet(args.pages)
        kb = spark.read.parquet(args.kb)

    manifest = run_pipeline(spark, pages, kb, args.out,
                            threshold=args.threshold, fuse=args.fuse)
    print(json.dumps({k: v["metrics"] for k, v in manifest["stages"].items()}))
    spark.stop()


if __name__ == "__main__":
    main()
