#!/usr/bin/env python
"""extract_training_data_from_umls.py analog (entry point 3, SURVEY §3.3).

    python scripts/extract_training_data.py \
        --mrconso META/MRCONSO.RRF [--mrdef META/MRDEF.RRF] \
        [--mrrel META/MRREL.RRF] --out out_dir

Writes per-KB entity JSON dumps, the positive-mapping TSV, and
train/dev/test training jsonlines with 1 hard + 1 easy negative per
positive (reference constants).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mrconso", required=True)
    ap.add_argument("--mrdef")
    ap.add_argument("--mrrel")
    ap.add_argument("--out", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from ontoemma_spark.cli import run_extract_training_data
    from ontoemma_spark.session import get_spark

    spark = get_spark(app_name="ontoemma-extract-umls", master=args.master)
    try:
        metrics = run_extract_training_data(
            spark, args.mrconso, args.out, mrdef=args.mrdef, mrrel=args.mrrel
        )
        print(json.dumps(metrics))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
