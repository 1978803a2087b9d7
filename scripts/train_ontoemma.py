#!/usr/bin/env python
"""Reference-compatible training CLI (train_ontoemma.py analog).

    python scripts/train_ontoemma.py --train train.jsonl \
        -p lr -m model.json [-d eval.jsonl]

Input is the S10 training jsonlines format ({label, source_ent,
target_ent} per line, the same file extract_training_data writes);
output is a JSON weight file usable by run_ontoemma.py -m.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", required=True, help="training jsonlines (S10)")
    ap.add_argument("-p", "--model-type", default="lr", choices=["lr", "nn"])
    ap.add_argument("-m", "--model-path", required=True, help="output JSON weights")
    ap.add_argument("-d", "--evaluation-data-file", help="held-out jsonlines")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from ontoemma_spark.cli import run_train
    from ontoemma_spark.session import get_spark

    spark = get_spark(app_name="ontoemma-train", master=args.master)
    try:
        _, metrics = run_train(
            spark,
            train_path=args.train,
            model_type=args.model_type,
            model_out=args.model_path,
            eval_path=args.evaluation_data_file,
            threshold=args.threshold,
        )
        print(json.dumps(metrics))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
