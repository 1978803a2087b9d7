#!/usr/bin/env python
"""spark-submit entry point for the corpus-curation pass
(quality/repetition gate → benchmark decontamination → near-dup
resolution → mixture sampling → PII redaction → sequence packing).

Cluster usage:

    zip -r ontoemma_spark.zip ontoemma_spark
    spark-submit --py-files ontoemma_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        scripts/curate_corpus.py \
        --docs /path/to/documents_parquet \
        [--benchmark /path/to/benchmark_parquet] \
        [--weights-json /path/to/weights.json] \
        --out /path/to/packed_out

Local smoke:

    python scripts/curate_corpus.py --synthetic --out /tmp/curated
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", help="documents parquet (doc_id, text, source)")
    ap.add_argument("--benchmark", help="benchmark docs parquet (doc_id, text); "
                                        "omit to skip decontamination")
    ap.add_argument("--weights-json", help="JSON {source: weight}; omit for 1.0")
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-tokens", type=int, default=2048)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--pre-dedup-paragraphs", action="store_true",
                    help="CC-Net stage 0: drop corpus-wide repeated "
                         "paragraphs before scoring (rewrites doc text)")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ontoemma_spark.operators.curation import curate_corpus
    from ontoemma_spark.session import get_spark

    spark = get_spark(app_name="ontoemma-curate")
    if args.synthetic:
        # varied grams (a degenerate corpus is — correctly — eaten by
        # the repetition gate)
        rows = [
            (i, f"src{i % 4}",
             " ".join(f"word{(i * 13 + j * 5) % 997} item{(i + j * 3) % 53}"
                      for j in range(30)))
            for i in range(400)
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    else:
        if not args.docs:
            ap.error("--docs is required without --synthetic")
        docs = spark.read.parquet(args.docs)

    if args.benchmark:
        benchmark = spark.read.parquet(args.benchmark)
    elif args.synthetic:
        benchmark = docs.filter(F.col("doc_id") % 50 == 0)
    else:
        benchmark = docs.limit(0)  # no decontamination set

    srcs = docs.select("source").distinct()
    if args.weights_json:
        with open(args.weights_json) as f:
            wmap = json.load(f)
        user_w = spark.createDataFrame(list(wmap.items()), ["source", "weight"])
        # sources absent from the JSON keep weight 1.0 — mixture_sample
        # inner-joins on source, so an uncovered source would otherwise
        # be dropped silently
        weights = srcs.join(user_w, "source", "left").select(
            "source", F.coalesce("weight", F.lit(1.0)).alias("weight")
        )
    else:
        weights = srcs.withColumn("weight", F.lit(1.0))

    # pre-size packing groups from the input count (an upper bound on
    # survivors) so pack_sequences' auto-count doesn't execute the whole
    # curation chain an extra time before the write runs it again
    docs_in = docs.count()
    n_groups = max(16, -(-docs_in // 50_000))
    packed = curate_corpus(
        docs, benchmark, weights,
        max_tokens=args.max_tokens, min_quality=args.min_quality,
        n_pack_groups=n_groups,
        pre_dedup_paragraphs=args.pre_dedup_paragraphs,
    )
    packed.write.mode("overwrite").parquet(args.out)

    out = spark.read.parquet(args.out)
    stats = out.agg(
        F.count(F.lit(1)).alias("docs_packed"),
        F.countDistinct("grp", "bin_idx").alias("bins"),
        F.sum("n_tokens").alias("tokens"),
    ).collect()[0]
    print(json.dumps({
        "docs_in": docs_in,
        "docs_packed": stats["docs_packed"],
        "bins": stats["bins"],
        "tokens": stats["tokens"],
        "max_tokens": args.max_tokens,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
