#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Modes:
  python bench.py              one run at $SPARK_GRAFT_CPUS (default 32)
  python bench.py --scaling    same workload at local[8] AND local[32] on
                               identical input; prints the one-line JSON
                               for the high-parallelism run with
                               scaling fields added (throughput at both
                               levels + efficiency = T_8 / (4 * T_32)),
                               evidencing the north rule's N→4N clause.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline queries: the shuffle-heavy / scale-relevant subset
HEADLINE = [
    "blocking_candidates",
    "best_match",
    "string_equiv",
    "connected_components",
    "dedup_exact",
    "minhash_signatures",
    "lsh_dup_candidates",
    "ngram_jaccard_dups",
    "simhash",
    "ann_cosine",
    "lang_id",
    "quality_scores",
    "token_counts",
    "fingerprints",
    "triple_extract",
]


def _run_workload(cpus: int) -> tuple[dict, float, int]:
    """Run headline queries on a fresh local[cpus] session; returns
    (per-query seconds, total seconds, docs processed)."""
    from ontoemma_spark.plans import demo_queries as dq
    from ontoemma_spark.session import get_spark

    spark = get_spark(
        app_name=f"ontoemma-bench-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    try:
        n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        # warm the JVM/parquet footers so per-query times measure the plan
        for t in ["part", "documents", "embeddings", "events", "nation", "region", "customer"]:
            spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
        times: dict[str, float] = {}
        total = 0.0
        for name in HEADLINE:
            fn = dq.QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            times[name] = round(dt, 3)
            total += dt
        return times, total, n_docs
    finally:
        spark.stop()


def main() -> None:
    scaling = "--scaling" in sys.argv
    cpus_hi = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    times_hi, total_hi, n_docs = _run_workload(cpus_hi)
    out = {
        "metric": "headline_queries_total",
        "value": round(total_hi, 3),
        "unit": "sec",
        "queries": times_hi,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus_hi,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / total_hi, 2),
    }

    if scaling:
        cpus_lo = max(2, cpus_hi // 4)
        _, total_lo, _ = _run_workload(cpus_lo)
        # efficiency of scaling from N to 4N cores: perfect scaling would
        # give T_lo / T_hi == 4 → efficiency = T_lo / (4 * T_hi).
        out["scaling"] = {
            "cpus_lo": cpus_lo,
            "cpus_hi": cpus_hi,
            "total_sec_lo": round(total_lo, 3),
            "total_sec_hi": round(total_hi, 3),
            "docs_per_sec_lo": round(n_docs / total_lo, 2),
            "docs_per_sec_hi": round(n_docs / total_hi, 2),
            "speedup": round(total_lo / total_hi, 3),
            "efficiency": round(total_lo / (4 * total_hi), 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
