#!/usr/bin/env python
"""r6 optimization-round measurement harness (guide §1) — NOT the
driver's bench (bench.py is frozen; this file exists so per-query
isolation, noop-sink timing, and plan capture don't touch it).

Usage:
  python bench_extra.py q1 q2 ...         time named queries (count-sink,
                                          the frozen bench's methodology)
  python bench_extra.py --all             every registry query
  --noop                                  use the noop write sink instead
                                          of count() (times EVERY column)
  --plans DIR                             dump explain("formatted") per
                                          query into DIR/<name>.txt
  --reps N                                best-of-N (default 2)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    noop = "--noop" in args
    run_all = "--all" in args
    plans_dir = None
    if "--plans" in args:
        plans_dir = args[args.index("--plans") + 1]
        os.makedirs(plans_dir, exist_ok=True)
    reps = 2
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])
    names = [
        a for i, a in enumerate(args)
        if not a.startswith("--") and (i == 0 or args[i - 1] not in ("--plans", "--reps"))
    ]

    from ontoemma_spark.plans import demo_queries as dq
    from ontoemma_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="ontoemma-bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    if run_all:
        names = list(dq.QUERIES)
    # warm footers
    for t in ["part", "documents", "embeddings", "events"]:
        try:
            spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
        except Exception:
            pass
    out: dict[str, float] = {}
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        fn = dq.QUERIES[name]
        if os.path.isdir(warm_dir) and warm_dir != SF_DIR:
            try:
                fn(spark, warm_dir).count()
            except Exception:
                pass
        if plans_dir:
            try:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    fn(spark, SF_DIR).explain("formatted")
                with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                    f.write(buf.getvalue())
            except Exception as e:  # noqa: BLE001
                print(f"plan dump failed for {name}: {e}", file=sys.stderr)
        best = None
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"{out[name]:9.3f}  {name}", file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": cpus, "noop": noop, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
