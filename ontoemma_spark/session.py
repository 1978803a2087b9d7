"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the same config block is what we would
ship to a 1000-executor cluster via spark-submit --conf. AQE handles
runtime skew/coalesce; explicit salting in operators/blocking.py handles
the known-skewed token join.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ontoemma_spark import config


def get_spark(
    app_name: str = "ontoemma-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: match cores; on a real cluster this would be
        # ~2-3x total cores, or left to AQE coalescing from a high initial.
        try:
            shuffle_partitions = int(master.split("[")[1].rstrip("]*")) if "[" in master else 200
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing + skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas-UDF boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(config.ARROW_MAX_RECORDS_PER_BATCH),
        )
        # Parquet vectorized reader + pushdown are on by default.
        # Split size is parameterised (guide §6). MEASURED NEGATIVE
        # RESULT (r6): a 2m local default — meant to let the testdata's
        # multi-row-group files (lineitem, orders) scan in parallel —
        # helped nothing (bow_tie 12.5s→12.3s) and slowed the
        # spread()-based document pipelines ~2x (substring_dup_pairs
        # 3.9s→6.5s, repetition_scores 1.6s→3.0s, isolated A/B), so the
        # default stays 128m; single-split parallelism is bought by
        # spread() at the operators that need it instead. On a real
        # cluster with large scans raise toward 512m-1g (guide §2.2).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
