"""Bucketed table materialization (SURVEY §4.4, north-rule bucket clause).

Writing both sides of a recurring join bucketed by the join key makes
every subsequent join co-located: Spark's bucketed scan satisfies the
join's required distribution, so the exchange disappears from the plan
(asserted in tests/test_bucketed_join.py). On Iceberg this is
`writeTo(...).partitionedBy(bucket(n, key))` + storage-partitioned
joins; the parquet/metastore form below is the sandbox equivalent.

This is the physical design for the KG node/edge tables at 10^12 rows:
edges bucketed by subject entity hash mean entity-centric queries
(neighborhood expansion, degree stats, CC rounds) shuffle nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) table."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key — no
    exchange when bucketing lines up."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
