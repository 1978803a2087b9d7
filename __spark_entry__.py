"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: the full ontology-alignment fast path
                (blocking join → string-equiv → BEST strategy) over the
                even/odd part-name KB halves at sf0.001.
queries()     — one entry per implemented operator family from
                SURVEY.md §2 (see ontoemma_spark/plans/demo_queries.py;
                each docstring cites the §2 operator ids).
oracle_sql()  — exact DuckDB twin for every query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from ontoemma_spark.plans import demo_queries as dq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return dq.q_best_match(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(dq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(dq.ORACLES)
