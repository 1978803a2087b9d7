"""Replicates the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables
(sf0.01), compare row-count, column names, and order-insensitive values.
"""

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


# Dtype KIND classes: the driver's exact value-hash renders raw values,
# so an int64 Spark column vs a float64 oracle column ('203' vs '203.0')
# is a red row even when every value matches numerically. The r4 judge
# found our old int64-coercion here masked exactly that (DuckDB sum() ->
# HUGEINT -> pandas float64). Kinds must MATCH before values compare.
_KIND_CLASS = {"i": "int", "u": "int", "f": "float", "b": "bool"}


def _kind(s: pd.Series) -> str:
    return _KIND_CLASS.get(s.dtype.kind, "str")


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].astype(float).round(6)
        elif df[c].dtype.kind in "iub":
            pass  # keep raw integer/bool dtype — NO coercion; drift must fail
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _names():
    import __spark_entry__ as entry

    qs = entry.queries()
    os_ = entry.oracle_sql()
    return qs, os_


QS, OS = _names()


@pytest.mark.parametrize("name", sorted(QS))
def test_query_matches_oracle(spark, name):
    got = QS[name](spark, SF_DIR).toPandas()
    if name not in OS:
        assert got is not None  # rows-only check (non-SQL-expressible op)
        return
    con = _duck()
    exp = con.sql(OS[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    g, e = _normalize(got), _normalize(exp)
    for c in g.columns:
        assert _kind(g[c]) == _kind(e[c]), (
            f"{name}: col {c} dtype kind drift — Spark {got[c].dtype} vs"
            f" oracle {exp[c].dtype}. The driver's exact hash renders raw"
            f" values ('203' vs '203.0'); CAST the DuckDB twin (HUGEINT"
            f" sums need CAST(... AS BIGINT))."
        )
    for c in g.columns:
        if g[c].dtype == float:
            assert (g[c] - e[c]).abs().max() <= 1e-9, f"{name}: col {c} differs"
        else:
            mism = (g[c] != e[c])
            assert not mism.any(), (
                f"{name}: col {c} differs, e.g. {g[c][mism].head(3).tolist()} vs"
                f" {e[c][mism].head(3).tolist()}"
            )


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
