"""Mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf0.001 parquet,
compare row count + order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    cols = sorted(sdf.columns)
    spark_rows = _normalize(
        [r.asDict() for r in sdf.collect()], cols
    )
    odf = ddb.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(odf.columns.tolist()) == cols, (
        f"column mismatch: spark={cols} oracle={sorted(odf.columns.tolist())}"
    )
    oracle_rows = _normalize(odf.to_dict("records"), cols)
    assert len(spark_rows) == len(oracle_rows)
    assert spark_rows == oracle_rows


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize(
    "name",
    sorted(set(entrymod.queries()) - set(entrymod.oracle_sql())),
)
def test_rows_only_queries_run(spark, name):
    # queries without a SQL oracle (driver records rows-only): still
    # must run and return rows at sf0.001
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() > 0
