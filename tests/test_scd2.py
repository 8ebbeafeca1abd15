"""scd2_history / as_of: interval construction vs a DuckDB window
oracle, delete-closure semantics, point-in-time parity with the LWW
snapshot, and the one-exchange plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.streaming import as_of, scd2_history


@pytest.fixture(scope="module")
def changelog(spark):
    # (k, lsn, op, v) — key "a": u,u,d,u (delete mid-history, reborn);
    # key "b": u,d (ends deleted); key "c": single insert
    rows = [
        ("a", 1, "u", 10.0), ("a", 3, "u", 11.0), ("a", 5, "d", None),
        ("a", 9, "u", 12.0),
        ("b", 2, "u", 20.0), ("b", 4, "d", None),
        ("c", 7, "u", 30.0),
    ]
    return spark.createDataFrame(rows, "k string, lsn long, op string, v double")


def test_scd2_matches_duckdb_window_oracle(spark, changelog):
    out = sorted(
        (r.k, r.valid_from, r.valid_to, r.version, r.is_current, r.v)
        for r in scd2_history(changelog, ["k"], "lsn", op_col="op").collect()
    )
    cp = changelog.toPandas()
    oracle = sorted(
        tuple(t)
        for t in duckdb.sql(
            "SELECT k, lsn AS valid_from, "
            "lead(lsn) OVER (PARTITION BY k ORDER BY lsn) AS valid_to, "
            "row_number() OVER (PARTITION BY k ORDER BY lsn) AS version, "
            "lead(lsn) OVER (PARTITION BY k ORDER BY lsn) IS NULL "
            "AS is_current, v "
            "FROM cp QUALIFY op <> 'd'"
        ).fetchall()
    )
    assert out == oracle


def test_scd2_delete_closes_interval(spark, changelog):
    hist = {
        (r.k, r.version): (r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(changelog, ["k"], "lsn", op_col="op").collect()
    }
    # a@v2 (lsn 3) is closed by the delete at lsn 5, not by the rebirth
    assert hist[("a", 2)] == (3, 5, False)
    # the rebirth at lsn 9 is version 4 (delete counted) and current
    assert hist[("a", 4)] == (9, None, True)
    # b ends deleted: no current row for b
    assert ("b", 2) not in hist and hist[("b", 1)] == (2, 4, False)
    # c single insert: open interval
    assert hist[("c", 1)] == (7, None, True)


def test_as_of_reconstructs_past_state(spark, changelog):
    hist = scd2_history(changelog, ["k"], "lsn", op_col="op")
    # at lsn=4: a holds v2 (11.0); b was upserted at 2, delete at 4
    # has already applied (valid_to=4 exclusive); c not yet born
    state = {r.k: r.v for r in as_of(hist, 4).collect()}
    assert state == {"a": 11.0}
    # at lsn=2: a@v1, b@v1
    state2 = {r.k: r.v for r in as_of(hist, 2).collect()}
    assert state2 == {"a": 10.0, "b": 20.0}


def test_as_of_latest_equals_lww_current(spark, changelog):
    """as_of(max lsn) == the LWW current snapshot (sink semantics)."""
    hist = scd2_history(changelog, ["k"], "lsn", op_col="op")
    state = {r.k: (r.valid_from, r.v) for r in as_of(hist, 10_000).collect()}
    # LWW oracle: last event per key, deletes drop the key
    cp = changelog.toPandas()
    lww = {
        k: (lsn, v)
        for k, lsn, v in duckdb.sql(
            "SELECT k, lsn, v FROM (SELECT *, row_number() OVER "
            "(PARTITION BY k ORDER BY lsn DESC) rn FROM cp) "
            "WHERE rn = 1 AND op <> 'd'"
        ).fetchall()
    }
    assert state == lww


def test_scd2_without_op_col(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0)], "k string, lsn long, v double"
    )
    out = sorted(
        (r.version, r.valid_from, r.valid_to)
        for r in scd2_history(df, ["k"], "lsn").collect()
    )
    assert out == [(1, 1, 2), (2, 2, None)]


def test_scd2_plan_single_exchange(spark, changelog):
    plan = (
        scd2_history(changelog, ["k"], "lsn", op_col="op")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # lead/row_number/filter all ride ONE hash exchange + one sort
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan
