"""asof_join / range_join: semantics vs a DuckDB oracle (ASOF JOIN /
plain inequality join) plus plan-shape assertions — the whole point of
these operators is that the physical plan contains NO nested-loop or
cartesian node."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.functions import asof_join, range_join


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def quotes(spark):
    # (k, t, px): unique per (k, t)
    rows = [
        ("a", 5, 1.0), ("a", 18, 2.0), ("a", 18_000, 3.0),
        ("b", 99, 4.0), ("c", 7, 5.0),
    ]
    return spark.createDataFrame(rows, "k string, t long, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("a", 4, 10.0),   # before any quote -> no backward match
        ("a", 5, 11.0),   # equal timestamp matches (inclusive)
        ("a", 20, 12.0),
        ("a", 19_000, 13.0),
        ("b", 50, 14.0),  # no quote yet
        ("b", 100, 15.0),
        ("d", 1, 16.0),   # key absent from quotes
    ]
    return spark.createDataFrame(rows, "k string, t long, qty double")


def test_asof_backward_matches_duckdb(spark, trades, quotes):
    out = (
        asof_join(trades, quotes, on=["k"], left_time="t", right_time="t")
        .orderBy("k", "t")
        .collect()
    )
    tp, qp = trades.toPandas(), quotes.toPandas()
    oracle = duckdb.sql(
        "SELECT l.k, l.t, l.qty, r.t AS matched_t, r.px "
        "FROM tp l ASOF LEFT JOIN qp r ON l.k = r.k AND l.t >= r.t "
        "ORDER BY l.k, l.t"
    ).fetchall()
    got = [(r.k, r.t, r.qty, r.matched_t, r.px) for r in out]
    assert got == oracle


def test_asof_forward(spark, trades, quotes):
    out = {
        (r.k, r.t): (r.matched_t, r.px)
        for r in asof_join(
            trades, quotes, on=["k"], left_time="t", right_time="t",
            direction="forward",
        ).collect()
    }
    # earliest quote at-or-after each trade
    assert out[("a", 4)] == (5, 1.0)
    assert out[("a", 5)] == (5, 1.0)
    assert out[("a", 20)] == (18_000, 3.0)
    assert out[("a", 19_000)] == (None, None)
    assert out[("b", 50)] == (99, 4.0)
    assert out[("d", 1)] == (None, None)


def test_asof_tolerance_nulls_far_matches(spark, trades, quotes):
    out = {
        (r.k, r.t): (r.matched_t, r.px)
        for r in asof_join(
            trades, quotes, on=["k"], left_time="t", right_time="t",
            tolerance=100,
        ).collect()
    }
    # ("a", 19_000) backward-matches quote at 18_000: distance 1000 > 100
    assert out[("a", 19_000)] == (None, None)
    # near matches survive, row count unchanged (left semantics)
    assert out[("a", 20)] == (18, 2.0)
    assert len(out) == 7


def test_asof_name_collision_gets_suffix(spark, trades, quotes):
    # right payload column named like a left column -> suffixed
    q2 = quotes.withColumnRenamed("px", "qty")
    out = asof_join(trades, q2, on=["k"], left_time="t", right_time="t")
    assert "qty" in out.columns and "qty_right" in out.columns


def test_asof_plan_has_no_join_node(trades, quotes):
    plan = _plan(
        asof_join(trades, quotes, on=["k"], left_time="t", right_time="t")
    )
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan, plan
    # exactly the one hash exchange on the key (plus AQE reads)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_range_join_matches_duckdb(spark):
    pts = spark.createDataFrame(
        [(i, float(i % 37) + 0.5) for i in range(200)], "pid long, x double"
    )
    rng = spark.createDataFrame(
        [(b, b * 5.0, b * 5.0 + 5.0) for b in range(8)]
        + [(100, 2.0, 30.0)],  # one wide overlapping range
        "bin long, lo double, hi double",
    )
    out = sorted(
        (r.pid, r.bin)
        for r in range_join(
            pts, rng, "x", "lo", "hi", bucket_width=5.0
        ).collect()
    )
    pp, rp = pts.toPandas(), rng.toPandas()
    oracle = sorted(
        tuple(t)
        for t in duckdb.sql(
            "SELECT p.pid, r.bin FROM pp p JOIN rp r "
            "ON r.lo <= p.x AND p.x < r.hi"
        ).fetchall()
    )
    assert out == oracle and len(out) > 200  # overlap produced extras


def test_range_join_left_keeps_unmatched(spark):
    pts = spark.createDataFrame([(1, 1.0), (2, 999.0)], "pid long, x double")
    rng = spark.createDataFrame([(7, 0.0, 10.0)], "bin long, lo double, hi double")
    out = {
        r.pid: r.bin
        for r in range_join(
            pts, rng, "x", "lo", "hi", bucket_width=10.0, how="left"
        ).collect()
    }
    assert out == {1: 7, 2: None}


def test_range_join_plan_is_equi_join(spark):
    pts = spark.createDataFrame([(1, 1.0)], "pid long, x double")
    rng = spark.createDataFrame([(7, 0.0, 10.0)], "bin long, lo double, hi double")
    plan = _plan(range_join(pts, rng, "x", "lo", "hi", bucket_width=10.0))
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, plan


def test_range_join_equi_keys(spark):
    pts = spark.createDataFrame(
        [("u1", 3.0), ("u2", 3.0)], "tenant string, x double"
    )
    rng = spark.createDataFrame(
        [("u1", 0.0, 10.0, "r1"), ("u2", 5.0, 10.0, "r2")],
        "tenant string, lo double, hi double, rid string",
    )
    out = [
        (r.tenant, r.rid)
        for r in range_join(
            pts, rng, "x", "lo", "hi", bucket_width=10.0, on=["tenant"]
        ).collect()
    ]
    assert out == [("u1", "r1")]  # u2's 3.0 is outside [5,10)
