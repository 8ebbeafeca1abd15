"""Per-event gap sessionization (functions/temporal.py sessionize):
label laws, F.session_window summary parity, NULL-time handling, and
the single-exchange plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.functions import (
    session_summary,
    sessionize,
)

GAP = 10_000  # 10s


def _df(spark, rows):
    return spark.createDataFrame(rows, "user string, ts long, ev long")


def test_sessionize_basic_labels(spark):
    df = _df(spark, [
        ("a", 0, 1), ("a", 5_000, 2), ("a", 16_000, 3),   # 5s, 11s gaps
        ("a", 26_000, 4),                                  # exactly GAP -> same
        ("a", 36_001, 5),                                  # GAP+1 -> break
        ("b", 100, 6),
    ])
    got = {
        (r["user"], r["ev"]): (r["session_index"], r["session_start_ms"])
        for r in sessionize(
            df, group_cols=["user"], time_col="ts", gap=GAP,
            order_cols=["ev"],
        ).collect()
    }
    assert got == {
        ("a", 1): (0, 0), ("a", 2): (0, 0),
        ("a", 3): (1, 16_000),
        ("a", 4): (1, 16_000),       # ts - prev == gap continues
        ("a", 5): (2, 36_001),       # ts - prev == gap+1 breaks
        ("b", 6): (0, 100),
    }


def test_sessionize_gap_string_and_validation(spark):
    df = _df(spark, [("a", 0, 1), ("a", 59_000, 2), ("a", 125_000, 3)])
    out = sessionize(df, group_cols=["user"], time_col="ts", gap="1 minute")
    assert [r["session_index"] for r in out.orderBy("ev").collect()] == [0, 0, 1]
    with pytest.raises(ValueError, match="group_cols"):
        sessionize(df, group_cols=[], time_col="ts", gap=GAP)
    with pytest.raises(ValueError, match="positive"):
        sessionize(df, group_cols=["user"], time_col="ts", gap=0)
    with pytest.raises(ValueError, match="already exists"):
        sessionize(df.withColumn("session_index", F.lit(1)),
                   group_cols=["user"], time_col="ts", gap=GAP)


def test_sessionize_null_times_pass_through_unlabelled(spark):
    df = spark.createDataFrame(
        [("a", None, 1), ("a", 5, 2), ("a", 6, 3)],
        "user string, ts long, ev long",
    )
    rows = {r["ev"]: r for r in sessionize(
        df, group_cols=["user"], time_col="ts", gap=GAP
    ).collect()}
    assert rows[1]["session_index"] is None
    assert rows[1]["session_start_ms"] is None
    # the NULL row did NOT start a spurious session for the real rows
    assert rows[2]["session_index"] == 0 and rows[2]["session_start_ms"] == 5
    assert rows[3]["session_index"] == 0
    assert len(rows) == 3


def test_session_summary_matches_session_window(spark):
    """Law: summaries derived from per-event labels == the aggregate
    F.session_window produces, row for row (same gap rule, same
    [start, last+gap) envelope)."""
    import random

    rng = random.Random(7)
    rows = []
    ev = 0
    for u in ("u1", "u2", "u3"):
        t = 0
        for _ in range(40):
            t += rng.choice([1_000, 4_000, 9_000, 11_000, 30_000])
            ev += 1
            rows.append((u, t, ev))
    df = _df(spark, rows)
    labelled = sessionize(
        df, group_cols=["user"], time_col="ts", gap=GAP, order_cols=["ev"]
    )
    mine = {
        (r["user"], r["session_start_ms"]): (r["session_end_ms"], r["n_events"], r["s"])
        for r in session_summary(
            labelled, group_cols=["user"], time_col="ts", gap=GAP,
            aggs=[F.sum("ev").alias("s")],
        ).collect()
    }
    ref = (
        df.groupBy(
            "user",
            F.session_window(
                F.timestamp_millis(F.col("ts")), f"{GAP // 1000} seconds"
            ).alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("ev").alias("s"))
        .select(
            "user",
            F.unix_millis("w.start").alias("start_ms"),
            F.unix_millis("w.end").alias("end_ms"),
            "n", "s",
        )
    )
    want = {
        (r["user"], r["start_ms"]): (r["end_ms"], r["n"], r["s"])
        for r in ref.collect()
    }
    assert mine == want and len(mine) > 10


def test_sessionize_partitioning_invariant(spark):
    """Labels don't depend on the input's physical layout."""
    rows = [("a", i * 7_000, i) for i in range(30)] + [
        ("b", i * 12_000, 100 + i) for i in range(30)
    ]
    df = _df(spark, rows)
    a = sessionize(df.repartition(1), group_cols=["user"],
                   time_col="ts", gap=GAP, order_cols=["ev"])
    b = sessionize(df.repartition(16), group_cols=["user"],
                   time_col="ts", gap=GAP, order_cols=["ev"])
    ka = sorted(tuple(r) for r in a.collect())
    kb = sorted(tuple(r) for r in b.collect())
    assert ka == kb


def test_sessionize_plan_single_exchange_no_python(spark):
    df = _df(spark, [("a", 0, 1)])
    out = sessionize(df, group_cols=["user"], time_col="ts", gap=GAP)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # one Window node; no join
    assert plan.count("Window ") <= 2 and "Join" not in plan
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys
    # the labelled side shuffles once on the group key (the NULL-time
    # union leg adds no exchange of its own)
    assert phys.count("Exchange hashpartitioning") <= 1


def test_sessionize_timestamp_type_normalized(spark):
    """Review regression: a TimestampType time column cast to long is
    epoch SECONDS — sessions would only break after >500 days. The
    column must be normalized through unix_millis (13h apart with a
    12h gap = two sessions), and unguessable types must raise."""
    df = spark.createDataFrame(
        [("a", "2026-01-01 00:00:00", 1), ("a", "2026-01-01 13:00:00", 2)],
        "user string, ts string, ev long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sessionize(df, group_cols=["user"], time_col="ts",
                     gap="12 hours", order_cols=["ev"])
    rows = {r["ev"]: r for r in out.collect()}
    assert (rows[1]["session_index"], rows[2]["session_index"]) == (0, 1)
    # start is epoch MILLIS despite the source being a timestamp
    assert rows[1]["session_start_ms"] == 1_767_225_600_000
    from transforms_for_apache_kafka_connect_spark.functions import (
        session_summary,
    )

    summ = session_summary(out, group_cols=["user"], time_col="ts",
                           gap="12 hours")
    ends = sorted(r["session_end_ms"] for r in summ.collect())
    assert ends == [1_767_225_600_000 + 43_200_000,
                    1_767_272_400_000 + 43_200_000]
    with pytest.raises(TypeError, match="epoch-ms"):
        sessionize(df.withColumn("ts", F.col("ts").cast("string")),
                   group_cols=["user"], time_col="ts", gap="12 hours")


def test_sessionize_rejects_reserved_temp_columns(spark):
    df = spark.createDataFrame([("a", 1, 2)], "user string, ts long, __prev long")
    with pytest.raises(ValueError, match="already exists"):
        sessionize(df, group_cols=["user"], time_col="ts", gap=10)
