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


# ------------------------------------------------ maintained (SCD2Table)

from pyspark.sql import types as T  # noqa: E402

from transforms_for_apache_kafka_connect_spark.plans.chain import Chain  # noqa: E402
from transforms_for_apache_kafka_connect_spark.streaming import (  # noqa: E402
    LakeTable,
    Replayer,
    SCD2Table,
)

_VT = T.StructType([T.StructField("v", T.DoubleType())])
_ET = T.StructType([
    T.StructField("topic", T.StringType(), False),
    T.StructField("partition", T.IntegerType(), False),
    T.StructField("key", T.StructType([T.StructField("k", T.StringType())])),
    T.StructField("value", T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("before", _VT),
        T.StructField("after", _VT),
    ])),
    T.StructField("timestamp", T.LongType()),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
])


def _senv(spark, events):
    """events: (lsn, key, op, v) -> CDC envelope frame."""
    return spark.createDataFrame(
        [
            ("t", 0, (k,), (op, lsn, 0, None,
                            None if op == "d" else (v,)), lsn, None)
            for lsn, k, op, v in events
        ],
        _ET,
    )


_SCD_EVENTS = [
    # batch 0 (lsn 0-9)
    (1, "a", "u", 10.0), (2, "b", "u", 20.0), (3, "a", "u", 11.0),
    # batch 1 (lsn 10-19): a updated, b deleted, c born
    (11, "a", "u", 12.0), (12, "b", "d", None), (13, "c", "u", 30.0),
    # batch 2 (lsn 20-29): b reborn, c updated twice (intra-batch LWW)
    (21, "b", "u", 25.0), (22, "c", "u", 31.0), (23, "c", "u", 32.0),
]


@pytest.fixture()
def maintained(spark, tmp_path):
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    scd2 = SCD2Table(root=str(tmp_path / "scd2"), key_cols=["k"],
                     n_buckets=4)
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=[scd2])
    rep.replay(_senv(spark, _SCD_EVENTS), batch_width=10, start_pos=0,
               max_pos=30)
    return table, scd2, rep


def _hist_rows(df):
    return sorted(
        (r["k"], r["valid_from"], r["valid_to"], r["is_current"], r["v"])
        for r in df.collect()
    )


def test_scd2_table_matches_batch_build_over_changelog(spark, maintained):
    """Parity law: the maintained history == scd2_history over the full
    netted changelog (same grain), intervals/payload/is_current."""
    table, scd2, _ = maintained
    changes = table.read_changelog(spark).filter(
        F.col("_change_type") != "update_preimage"
    ).select(
        "k",
        F.when(F.col("_change_type") == "delete", F.lit("d"))
        .otherwise(F.lit("u")).alias("op"),
        "v",
        F.col("_change_lsn").alias("lsn"),
    )
    want = _hist_rows(
        scd2_history(changes, ["k"], "lsn", op_col="op").drop("version")
    )
    got = _hist_rows(scd2.read(spark, table))
    assert got == want and len(got) > 0


def test_scd2_table_intervals(spark, maintained):
    table, scd2, _ = maintained
    got = _hist_rows(scd2.read(spark, table))
    assert got == sorted([
        # a: batch-0 nets to lsn 3 (intra-batch LWW), closed at 11
        ("a", 3, 11, False, 11.0),
        ("a", 11, None, True, 12.0),
        # b: born 2, deleted 12 (closed), reborn 21 (open)
        ("b", 2, 12, False, 20.0),
        ("b", 21, None, True, 25.0),
        # c: born 13, batch-2 nets to 23
        ("c", 13, 23, False, 30.0),
        ("c", 23, None, True, 32.0),
    ])


def test_scd2_table_as_of_matches_lww_prefix(spark, maintained):
    """as_of over the maintained history at a commit boundary equals
    the base table's file-level time travel."""
    from transforms_for_apache_kafka_connect_spark.streaming import as_of

    table, scd2, _ = maintained
    hist = scd2.read(spark, table)
    got = sorted(
        (r["k"], r["v"]) for r in as_of(hist, 19).collect()
    )
    want = sorted(
        (r["k"], r["v"])
        for r in table.read(spark, version=2).select("k", "v").collect()
    )
    assert got == want and len(got) > 0


def test_scd2_table_exactly_once(spark, maintained):
    table, scd2, rep = maintained
    before = _hist_rows(scd2.read(spark, table))
    rep.replay(_senv(spark, _SCD_EVENTS), batch_width=10, start_pos=0,
               max_pos=30)
    assert _hist_rows(scd2.read(spark, table)) == before


def test_scd2_table_with_versions_dense(spark, maintained):
    table, scd2, _ = maintained
    got = {
        (r["k"], r["valid_from"]): r["version"]
        for r in scd2.read(spark, table, with_versions=True).collect()
    }
    # dense per-key ordinals over surviving versions (b's delete gap
    # does NOT consume an ordinal — documented divergence from
    # scd2_history's event-count numbering)
    assert got == {
        ("a", 3): 1, ("a", 11): 2,
        ("b", 2): 1, ("b", 21): 2,
        ("c", 13): 1, ("c", 23): 2,
    }


def test_scd2_table_pure_insert_batch_is_ledgered(spark, tmp_path):
    """A batch with no retractions appends nothing but still commits a
    ledger entry (exactly-once shape for empty maintenance)."""
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    scd2 = SCD2Table(root=str(tmp_path / "scd2"), key_cols=["k"])
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   maintain=[scd2])
    rep.replay(_senv(spark, [(1, "a", "u", 1.0), (2, "b", "u", 2.0)]),
               batch_width=10, start_pos=0, max_pos=10)
    hist = scd2.read(spark, table)
    assert _hist_rows(hist) == [
        ("a", 1, None, True, 1.0), ("b", 2, None, True, 2.0),
    ]
    assert scd2.table.committed("e", 0)


def test_scd2_table_rejects_empty_keys(tmp_path):
    with pytest.raises(ValueError, match="key_cols"):
        SCD2Table(root=str(tmp_path / "x"), key_cols=[])
