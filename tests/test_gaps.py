"""Sequence-continuity laws (streaming/gaps.py): lost / duplicated /
out-of-order change-event detection, stateless and tracked."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    SequenceTracker,
    sequence_gaps,
)

_ENV_T = T.StructType([
    T.StructField("topic", T.StringType(), False),
    T.StructField("partition", T.IntegerType(), False),
    T.StructField("key", T.StructType([T.StructField("k", T.StringType())])),
    T.StructField("value", T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
    ])),
    T.StructField("timestamp", T.LongType()),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
])


def _env(spark, seqs_by_part):
    """seqs_by_part: {(topic, partition): [lsn, ...]}"""
    rows = []
    for (t, p), seqs in seqs_by_part.items():
        for s in seqs:
            rows.append((t, p, ("k",), ("u", s), s, None))
    return spark.createDataFrame(rows, _ENV_T)


def _rep(df):
    return {
        (r["topic"], r["partition"], r["kind"], r["gap_from"],
         r["gap_to"], r["missing"])
        for r in df.collect()
    }


def test_clean_batch_reports_nothing(spark):
    env = _env(spark, {("t", 0): [1, 2, 3, 4], ("t", 1): [10, 11]})
    assert sequence_gaps(env).count() == 0


def test_intra_batch_gaps_and_duplicates(spark):
    env = _env(spark, {
        ("t", 0): [1, 2, 5, 6, 6, 9],     # hole 3-4, dup 6, hole 7-8
        ("t", 1): [100],
    })
    assert _rep(sequence_gaps(env)) == {
        ("t", 0, "gap", 3, 4, 2),
        ("t", 0, "duplicate", 6, 6, 0),
        ("t", 0, "gap", 7, 8, 2),
    }


def test_monotonic_mode_ignores_holes(spark):
    env = _env(spark, {("t", 0): [1, 50, 50, 900]})  # LSNs are sparse
    assert _rep(sequence_gaps(env, mode="monotonic")) == {
        ("t", 0, "duplicate", 50, 50, 0),
    }


def test_head_gap_and_rewind_against_state(spark):
    env = _env(spark, {("t", 0): [7, 8], ("t", 1): [3, 4], ("t", 2): [1]})
    st = spark.createDataFrame(
        [("t", 0, 4), ("t", 1, 3)],
        "topic string, partition int, last_seq long",
    )
    got = _rep(sequence_gaps(env, start_after=st))
    assert got == {
        ("t", 0, "head_gap", 5, 6, 2),   # resumes above last+1
        ("t", 1, "rewind", 3, 3, 0),     # re-delivers the tracked seq
        # partition 2 is new: no head check
    }


def test_bad_inputs(spark):
    env = _env(spark, {("t", 0): [1]})
    with pytest.raises(ValueError, match="mode"):
        sequence_gaps(env, mode="exact")
    with pytest.raises(ValueError, match="integral"):
        sequence_gaps(env, seq="value.op")


def test_tracker_advances_and_replays_exactly_once(spark, tmp_path):
    t = LakeTable(str(tmp_path / "s"), key_cols=["topic", "partition"],
                  n_buckets=2, discovery=False, merge_strategy="broadcast")
    tr = SequenceTracker(table=t)
    b0 = _env(spark, {("t", 0): [1, 2, 3], ("t", 1): [1]})
    assert tr.check(spark, b0, batch_id=0).count() == 0
    st = {(r["topic"], r["partition"]): r["last_seq"]
          for r in t.read(spark).collect()}
    assert st == {("t", 0): 3, ("t", 1): 1}
    # contiguous continuation on p0; head gap on p1
    b1 = _env(spark, {("t", 0): [4, 5], ("t", 1): [4]})
    assert _rep(tr.check(spark, b1, batch_id=1)) == {
        ("t", 1, "head_gap", 2, 3, 2),
    }
    st = {(r["topic"], r["partition"]): r["last_seq"]
          for r in t.read(spark).collect()}
    assert st == {("t", 0): 5, ("t", 1): 4}
    # replaying batch 1 (crash/resume): report recomputes against the
    # ALREADY-advanced state (a rewind — expected on replay), but the
    # ledger makes the advance a no-op: state unchanged
    rep = tr.check(spark, b1, batch_id=1)
    assert {r["kind"] for r in rep.collect()} == {"rewind"}
    assert {(r["topic"], r["partition"]): r["last_seq"]
            for r in t.read(spark).collect()} == st


def test_tracker_rewound_batch_never_lowers_watermark(spark, tmp_path):
    t = LakeTable(str(tmp_path / "s"), key_cols=["topic", "partition"],
                  n_buckets=2, discovery=False, merge_strategy="broadcast")
    tr = SequenceTracker(table=t, mode="monotonic")
    tr.check(spark, _env(spark, {("t", 0): [10, 11, 12]}), batch_id=0)
    rep = tr.check(spark, _env(spark, {("t", 0): [5, 6]}), batch_id=1)
    assert {r["kind"] for r in rep.collect()} == {"rewind"}
    assert t.read(spark).first()["last_seq"] == 12


def test_tracker_key_validation(tmp_path):
    t = LakeTable(str(tmp_path / "s"), key_cols=["topic"], n_buckets=2,
                  discovery=False)
    with pytest.raises(ValueError, match="keyed by the group columns"):
        SequenceTracker(table=t)


def test_gap_plan_single_exchange(spark, tmp_path):
    # parquet-backed input: a createDataFrame source scans through a
    # Python RDD and would false-positive the no-Python check
    _env(spark, {("t", 0): [1, 2, 5], ("t", 1): [1]}).write.parquet(
        str(tmp_path / "env")
    )
    env = spark.read.parquet(str(tmp_path / "env"))
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sequence_gaps(env).explain("formatted")
    p = buf.getvalue()
    assert "Python" not in p
    # the window pass + head aggregates reuse ONE hash partitioning of
    # the envelope; union legs don't add exchanges over the data
    import re

    assert len(re.findall(r"Exchange hashpartitioning", p)) <= 1, p
