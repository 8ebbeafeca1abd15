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


def test_null_seqs_are_ignored(spark):
    # tombstone-style rows (NULL seq) cannot be continuity-checked and
    # must neither crash the window nor fabricate anomalies
    env = spark.createDataFrame(
        [("t", 0, 1), ("t", 0, None), ("t", 0, 2), ("t", 0, 3)],
        "topic string, partition int, lsn long",
    )
    assert sequence_gaps(env, seq="lsn").count() == 0


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


# ------------------------------------------------ Replayer integration

def _cdc_env(spark, seqs, op="u"):
    rows = [("t", 0, ("k%d" % (s % 5),), (op, s, 0, None, ("v%d" % s,)), s, None)
            for s in seqs]
    return spark.createDataFrame(
        rows,
        "topic string, partition int, key struct<k:string>, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,"
        "before:struct<v:string>,after:struct<v:string>>, "
        "timestamp long, headers map<string,string>",
    )


def _tracked_rig(spark, tmp_path, **rep_kw):
    from transforms_for_apache_kafka_connect_spark import Chain
    from transforms_for_apache_kafka_connect_spark.streaming import Replayer

    state = LakeTable(str(tmp_path / "seq"), key_cols=["topic", "partition"],
                      n_buckets=2, discovery=False, merge_strategy="broadcast")
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=2,
                      discovery=False, merge_strategy="broadcast")
    tr = SequenceTracker(table=state, seq="value.lsn")
    rep = Replayer(table=table, chain=Chain([]), epoch="e",
                   track_gaps=tr, **rep_kw)
    return state, table, rep


def test_replayer_gap_error_aborts_precommit(spark, tmp_path):
    from transforms_for_apache_kafka_connect_spark.errors import DataException

    state, table, rep = _tracked_rig(spark, tmp_path)
    rep.apply_batch(_cdc_env(spark, [1, 2, 3]), 0)
    assert table.manifest()["committed"] == [["e", 0]]
    # batch 1 skips lsn 4: policy error -> abort BEFORE the commit,
    # watermark NOT advanced, batch replayable
    with pytest.raises(DataException, match="sequence continuity"):
        rep.apply_batch(_cdc_env(spark, [5, 6]), 1)
    assert ["e", 1] not in table.manifest()["committed"]
    assert state.read(spark).first()["last_seq"] == 3
    # the healed redelivery (4 included) commits and advances
    r = rep.apply_batch(_cdc_env(spark, [4, 5, 6]), 1)
    assert r.get("gap_anomalies") == 0
    assert state.read(spark).first()["last_seq"] == 6


def test_replayer_gap_warn_proceeds_and_reports(spark, tmp_path):
    state, table, rep = _tracked_rig(spark, tmp_path, gaps_policy="warn")
    rep.gaps_report_dir = str(tmp_path / "reports")
    rep.apply_batch(_cdc_env(spark, [1, 2]), 0)
    r = rep.apply_batch(_cdc_env(spark, [5, 5, 6]), 1)  # head gap + dup
    assert r["gap_anomalies"] == 2
    assert ["e", 1] in table.manifest()["committed"]
    rep_rows = spark.read.parquet(
        str(tmp_path / "reports") + "/epoch=e/batch_id=1"
    ).collect()
    assert {x["kind"] for x in rep_rows} == {"head_gap", "duplicate"}
    assert state.read(spark).first()["last_seq"] == 6


def test_replayer_replayed_batch_rechecks_identically(spark, tmp_path):
    # crash AFTER the table commit but BEFORE the watermark advance:
    # the replayed batch lands on the committed-skip path, which must
    # catch the watermark up without re-raising
    state, table, rep = _tracked_rig(spark, tmp_path)
    rep.apply_batch(_cdc_env(spark, [1, 2, 3]), 0)
    # simulate the crash window by advancing the table only
    no_track = rep.track_gaps
    rep.track_gaps = None
    rep.apply_batch(_cdc_env(spark, [4, 5]), 1)
    rep.track_gaps = no_track
    assert state.read(spark).first()["last_seq"] == 3
    r = rep.apply_batch(_cdc_env(spark, [4, 5]), 1)   # replay
    assert r.get("skipped")
    assert state.read(spark).first()["last_seq"] == 5


def test_replayer_gap_refusals(spark, tmp_path):
    from transforms_for_apache_kafka_connect_spark import Chain
    from transforms_for_apache_kafka_connect_spark.streaming import Replayer

    state = LakeTable(str(tmp_path / "seq"), key_cols=["topic", "partition"],
                      n_buckets=2, discovery=False)
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=2,
                      discovery=False)
    tr = SequenceTracker(table=state)
    with pytest.raises(ValueError, match="gaps_policy"):
        Replayer(table=table, chain=Chain([]), epoch="e",
                 track_gaps=tr, gaps_policy="ignore")
    with pytest.raises(ValueError, match="unpublished"):
        Replayer(table=table, chain=Chain([]), epoch="e",
                 track_gaps=tr, publish=False)


def test_router_gap_error_blocks_every_topic(spark, tmp_path):
    from transforms_for_apache_kafka_connect_spark.errors import DataException
    from transforms_for_apache_kafka_connect_spark.streaming import (
        TopicTableRouter,
    )

    state = LakeTable(str(tmp_path / "seq"), key_cols=["topic", "partition"],
                      n_buckets=1, discovery=False, merge_strategy="broadcast")
    tr = SequenceTracker(table=state, seq="value.lsn")
    router = TopicTableRouter(
        root=str(tmp_path / "root"),
        table_opts={"key_cols": ["k"], "n_buckets": 2, "discovery": False,
                    "merge_strategy": "broadcast"},
        track_gaps=tr,
    )
    env = _cdc_env(spark, [1, 2, 3])
    router.apply_batch(env, 0)
    assert state.read(spark).first()["last_seq"] == 3
    # hole: pre-chain check aborts BEFORE any topic slice applies
    with pytest.raises(DataException, match="sequence continuity"):
        router.apply_batch(_cdc_env(spark, [5, 6]), 1)
    assert state.read(spark).first()["last_seq"] == 3
    t = router.table_for("t")
    assert ["default", 1] not in t.manifest()["committed"]
    # healed redelivery commits and advances
    r = router.apply_batch(_cdc_env(spark, [4, 5, 6]), 1)
    assert r["gap_anomalies"] == 0
    assert state.read(spark).first()["last_seq"] == 6
    # replay: tracker ledger already has the batch -> no re-check, no
    # rewind false alarm, state stable
    r2 = router.apply_batch(_cdc_env(spark, [4, 5, 6]), 1)
    assert "gap_anomalies" not in r2
    assert state.read(spark).first()["last_seq"] == 6


def test_router_gap_policy_validation(tmp_path):
    from transforms_for_apache_kafka_connect_spark.streaming import (
        TopicTableRouter,
    )

    with pytest.raises(ValueError, match="gaps_policy"):
        TopicTableRouter(root=str(tmp_path / "r"), gaps_policy="nope")
