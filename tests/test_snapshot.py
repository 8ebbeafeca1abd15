"""Incremental (chunked) snapshot laws (streaming/snapshot.py): the
DBLog-shaped bootstrap that interleaves with live change events."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.streaming import (
    IncrementalSnapshot,
    LakeTable,
    Replayer,
)

_PAY_T = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("val", T.StringType()),
])
_ENV_T = T.StructType([
    T.StructField("topic", T.StringType(), False),
    T.StructField("partition", T.IntegerType(), False),
    T.StructField("key", T.StructType([T.StructField("k", T.LongType())])),
    T.StructField("value", T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("before", _PAY_T),
        T.StructField("after", _PAY_T),
    ])),
    T.StructField("timestamp", T.LongType()),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
])


def _env(spark, ops):
    """ops: [(lsn, k, op, val)] — the synthetic source's change log."""
    rows = []
    for lsn, k, op, val in ops:
        after = None if op == "d" else (k, val)
        rows.append(("t", 0, (k,), (op, lsn, 0, None, after), lsn, None))
    return spark.createDataFrame(rows, _ENV_T)


def _source_at(ops, pos):
    """Dict-replay oracle: source state after applying ops with
    lsn <= pos."""
    st = {}
    for lsn, k, op, val in sorted(ops):
        if lsn > pos:
            break
        if op == "d":
            st.pop(k, None)
        else:
            st[k] = val
    return st


def _chunk(spark, ops, pos, lo, hi):
    """Source chunk: keys in [lo, hi) as of position ``pos``."""
    st = _source_at(ops, pos)
    rows = [(k, v) for k, v in st.items() if lo <= k < hi]
    return spark.createDataFrame(rows or [], "k long, val string")


def _table_state(spark, table):
    return {r["k"]: r["val"] for r in table.read(spark).collect()}


# the synthetic source: inserts, then concurrent-with-snapshot updates
# and deletes hitting BOTH the already-snapshotted and the
# not-yet-snapshotted key ranges
OPS = (
    [(i, i % 10, "u", f"v{i}") for i in range(1, 11)]        # keys 0..9
    + [(10 + i, 10 + (i % 10), "u", f"w{i}") for i in range(1, 11)]  # 10..19
    + [
        (21, 3, "u", "late3"),     # chunk-0 range, after chunk 0
        (22, 7, "d", None),        # delete in chunk-0 range
        (23, 12, "u", "late12"),   # chunk-1 range, BEFORE chunk 1 read
        (24, 15, "d", None),       # delete in chunk-1 range, before read
        (25, 18, "d", None),       # delete AFTER chunk-1 read position
    ]
)


def _rig(spark, tmp_path, **table_kw):
    table = LakeTable(
        str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
        merge_strategy="broadcast", changelog=True, discovery=False,
        **table_kw,
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e")
    return table, rep, IncrementalSnapshot(replayer=rep)


def _play(rep, spark, lo, hi, batch_id):
    """Apply one stream slice [lo, hi) under an explicit batch id —
    replay() restarts ids at 0 per call, so interleaving chunks between
    replay() calls would collide ledger keys."""
    rep.apply_batch(
        _env(spark, OPS).filter(
            (F.col("timestamp") >= lo) & (F.col("timestamp") < hi)
        ),
        batch_id,
    )


def test_interleaved_chunks_converge_to_source(spark, tmp_path):
    table, rep, snap = _rig(spark, tmp_path)
    # stream batch: lsn 1..10 applied live
    _play(rep, spark, 0, 11, 0)
    # chunk 0 (keys 0..9) read at position 10
    snap.apply_chunk(_chunk(spark, OPS, 10, 0, 10), chunk_id=0, low_lsn=10)
    # stream advances: lsn 11..24 (touches BOTH ranges incl. deletes)
    _play(rep, spark, 11, 25, 1)
    # chunk 1 (keys 10..19) read at position 24 — reflects late12 and
    # the k=15 delete already
    snap.apply_chunk(_chunk(spark, OPS, 24, 10, 20), chunk_id=1, low_lsn=24)
    # stream finishes: lsn 25 (delete AFTER chunk 1's read position)
    _play(rep, spark, 25, 31, 2)
    assert _table_state(spark, table) == _source_at(OPS, 30)
    assert snap.progress() == [0, 1]


def test_stale_chunk_refused(spark, tmp_path):
    # the delete-resurrection race: a chunk read at pos 10 still
    # CONTAINS k=7 (deleted at lsn 22) and the stale k=3 (updated at
    # 21). Worse, an insert+delete collapsing inside ONE applied batch
    # leaves NO changelog trace, so no exclusion could save a stale
    # chunk — the engine must refuse it loudly (DBLog's chunk reads
    # are live; staleness never arises in the real protocol)
    table, rep, snap = _rig(spark, tmp_path)
    _play(rep, spark, 0, 25, 0)
    stale = _chunk(spark, OPS, 10, 0, 10)
    assert {r["k"] for r in stale.collect()} >= {3, 7}
    before = _table_state(spark, table)
    with pytest.raises(ValueError, match="stale chunk"):
        snap.apply_chunk(stale, chunk_id=0, low_lsn=10)
    assert _table_state(spark, table) == before
    # a chunk AT the applied position is fine (boundary: >=)
    snap.apply_chunk(
        _chunk(spark, OPS, 24, 0, 10), chunk_id=0, low_lsn=24
    )
    assert _table_state(spark, table) == _source_at(OPS, 24)


def test_resume_is_ledger_noop(spark, tmp_path):
    table, rep, snap = _rig(spark, tmp_path)
    _play(rep, spark, 0, 11, 0)
    snap.apply_chunk(_chunk(spark, OPS, 10, 0, 10), chunk_id=0, low_lsn=10)
    before = _table_state(spark, table)
    v = table.manifest()["version"]
    r = snap.apply_chunk(_chunk(spark, OPS, 10, 0, 10), chunk_id=0, low_lsn=10)
    assert r.get("skipped")
    assert _table_state(spark, table) == before
    assert table.manifest()["version"] == v


def test_chunk_and_stream_ledgers_are_independent(spark, tmp_path):
    # chunk_id 0 must not collide with stream batch_id 0
    table, rep, snap = _rig(spark, tmp_path)
    _play(rep, spark, 0, 11, 0)
    r = snap.apply_chunk(_chunk(spark, OPS, 10, 0, 10), chunk_id=0, low_lsn=10)
    assert not r.get("skipped")
    committed = table.manifest()["committed"]
    assert ["e", 0] in committed and ["e#snap", 0] in committed


def test_maintained_aggregates_fold_chunk_commits(spark, tmp_path):
    from transforms_for_apache_kafka_connect_spark.streaming import (
        MaintainedAggregate,
    )

    agg_t = LakeTable(str(tmp_path / "agg"), key_cols=["val"], n_buckets=2,
                      discovery=False, merge_strategy="broadcast")
    table = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                      merge_strategy="broadcast", changelog=True,
                      discovery=False)
    spec = MaintainedAggregate(table=agg_t, group_cols=["val"])
    rep = Replayer(table=table, chain=Chain([]), epoch="e", maintain=[spec])
    snap = IncrementalSnapshot(replayer=rep)
    _play(rep, spark, 0, 11, 0)
    snap.apply_chunk(_chunk(spark, OPS, 10, 10, 20), chunk_id=0, low_lsn=10)
    want = (
        table.read(spark).groupBy("val").count()
        .withColumnRenamed("count", "n_rows")
    )
    got = agg_t.read(spark).select("val", "n_rows")
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }


def test_refusals(spark, tmp_path):
    plain = LakeTable(str(tmp_path / "p"), key_cols=["k"], n_buckets=2,
                      discovery=False)
    with pytest.raises(ValueError, match="changelog"):
        IncrementalSnapshot(replayer=Replayer(table=plain, chain=Chain([]),
                                              epoch="e"))
    staged = LakeTable(str(tmp_path / "s"), key_cols=["k"], n_buckets=2,
                       discovery=False, changelog=True)
    with pytest.raises(ValueError, match="publish"):
        IncrementalSnapshot(replayer=Replayer(
            table=staged, chain=Chain([]), epoch="e", publish=False))
