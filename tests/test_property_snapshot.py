"""Property law (hypothesis) for the incremental snapshot: for ANY
change-op sequence and ANY freshness-valid interleaving of hash chunks
with live batches, the table converges to the dict-replay source state.

The chunk schedule is derived from the generated sequence: the stream
is cut at generated positions, and after each cut one hash chunk (round
robin over ``n_chunks``) is read at exactly the applied position — the
freshness precondition the module enforces, and the way a real driver
operates (chunk reads are live)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.streaming import (
    IncrementalSnapshot,
    LakeTable,
    Replayer,
    hash_chunk,
)
from tests.test_snapshot import _ENV_T

ops_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),                      # key
        st.sampled_from(["u", "u", "d"]),       # op (updates dominate)
        st.sampled_from(["a", "b", "c"]),       # val
    ),
    min_size=1,
    max_size=18,
)
cuts_strategy = st.lists(st.integers(1, 18), min_size=1, max_size=3)


def _env(spark, ops):
    rows = []
    for i, (k, op, val) in enumerate(ops):
        lsn = i + 1
        after = None if op == "d" else (k, val)
        rows.append(("t", 0, (k,), (op, lsn, 0, None, after), lsn, None))
    return spark.createDataFrame(rows, _ENV_T)


def _oracle(ops, pos):
    st_ = {}
    for i, (k, op, val) in enumerate(ops):
        if i + 1 > pos:
            break
        if op == "d":
            st_.pop(k, None)
        else:
            st_[k] = val
    return st_


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_strategy, cuts=cuts_strategy)
def test_any_schedule_converges(spark, tmp_path_factory, ops, cuts):
    tmp = tmp_path_factory.mktemp("snapprop")
    n = len(ops)
    positions = sorted({min(c, n) for c in cuts})
    table = LakeTable(
        str(tmp / "t"), key_cols=["k"], n_buckets=2,
        merge_strategy="broadcast", changelog=True, discovery=False,
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e")
    snap = IncrementalSnapshot(replayer=rep)
    env = _env(spark, ops)
    n_chunks = 2
    lo = 0
    for i, pos in enumerate(positions):
        rep.apply_batch(
            env.filter((F.col("timestamp") > lo) & (F.col("timestamp") <= pos)),
            i,
        )
        lo = pos
        # live chunk read at exactly the applied position
        src = spark.createDataFrame(
            list(_oracle(ops, pos).items()) or [], "k long, val string"
        )
        snap.apply_chunk(
            hash_chunk(src, ["k"], n_chunks, i % n_chunks),
            chunk_id=i, low_lsn=pos,
        )
    if lo < n:
        rep.apply_batch(
            env.filter((F.col("timestamp") > lo) & (F.col("timestamp") <= n)),
            len(positions),
        )
    got = {r["k"]: r["val"] for r in table.read(spark).collect()}
    want = _oracle(ops, n)
    # keys never offered to any chunk AND never streamed alive can't
    # exist; everything streamed or chunked must match exactly
    assert got == want
