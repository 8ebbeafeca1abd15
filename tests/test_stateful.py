"""applyInPandasWithState stale-update suppressor: cross-batch state
drops redelivered/late LSNs in a live stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.sources import change_stream
from transforms_for_apache_kafka_connect_spark.streaming.stateful import (
    flatten_for_suppression,
    suppress_stale,
)

BASE = 1_600_000_000_000


def test_suppress_stale_across_microbatches(spark, tmp_path):
    n = 2_000
    events = change_stream(spark, n, n_repos=20, paths_per_repo=5)
    flat = flatten_for_suppression(events)
    src = str(tmp_path / "in")
    # file 1: first half. file 2: second half PLUS a full redelivery of
    # the first half (at-least-once source) — all of file 1 is stale.
    first = flat.filter(F.col("lsn") < n // 2)
    second = flat.filter(F.col("lsn") >= n // 2).unionByName(first)
    first.coalesce(1).write.parquet(src + "/f1.parquet")
    second.coalesce(1).write.parquet(src + "/f2.parquet")

    out_dir = str(tmp_path / "out")
    stream = spark.readStream.schema(flat.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    q = (
        suppress_stale(stream, state_timeout_ms=0)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    got = spark.read.parquet(out_dir)
    # stateful LWW: per key, at most one row per micro-batch, strictly
    # increasing LSNs (redelivered first-half rows suppressed by state),
    # and the final winner equals the true per-key max
    assert got.groupBy("k", "lsn").count().filter("count > 1").count() == 0
    true_max = flat.groupBy("k").agg(F.max("lsn").alias("m"))
    got_max = got.groupBy("k").agg(F.max("lsn").alias("g"))
    joined = true_max.join(got_max, "k", "full_outer")
    assert joined.filter("m IS NULL OR g IS NULL OR m != g").count() == 0


def test_suppress_stale_envelope_end_to_end(spark, tmp_path):
    # full engine path: file stream with an at-least-once style FULL
    # redelivery of the first half inside the second micro-batch ->
    # suppress_stale_ms drops the stale rows via managed state -> chain
    # -> LWW -> merge; final table equals the clean-stream oracle
    from transforms_for_apache_kafka_connect_spark import Chain
    from transforms_for_apache_kafka_connect_spark.sources import (
        repositories_snapshot,
    )
    from transforms_for_apache_kafka_connect_spark.streaming import (
        LakeTable,
        Replayer,
    )

    n = 2_000
    events = change_stream(spark, n, n_repos=20, paths_per_repo=5)
    mid = BASE + n // 2
    src = str(tmp_path / "env")
    first = events.filter(F.col("timestamp") < mid)
    second = events.filter(F.col("timestamp") >= mid).unionByName(first)
    first.coalesce(1).write.parquet(src + "/f1.parquet")
    second.coalesce(1).write.parquet(src + "/f2.parquet")

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    table = LakeTable(str(tmp_path / "t"), n_buckets=8)
    rep = Replayer(table=table, chain=Chain([]), epoch="e1")
    q = rep.stream(
        stream, str(tmp_path / "ckpt"), available_now=True,
        suppress_stale_ms=0,
    )
    q.awaitTermination(300)
    q.stop()

    oracle = repositories_snapshot(spark, events)
    final = table.read(spark)
    assert final.count() == oracle.count()
    cmp = final.select("repo", "path", "content").join(
        oracle.select("repo", "path", F.col("content").alias("c2")),
        ["repo", "path"],
        "full_outer",
    )
    assert cmp.filter("content IS NULL OR c2 IS NULL OR content != c2").count() == 0


def test_flatten_handles_scalar_key(spark):
    # raw_json streams without key_schema carry a plain string key;
    # to_json rejects scalars, so flatten must fall back to a cast
    from transforms_for_apache_kafka_connect_spark.streaming.stateful import (
        flatten_for_suppression,
    )

    env = spark.createDataFrame(
        [("t", 0, "k1", ("c", 1, 1, "p"), 1, None)],
        "topic string, partition int, key string, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,content:string>, "
        "timestamp long, headers map<string,string>",
    )
    row = flatten_for_suppression(env).first()
    assert row["k"] == "k1" and row["lsn"] == 1


def test_suppressor_timeout_removes_state():
    # timeout invocation (no input, hasTimedOut=True) must REMOVE the
    # key's state and emit nothing — not fall through to update +
    # setTimeoutDuration, which would re-arm the timer forever and grow
    # state without bound (the documented bounding behavior)
    from transforms_for_apache_kafka_connect_spark.streaming.stateful import (
        _make_suppress,
    )

    class FakeState:
        hasTimedOut = True
        exists = True
        get = (41,)

        def __init__(self):
            self.removed = False
            self.updated = None
            self.timeout_set = None

        def remove(self):
            self.removed = True

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            self.timeout_set = ms

    state = FakeState()
    out = list(_make_suppress(1000)(("k1",), iter([]), state))
    assert out == []
    assert state.removed
    assert state.updated is None and state.timeout_set is None


def test_suppressor_drops_stale_within_batch(spark, tmp_path):
    # single micro-batch containing both a fresh and an already-seen lsn
    # per key: only lsn-monotone survivors remain per key
    rows = [("a", 5, 0, "u", "p5"), ("a", 3, 0, "u", "p3"), ("b", 1, 0, "c", "q1")]
    df = spark.createDataFrame(
        rows, "k string, lsn bigint, ts_ms bigint, op string, payload string"
    )
    src = str(tmp_path / "in2")
    df.coalesce(1).write.parquet(src + "/f.parquet")
    stream = spark.readStream.schema(df.schema).parquet(src + "/*")
    out_dir = str(tmp_path / "out2")
    q = (
        suppress_stale(stream, state_timeout_ms=0)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {(r["k"], r["lsn"]) for r in spark.read.parquet(out_dir).collect()}
    # within one pandas group the rows arrive in input order; (a,5) sets
    # the watermark so (a,3) is stale
    assert ("b", 1) in got and ("a", 5) in got
    assert ("a", 3) not in got


# --------------------------------------------- streaming sessionization


def test_sessionize_stream_matches_batch_build(spark, tmp_path):
    """Parity law: on a per-key time-ordered stream, streaming labels
    (managed state across micro-batches) equal the batch sessionize's
    exactly — including sessions that SPAN micro-batch boundaries."""
    import time as _time

    from transforms_for_apache_kafka_connect_spark.functions import sessionize
    from transforms_for_apache_kafka_connect_spark.streaming.stateful import (
        sessionize_stream,
    )

    GAP = 10_000
    rows = []
    ev = 0
    for u in ("u1", "u2"):
        t = 0
        for i in range(30):
            # gaps straddle the boundary: some sessions continue across
            # the file split below
            t += (1_000, 4_000, 11_000)[i % 3]
            ev += 1
            rows.append((u, t, ev))
    df = spark.createDataFrame(rows, "user string, t long, ev long")
    src = str(tmp_path / "in")
    # three time-ordered files -> three source-ordered micro-batches
    for lo, hi in ((0, 34_000), (34_001, 90_000), (90_001, 10**9)):
        df.filter((F.col("t") >= lo) & (F.col("t") <= hi)) \
            .coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)
    stream = spark.readStream.schema(df.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out_dir = str(tmp_path / "out")
    q = (
        sessionize_stream(
            stream, group_cols=["user"], time_col="t", gap=GAP,
            order_cols=["ev"],
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    got = {
        (r["user"], r["ev"]): (r["session_index"], r["session_start_ms"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["user"], r["ev"]): (r["session_index"], r["session_start_ms"])
        for r in sessionize(
            df, group_cols=["user"], time_col="t", gap=GAP,
            order_cols=["ev"],
        ).collect()
    }
    assert got == want and len(got) == 60
    # the cross-batch state carry was genuinely exercised: at least one
    # session contains events on BOTH sides of the first file split
    # (t <= 34000 and t > 34000 — the split lands INSIDE the
    # {33000, 37000} session)
    t_of = {(r[0], r[2]): r[1] for r in rows}
    by_sess = {}
    for (u, ev_), (idx, _s) in got.items():
        by_sess.setdefault((u, idx), []).append(t_of[(u, ev_)])
    spanning = [
        k for k, ts in by_sess.items()
        if min(ts) <= 34_000 < max(ts)
    ]
    assert spanning, "no session spanned the micro-batch boundary"


def test_sessionize_stream_validation(spark):
    from transforms_for_apache_kafka_connect_spark.streaming.stateful import (
        sessionize_stream,
    )

    df = spark.readStream.format("rate").load()  # timestamp + value
    with pytest.raises(ValueError, match="group_cols"):
        sessionize_stream(df, group_cols=[], time_col="value", gap=10)
    with pytest.raises(ValueError, match="positive"):
        sessionize_stream(df, group_cols=["value"], time_col="value", gap=0)
    with pytest.raises(TypeError, match="epoch-ms"):
        sessionize_stream(df, group_cols=["value"], time_col="timestamp",
                          gap=10)


def test_sessionize_stream_null_times_pass_through(spark, tmp_path):
    """Review regression: a NULL time value must come back with NULL
    session labels (batch-sessionize parity), not crash the query via
    the int cast."""
    from transforms_for_apache_kafka_connect_spark.streaming.stateful import (
        sessionize_stream,
    )

    df = spark.createDataFrame(
        [("a", None, 1), ("a", 5_000, 2), ("a", 6_000, 3)],
        "user string, t long, ev long",
    )
    src = str(tmp_path / "in")
    df.coalesce(1).write.parquet(src)
    out_dir = str(tmp_path / "out")
    q = (
        sessionize_stream(
            spark.readStream.schema(df.schema).parquet(src),
            group_cols=["user"], time_col="t", gap=10_000,
            order_cols=["ev"],
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    rows = {r["ev"]: r for r in spark.read.parquet(out_dir).collect()}
    assert len(rows) == 3
    assert rows[1]["session_index"] is None
    assert rows[1]["session_start_ms"] is None
    assert rows[2]["session_index"] == 0 and rows[2]["session_start_ms"] == 5_000
    assert rows[3]["session_index"] == 0
