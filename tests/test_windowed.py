"""Event-time windowed aggregation (streaming/windowed.py): batch ==
streaming parity, tolerated-late-data updates, watermark drops of
too-late events, exactly-once landing in a LakeTable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.sources import change_stream
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    stream_windowed_into,
    windowed_aggregate,
)

BASE = 1_600_000_000_000


def test_batch_windowed_aggregate_matches_sql(spark):
    events = change_stream(spark, 2_000, n_repos=10, paths_per_repo=4)
    out = windowed_aggregate(
        events, window_duration="1 second", group_cols=["value.op"]
    )
    got = {
        (r["window_start_ms"], r["op"]): r["n_events"] for r in out.collect()
    }
    oracle = {
        (r["w"], r["op"]): r["n"]
        for r in events.select(
            (F.floor(F.col("timestamp") / 1000) * 1000).alias("w"),
            F.col("value.op").alias("op"),
        )
        .groupBy("w", "op")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == oracle
    # window bounds are coherent
    assert all(
        r["window_end_ms"] - r["window_start_ms"] == 1000
        for r in out.collect()
    )


def test_sliding_windows_cover_each_event_twice(spark):
    events = change_stream(spark, 500, n_repos=5, paths_per_repo=3)
    tumb = windowed_aggregate(events, window_duration="2 seconds")
    slide = windowed_aggregate(
        events, window_duration="2 seconds", slide="1 second"
    )
    n = events.count()
    assert sum(r["n_events"] for r in tumb.collect()) == n
    # every event lands in exactly 2 sliding windows
    assert sum(r["n_events"] for r in slide.collect()) == 2 * n


def _envelope(spark, rows):
    """rows: (repo, lsn, ts_ms) -> minimal envelope"""
    df = spark.createDataFrame(rows, "repo string, lsn long, ts long")
    return df.select(
        F.lit("t").alias("topic"),
        F.lit(0).cast("int").alias("partition"),
        F.struct(F.col("repo")).alias("key"),
        F.struct(
            F.lit("u").alias("op"), F.col("lsn").alias("lsn"),
            F.col("ts").alias("ts_ms"),
        ).alias("value"),
        F.col("ts").alias("timestamp"),
        F.lit(None).cast("map<string,string>").alias("headers"),
    )


def test_streaming_windows_land_exactly_once_with_late_data(spark, tmp_path):
    """Four micro-batches in file order: (1) fills two windows,
    (2) advances event time far AND carries one tolerated-late event,
    (3) a spacer — Spark folds a batch's event-time stats into the
    watermark one batch later, so the advance from (2) takes effect
    in (4) — then (4) carries an event LATER than the watermark,
    dropped by the state store. The landed table must show the late
    update applied and the too-late event ignored."""
    src = str(tmp_path / "stream_src")
    w0, w1 = BASE, BASE + 10_000  # two 10s windows
    far = BASE + 200_000  # advances the watermark well past w0/w1

    # micro-batch 1: 3 events in w0, 2 in w1. coalesce(1): exactly ONE
    # file per logical batch so maxFilesPerTrigger=1 gives a
    # deterministic trigger sequence (multiple part files would split a
    # batch across triggers and race the watermark)
    _envelope(spark, [("a", 1, w0 + 1_000), ("b", 2, w0 + 2_000),
                      ("c", 3, w0 + 3_000), ("d", 4, w1 + 1_000),
                      ("e", 5, w1 + 2_000)]).coalesce(1).write.parquet(f"{src}/b0")
    # micro-batch 2: watermark mover + ONE tolerated late event into w1
    # (current watermark derives from batch 1's max ET minus the 30s
    # tolerance — far behind w1, so this late event still updates w1)
    _envelope(spark, [("f", 6, far), ("g", 7, w1 + 5_000)]).coalesce(1)\
        .write.parquet(f"{src}/b1")
    # micro-batch 3: spacer — lets the far-jump from batch 2 reach the
    # watermark (measured: batch N's stats affect batch N+2's filter)
    _envelope(spark, [("s", 10, far + 5_000)]).coalesce(1)\
        .write.parquet(f"{src}/b2")
    # micro-batch 4: watermark is now (far - 30s) >> w0's end: an event
    # for w0 is TOO late and must be dropped by the state store
    _envelope(spark, [("h", 8, w0 + 4_000), ("i", 9, far + 6_000)])\
        .coalesce(1).write.parquet(f"{src}/b3")

    schema = spark.read.parquet(f"{src}/b0").schema
    table = LakeTable(
        str(tmp_path / "wins"), key_cols=["window_start_ms"], n_buckets=2
    )
    # one file per trigger, file-name order = b0, b1, b2
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    q = stream_windowed_into(
        table, stream, str(tmp_path / "ckpt"),
        window_duration="10 seconds", watermark="30 seconds",
        available_now=True,
    )
    q.awaitTermination(300)
    q.stop()

    got = {r["window_start_ms"]: r["n_events"]
           for r in table.read(spark).collect()}
    assert got[w0] == 3          # the too-late event was dropped
    assert got[w1] == 3          # the tolerated late event WAS applied
    # far, far+5s, far+6s share one 10s window
    assert got[far // 10_000 * 10_000] == 3

    # exactly-once: re-running the drained stream is a ledger no-op
    q2 = stream_windowed_into(
        table,
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*"),
        str(tmp_path / "ckpt"),  # same checkpoint: nothing new to read
        window_duration="10 seconds", watermark="30 seconds",
        available_now=True,
    )
    q2.awaitTermination(300)
    q2.stop()
    again = {r["window_start_ms"]: r["n_events"]
             for r in table.read(spark).collect()}
    assert again == got


def test_streaming_batch_parity_when_nothing_is_late(spark, tmp_path):
    """With no late data, the streamed windowed table equals the batch
    aggregate of the same events — the batch call is the oracle."""
    events = change_stream(spark, 1_500, n_repos=8, paths_per_repo=3)
    src = str(tmp_path / "src")
    events.write.parquet(src)
    table = LakeTable(
        str(tmp_path / "wins"),
        key_cols=["window_start_ms", "op"], n_buckets=2,
    )
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", 2).parquet(src)
    q = stream_windowed_into(
        table, stream, str(tmp_path / "ckpt"),
        window_duration="1 second", watermark="1 hour",
        group_cols=["value.op"], available_now=True,
    )
    q.awaitTermination(300)
    q.stop()
    got = {
        (r["window_start_ms"], r["op"]): r["n_events"]
        for r in table.read(spark).collect()
    }
    oracle = {
        (r["window_start_ms"], r["op"]): r["n_events"]
        for r in windowed_aggregate(
            events, window_duration="1 second", group_cols=["value.op"]
        ).collect()
    }
    assert got == oracle


def test_batch_session_windows_match_islands_oracle(spark):
    """Session windows (gap 5s) on a hand-built stream: the classic
    gaps-and-islands computation is the oracle — a new session starts
    when the gap to the previous event of the group exceeds 5s; the
    session runs first-event .. last-event + gap."""
    rows = [
        # group a: two sessions — {0s,3s,6s} then {20s,24s}
        ("a", 1, BASE), ("a", 2, BASE + 3_000), ("a", 3, BASE + 6_000),
        ("a", 4, BASE + 20_000), ("a", 5, BASE + 24_000),
        # group b: one session with exactly-gap spacing (5s edges chain)
        ("b", 6, BASE + 1_000), ("b", 7, BASE + 6_000),
        # group c: single event
        ("c", 8, BASE + 40_000),
    ]
    out = windowed_aggregate(
        _envelope(spark, rows), session_gap="5 seconds",
        group_cols=["key.repo"],
    )
    got = {
        (r["repo"], r["window_start_ms"], r["window_end_ms"]): r["n_events"]
        for r in out.collect()
    }
    assert got == {
        ("a", BASE, BASE + 11_000): 3,
        ("a", BASE + 20_000, BASE + 29_000): 2,
        ("b", BASE + 1_000, BASE + 11_000): 2,
        ("c", BASE + 40_000, BASE + 45_000): 1,
    }


def test_streamed_sessions_merge_before_landing(spark, tmp_path):
    """Cross-trigger session merge under append emission: trigger 1
    holds two open sessions for one group, trigger 2's bridging event
    merges them IN STATE, and only the merged session lands — once the
    watermark (advanced by the flush trigger, effective one trigger
    later) passes its end. Nothing stale ever reaches the table; the
    landed row equals the batch aggregate."""
    src = str(tmp_path / "src")
    far = BASE + 600_000
    t1 = [("a", 1, BASE), ("a", 2, BASE + 2_000),
          ("a", 3, BASE + 20_000), ("a", 4, BASE + 22_000)]
    t2 = [("a", 5, BASE + 10_000)]  # bridges the two (gap 10s)
    _envelope(spark, t1).coalesce(1).write.parquet(f"{src}/b0")
    _envelope(spark, t2).coalesce(1).write.parquet(f"{src}/b1")
    # flush: advances the watermark far past the merged session's end
    _envelope(spark, [("z", 6, far)]).coalesce(1).write.parquet(f"{src}/b2")
    # spacer: batch N's event-time stats reach the watermark filter at
    # batch N+2 (same propagation as the tumbling late-data test above)
    _envelope(spark, [("z", 7, far + 1_000)]).coalesce(1)\
        .write.parquet(f"{src}/b3")
    schema = spark.read.parquet(f"{src}/b0").schema
    table = LakeTable(
        str(tmp_path / "sess"),
        key_cols=["window_start_ms", "repo"], n_buckets=2,
    )
    q = stream_windowed_into(
        table,
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*"),
        str(tmp_path / "ckpt"),
        session_gap="10 seconds", watermark="30 seconds",
        group_cols=["key.repo"], available_now=True,
    )
    q.awaitTermination(300)
    q.stop()
    got = {
        (r["repo"], r["window_start_ms"], r["window_end_ms"]): r["n_events"]
        for r in table.read(spark).collect()
    }
    # exactly the merged session [BASE, BASE+32s) with all 5 events —
    # never the two pre-merge sessions; the flush group's session is
    # still open (watermark hasn't passed it) so it has NOT landed
    assert got == {("a", BASE, BASE + 32_000): 5}
    oracle = {
        (r["repo"], r["window_start_ms"], r["window_end_ms"]): r["n_events"]
        for r in windowed_aggregate(
            _envelope(spark, t1 + t2), session_gap="10 seconds",
            group_cols=["key.repo"],
        ).collect()
    }
    assert got == oracle


def test_streamed_sessions_parity_after_flush(spark, tmp_path):
    """Streamed session table == batch session aggregate over the same
    events, once a flush trigger finalizes them (append emission lands
    a session only after the watermark passes its end)."""
    events = change_stream(spark, 800, n_repos=6, paths_per_repo=3)
    max_ts = events.agg(F.max("timestamp")).first()[0]
    far = max_ts + 3_600_000
    src = str(tmp_path / "src")
    events.coalesce(2).write.parquet(f"{src}/b0")
    # flush + spacer rows share the events schema (same source), just
    # pushed far into the future so their own sessions never finalize
    events.limit(1).withColumn("timestamp", F.lit(far)).coalesce(1)\
        .write.parquet(f"{src}/b1")
    events.limit(1).withColumn("timestamp", F.lit(far + 1_000)).coalesce(1)\
        .write.parquet(f"{src}/b2")
    table = LakeTable(
        str(tmp_path / "sess"),
        key_cols=["window_start_ms", "op"], n_buckets=2,
    )
    q = stream_windowed_into(
        table,
        spark.readStream.schema(spark.read.parquet(f"{src}/b0").schema)
        .option("maxFilesPerTrigger", 1).parquet(f"{src}/b*"),
        str(tmp_path / "ckpt"),
        session_gap="1 second", watermark="30 seconds",
        group_cols=["value.op"], available_now=True,
    )
    q.awaitTermination(300)
    q.stop()
    got = {
        (r["window_start_ms"], r["window_end_ms"], r["op"]): r["n_events"]
        for r in table.read(spark).collect()
        if r["window_start_ms"] < far  # exclude the flush group's rows
    }
    oracle = {
        (r["window_start_ms"], r["window_end_ms"], r["op"]): r["n_events"]
        for r in windowed_aggregate(
            events, session_gap="1 second", group_cols=["value.op"]
        ).collect()
    }
    assert got == oracle


def test_windowed_validation_errors(spark, tmp_path):
    events = change_stream(spark, 100, n_repos=4, paths_per_repo=2)
    with pytest.raises(ValueError, match="collide"):
        windowed_aggregate(events, group_cols=["key.repo", "value.after.repo"])
    with pytest.raises(ValueError, match="reserved"):
        windowed_aggregate(events, group_cols=["value.window_start_ms"])
    # mis-keyed sink table refused at start() time, not silently lossy
    table = LakeTable(str(tmp_path / "t"), key_cols=["window_start_ms"],
                      n_buckets=2)
    stream = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="aggregation grain"):
        stream_windowed_into(
            table, stream, str(tmp_path / "ck"),
            group_cols=["value.op"], available_now=True,
        )
