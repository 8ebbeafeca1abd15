"""Stream-stream interval join (streaming/streamjoin.py): batch ==
streaming parity, watermark state eviction, outer-join flush
semantics, collision suffixing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.streaming import interval_join

BASE = 1_600_000_000_000
MIN = 60_000


def _clicks(spark):
    rows = [
        # (user, click_id, ts)
        (1, 10, BASE),
        (1, 11, BASE + 5 * MIN),
        (2, 20, BASE + 1 * MIN),
        (3, 30, BASE + 2 * MIN),
    ]
    return spark.createDataFrame(rows, "user long, click_id long, timestamp long")


def _buys(spark):
    rows = [
        # user 1 buys 3 min after first click (matches click 10 only)
        (1, 100, BASE + 3 * MIN),
        # user 1 buys again 6 min in (matches clicks 10 @+6 NO (>5), 11 @+1 YES)
        (1, 101, BASE + 6 * MIN),
        # user 2 buys 10 min after click -> outside band
        (2, 200, BASE + 11 * MIN),
        # user 4 buys with no click at all
        (4, 400, BASE + 2 * MIN),
    ]
    return spark.createDataFrame(rows, "user long, buy_id long, timestamp long")


EXPECTED_INNER = {(1, 10, 100), (1, 11, 101)}


def test_batch_inner_matches_plain_join(spark):
    out = interval_join(
        _clicks(spark), _buys(spark), keys=["user"],
        lower_ms=0, upper_ms=5 * MIN,
    )
    got = {(r["user"], r["click_id"], r["buy_id"]) for r in out.collect()}
    assert got == EXPECTED_INNER
    # collision suffix on the non-key timestamp column
    assert "timestamp" in out.columns and "timestamp_r" in out.columns


def test_batch_left_outer_and_backward_band(spark):
    out = interval_join(
        _clicks(spark), _buys(spark), keys=["user"],
        lower_ms=0, upper_ms=5 * MIN, how="left",
    )
    rows = out.collect()
    # every click appears; unmatched ones carry null buy_id
    assert {r["click_id"] for r in rows} == {10, 11, 20, 30}
    assert {r["click_id"] for r in rows if r["buy_id"] is None} == {20, 30}
    # backward band from the BUY side finds the same pairs mirrored
    back = interval_join(
        _buys(spark), _clicks(spark), keys=["user"],
        lower_ms=-5 * MIN, upper_ms=0,
    )
    got = {(r["user"], r["click_id"], r["buy_id"]) for r in back.collect()}
    assert got == EXPECTED_INNER


def test_self_join_same_lineage(spark):
    """Attribution within ONE stream: both sides derived from the same
    frame must resolve (internal aliases), and a row joins itself at
    lag 0 plus every in-band successor."""
    ev = _clicks(spark)
    out = interval_join(
        ev, ev.withColumnRenamed("click_id", "next_id"),
        keys=["user"], lower_ms=0, upper_ms=5 * MIN,
    )
    got = {(r["click_id"], r["next_id"]) for r in out.collect()}
    assert got == {(10, 10), (10, 11), (11, 11), (20, 20), (30, 30)}


def test_empty_interval_and_bad_how_rejected(spark):
    with pytest.raises(ValueError, match="empty interval"):
        interval_join(
            _clicks(spark), _buys(spark), keys=["user"],
            lower_ms=10, upper_ms=0,
        )
    with pytest.raises(ValueError, match="how"):
        interval_join(
            _clicks(spark), _buys(spark), keys=["user"],
            lower_ms=0, upper_ms=1, how="cross",
        )


def _stream(spark, src, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_streaming_inner_parity_with_batch(spark, tmp_path):
    clicks, buys = _clicks(spark), _buys(spark)
    csrc, bsrc = str(tmp_path / "c"), str(tmp_path / "b")
    clicks.repartition(2).write.parquet(csrc)
    buys.repartition(2).write.parquet(bsrc)

    out = interval_join(
        _stream(spark, csrc, clicks.schema),
        _stream(spark, bsrc, buys.schema),
        keys=["user"], lower_ms=0, upper_ms=5 * MIN,
        left_watermark="1 minute", right_watermark="1 minute",
    )
    sink = str(tmp_path / "out")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    q.stop()
    got = {
        (r["user"], r["click_id"], r["buy_id"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == EXPECTED_INNER
    # the streaming plan ran a stateful symmetric hash join: every
    # completed trigger reports exactly one state operator
    progress = [p for p in q.recentProgress if p["stateOperators"]]
    assert progress, "no stateful operator in any trigger progress"
    assert all(
        op["operatorName"] == "symmetricHashJoin"
        for p in progress
        for op in p["stateOperators"]
    )


def test_streaming_drops_input_later_than_watermark(spark, tmp_path):
    """File-ordered micro-batches (maxFilesPerTrigger=1): batch 1 seeds
    clicks far in the future (watermark advances), batch written later
    carries a buy OLDER than the advanced watermark minus the band —
    the state store drops it, so it never joins, even though a batch
    join of the same data would match."""
    schema_c = "user long, click_id long, timestamp long"
    schema_b = "user long, buy_id long, timestamp long"
    c1 = spark.createDataFrame(
        [(1, 10, BASE), (1, 11, BASE + 120 * MIN)], schema_c
    )
    csrc, bsrc = str(tmp_path / "c"), str(tmp_path / "b")
    c1.coalesce(1).write.parquet(csrc)
    # buy stream in file-name-ordered one-file micro-batches (the
    # test_windowed pattern): b0 advances the buy-side watermark far
    # ahead, b1 is a spacer (batch N's event-time stats reach the
    # input filter at batch N+2), b2 carries a buy that WOULD match
    # click 10 but is now far older than the global watermark
    spark.createDataFrame([(9, 900, BASE + 120 * MIN)], schema_b)\
        .coalesce(1).write.parquet(f"{bsrc}/b0")
    spark.createDataFrame([(9, 901, BASE + 121 * MIN)], schema_b)\
        .coalesce(1).write.parquet(f"{bsrc}/b1")
    spark.createDataFrame([(1, 100, BASE + 1 * MIN)], schema_b)\
        .coalesce(1).write.parquet(f"{bsrc}/b2")

    b_schema = spark.read.parquet(f"{bsrc}/b0").schema
    out = interval_join(
        _stream(spark, csrc, c1.schema),
        _stream(spark, f"{bsrc}/b*", b_schema),
        keys=["user"], lower_ms=0, upper_ms=5 * MIN,
        left_watermark="1 minute", right_watermark="1 minute",
    )
    sink = str(tmp_path / "out")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    q.stop()
    joined = spark.read.parquet(sink).collect()
    # batch oracle WOULD produce the (10, 100) pair; streaming must not
    batch = interval_join(
        spark.read.parquet(csrc), spark.read.parquet(f"{bsrc}/b*"),
        keys=["user"], lower_ms=0, upper_ms=5 * MIN,
    )
    assert {(r["click_id"], r["buy_id"]) for r in batch.collect()} == {(10, 100)}
    assert joined == []


def test_stream_batch_enrichment_join(spark, tmp_path):
    """One stream + one static frame: the degenerate (and common)
    enrichment shape works through the same entry point."""
    clicks = _clicks(spark)
    csrc = str(tmp_path / "c")
    clicks.write.parquet(csrc)
    out = interval_join(
        _stream(spark, csrc, clicks.schema),
        _buys(spark),
        keys=["user"], lower_ms=0, upper_ms=5 * MIN,
    )
    sink = str(tmp_path / "out")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    q.stop()
    got = {
        (r["user"], r["click_id"], r["buy_id"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == EXPECTED_INNER
