"""envelope_from_kafka: the exact Spark Kafka-source schema (binary
key/value, headers array<struct<key,value:binary>>, timestamp, offset)
into the engine envelope."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.errors import DataException
from transforms_for_apache_kafka_connect_spark.record import enforce
from transforms_for_apache_kafka_connect_spark.sources import (
    envelope_from_kafka,
)

KAFKA_SCHEMA = T.StructType([
    T.StructField("key", T.BinaryType(), True),
    T.StructField("value", T.BinaryType(), True),
    T.StructField("topic", T.StringType(), True),
    T.StructField("partition", T.IntegerType(), True),
    T.StructField("offset", T.LongType(), True),
    T.StructField("timestamp", T.TimestampType(), True),
    T.StructField("timestampType", T.IntegerType(), True),
    T.StructField(
        "headers",
        T.ArrayType(T.StructType([
            T.StructField("key", T.StringType(), True),
            T.StructField("value", T.BinaryType(), True),
        ])),
        True,
    ),
])


def _kafka_df(spark, rows):
    return spark.createDataFrame(rows, KAFKA_SCHEMA)


def _row(key, value, offset, headers=None, topic="t0"):
    import datetime

    ts = datetime.datetime(2024, 5, 1, 12, 0, 0, tzinfo=datetime.timezone.utc)
    return (
        key.encode() if key is not None else None,
        value.encode() if value is not None else None,
        topic, 0, offset, ts, 0,
        [(k, v.encode()) for k, v in headers] if headers is not None else None,
    )


def test_kafka_json_parse_and_envelope_slots(spark):
    df = _kafka_df(spark, [
        _row('{"id": 7}', '{"name": "x", "n": 3}', 100,
             headers=[("trace", "abc")]),
    ])
    env = enforce(envelope_from_kafka(
        df,
        key_schema="id bigint",
        value_schema="name string, n bigint",
    ))
    r = env.first()
    assert r["key"]["id"] == 7 and r["value"]["name"] == "x"
    assert r["topic"] == "t0" and r["partition"] == 0
    assert r["timestamp"] == 1714564800000  # epoch ms of the fixture ts
    assert r["headers"] == {"trace": "abc"}
    assert r["offset"] == 100  # survives as the per-partition LSN


def test_kafka_duplicate_headers_last_wins(spark):
    df = _kafka_df(spark, [
        _row(None, '{"a": 1}', 1,
             headers=[("h", "v1"), ("x", "y"), ("h", "v2")]),
    ])
    env = enforce(envelope_from_kafka(df, value_schema="a bigint"))
    assert env.first()["headers"] == {"h": "v2", "x": "y"}


def test_kafka_tombstone_and_corrupt(spark):
    df = _kafka_df(spark, [
        _row('{"id": 1}', None, 1),  # tombstone
    ])
    env = enforce(envelope_from_kafka(
        df, key_schema="id bigint", value_schema="a bigint"
    ))
    assert env.first()["value"] is None

    bad = _kafka_df(spark, [_row(None, "{nope", 2)])
    with pytest.raises(DataException, match="serialization error"):
        enforce(envelope_from_kafka(bad, value_schema="a bigint"))


def test_kafka_raw_passthrough_mode(spark):
    df = _kafka_df(spark, [_row("k1", "plain text", 5)])
    env = enforce(envelope_from_kafka(df, parse_json=False))
    r = env.first()
    assert r["key"] == "k1" and r["value"] == "plain text"
    assert r["offset"] == 5


def test_kafka_chain_end_to_end_with_offset_lww(spark):
    # two versions of key 1 (offsets 10 < 20): chain runs on the
    # envelope; offset orders LWW downstream
    df = _kafka_df(spark, [
        _row('{"id": 1}', '{"v": "old"}', 10),
        _row('{"id": 1}', '{"v": "new"}', 20),
        _row('{"id": 2}', '{"v": "only"}', 11),
    ])
    env = enforce(envelope_from_kafka(
        df, key_schema="id bigint", value_schema="v string"
    ))
    chain = Chain([
        {"type": "case_transform", "field.names": ["v"], "case": "upper"},
    ])
    out = chain.run(env)
    winners = (
        out.groupBy("key.id")
        .agg(F.max_by(F.col("value.v"), F.col("offset")).alias("v"))
        .orderBy("id")
        .collect()
    )
    assert [(r["id"], r["v"]) for r in winners] == [(1, "NEW"), (2, "ONLY")]
