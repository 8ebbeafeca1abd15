"""JsonConverter boundary (reference IntegrationTest.java:172-173):
raw JSON bytes -> typed envelope -> chain/engine, and the serialize
direction back. Includes the end-to-end raw-bytes streaming path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.errors import DataException
from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.record import ERROR_COL, enforce
from transforms_for_apache_kafka_connect_spark.sources import (
    change_stream,
    envelope_from_json,
    envelope_to_json,
    infer_json_schema,
    repositories_snapshot,
)
from transforms_for_apache_kafka_connect_spark.streaming import LakeTable, Replayer

BASE = 1_600_000_000_000


def test_roundtrip_envelope_to_json_and_back(spark):
    n = 500
    events = change_stream(spark, n, n_repos=10, paths_per_repo=4)
    raw = envelope_to_json(events, as_binary=True)
    assert dict(raw.dtypes)["value"] == "binary"
    back = envelope_from_json(
        raw,
        key_schema=events.schema["key"].dataType,
        value_schema=events.schema["value"].dataType,
    )
    assert back.filter(F.col(ERROR_COL).isNotNull()).count() == 0
    back = enforce(back)
    a = events.drop("headers")
    b = back.select(*a.columns)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # tombstones survive the round trip as null values, not errors
    n_tomb = events.filter(F.col("value").isNull()).count()
    assert back.filter(F.col("value").isNull()).count() == n_tomb
    assert n_tomb > 0


def test_malformed_json_sets_reference_error(spark):
    raw = spark.createDataFrame(
        [("k1", '{"a": 1}'), ("k2", "{not json"), ("k3", None)],
        "key string, value string",
    )
    env = envelope_from_json(raw, value_schema="a int")
    errs = env.filter(F.col(ERROR_COL).isNotNull()).collect()
    assert len(errs) == 1
    assert errs[0][ERROR_COL].startswith(
        "Converting byte[] to Kafka Connect data failed due to "
        "serialization error: "
    )
    # null value is a tombstone, never an error
    assert env.filter(F.col("value").isNull()).count() == 2  # k2 parse-null + k3
    with pytest.raises(DataException, match="serialization error"):
        enforce(env)


def test_malformed_key_sets_error(spark):
    raw = spark.createDataFrame(
        [('{"id": 1}', '{"a": 1}'), ("oops", '{"a": 2}')],
        "key string, value string",
    )
    env = envelope_from_json(raw, key_schema="id long", value_schema="a int")
    errs = env.filter(F.col(ERROR_COL).isNotNull()).collect()
    assert len(errs) == 1
    # the error quotes the OFFENDING document (the key), not the value
    assert "oops" in errs[0][ERROR_COL]
    assert '{"a": 2}' not in errs[0][ERROR_COL]


def test_schema_inference_batch(spark):
    raw = spark.createDataFrame(
        [('{"a": 1, "b": "x"}',), ('{"a": 2, "b": "y", "c": 1.5}',), (None,)],
        "value string",
    )
    schema = infer_json_schema(raw)
    assert {f.name for f in schema.fields} == {"a", "b", "c"}
    env = envelope_from_json(raw)  # inference fallback path
    assert env.filter(F.col("value.a") == 2).count() == 1


def test_defaults_for_missing_envelope_columns(spark):
    raw = spark.createDataFrame([('{"a": 1}',)], "value string")
    env = envelope_from_json(raw, value_schema="a int")
    row = env.first()
    assert row["topic"] == "json_topic" and row["partition"] == 0
    assert row["key"] is None and row["timestamp"] is None


def test_raw_json_stream_end_to_end(spark, tmp_path):
    # raw bytes on disk -> readStream -> JsonConverter boundary -> chain
    # -> LWW -> merge: the first thing a user tailing a real topic does
    n = 2_000
    events = change_stream(spark, n, n_repos=20, paths_per_repo=5)
    raw = envelope_to_json(events, as_binary=True)
    src = str(tmp_path / "raw")
    raw.write.parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    table = LakeTable(str(tmp_path / "t"), n_buckets=8)
    rep = Replayer(
        table=table,
        chain=Chain([{"type": "tombstone_handler", "behavior": "drop_silent"}]),
        epoch="e1",
    )
    q = rep.stream(
        stream,
        str(tmp_path / "ckpt"),
        available_now=True,
        raw_json=True,
        key_schema=events.schema["key"].dataType,
        value_schema=events.schema["value"].dataType,
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


def test_raw_json_stream_requires_schema(spark, tmp_path):
    table = LakeTable(str(tmp_path / "t"), n_buckets=4)
    rep = Replayer(table=table, chain=Chain([]), epoch="e1")
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="value_schema"):
        rep.stream(df, str(tmp_path / "ckpt"), raw_json=True)
