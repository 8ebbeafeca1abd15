"""Physical topic routing: SMT chain rewrites `topic`, route_write
lands each record under its topic directory (reference entry point B —
IntegrationTest.java:174-183 asserts per-topic delivery)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import Chain, envelope
from transforms_for_apache_kafka_connect_spark.streaming import route_write


def test_route_write_fans_out_by_topic(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, ["click", "view", "purchase"][i % 3], float(i)) for i in range(99)],
        "event_id long, event_type string, amount double",
    )
    env = envelope(df, key_cols=["event_id"], value_cols=["event_type", "amount"])
    chain = Chain([
        {"type": "extract_topic", "field.name": "event_type"},
        {"type": "regex_router", "regex": "purchase", "replacement": "orders"},
    ])
    routed = chain.run(env)
    root = str(tmp_path / "topics")
    topics = route_write(routed, root)
    assert topics == ["click", "orders", "view"]
    for t, n in [("click", 33), ("orders", 33), ("view", 33)]:
        part = os.path.join(root, f"topic={t}")
        assert os.path.isdir(part)
        got = spark.read.parquet(part)
        assert got.count() == n
        # flattened value fields present per-topic
        assert {"event_type", "amount", "timestamp"} <= set(got.columns)
    # append mode: a second batch lands in the same directories
    route_write(routed, root)
    assert spark.read.parquet(os.path.join(root, "topic=click")).count() == 66


def test_route_write_value_field_colliding_with_envelope(spark, tmp_path):
    # a value struct field named topic/timestamp/key must not produce a
    # duplicate column after flattening — it gets a value_ prefix
    df = spark.createDataFrame(
        [(1, "t_a", "inner_topic", 7), (2, "t_b", "inner2", 8)],
        "id long, route string, topic string, timestamp long",
    )
    env = envelope(df, key_cols=["id"], value_cols=["route", "topic", "timestamp"])
    routed = Chain([{"type": "extract_topic", "field.name": "route"}]).run(env)
    root = str(tmp_path / "topics")
    topics = route_write(routed, root)
    assert topics == ["t_a", "t_b"]
    got = spark.read.parquet(os.path.join(root, "topic=t_a"))
    assert {"value_topic", "value_timestamp", "route", "timestamp", "key"} <= set(
        got.columns
    )
    assert got.first()["value_topic"] == "inner_topic"


def test_route_write_empty_batch_returns_no_topics(spark, tmp_path):
    df = spark.createDataFrame([], "id long, route string")
    env = envelope(df, key_cols=["id"], value_cols=["route"])
    routed = Chain([{"type": "extract_topic", "field.name": "route"}]).run(env)
    assert route_write(routed, str(tmp_path / "topics")) == []
