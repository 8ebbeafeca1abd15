"""Kafka source seam (sources/kafka_source.py): option wiring, frame
normalization and properties parsing are pinned WITHOUT a broker —
the sandbox has no spark-sql-kafka jar, so ``kafka_stream`` itself is
class-probe-gated exactly like spark-avro/Iceberg (reference runs
inside Kafka Connect: IntegrationTest.java:72-155 is broker-backed)."""

from __future__ import annotations

import types

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.sources import kafka_source as ks
from transforms_for_apache_kafka_connect_spark.sources import (
    kafka_options_from_properties,
    kafka_reader_options,
    normalize_kafka_frame,
)


# ----------------------------------------------------------- option wiring

def test_reader_options_exact_map():
    opts = kafka_reader_options(
        bootstrap_servers="b1:9092,b2:9092",
        subscribe="repos.changes",
        starting_offsets="latest",
        max_offsets_per_trigger=250_000,
        fail_on_data_loss=False,
        options={"kafka.security.protocol": "SASL_SSL"},
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "repos.changes",
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": "250000",
        "failOnDataLoss": "false",
        "includeHeaders": "true",
        "kafka.security.protocol": "SASL_SSL",
    }


def test_reader_options_subscription_exclusivity():
    with pytest.raises(ValueError, match="exactly one"):
        kafka_reader_options(bootstrap_servers="b:9092")
    with pytest.raises(ValueError, match="exactly one"):
        kafka_reader_options(
            bootstrap_servers="b:9092", subscribe="t",
            subscribe_pattern="t.*",
        )


def test_reader_options_batch_bounds():
    opts = kafka_reader_options(
        bootstrap_servers="b:9092",
        assign='{"t": [0, 1]}',
        starting_offsets='{"t": {"0": 5}}',
        ending_offsets='{"t": {"0": 100}}',
    )
    assert opts["assign"] == '{"t": [0, 1]}'
    assert opts["endingOffsets"] == '{"t": {"0": 100}}'


# ----------------------------------------------------- frame normalization

def _kafka_shaped(spark):
    """A static frame with the exact schema the Kafka source emits."""
    return spark.createDataFrame(
        [
            (
                "repos.changes", 0, bytearray(b"k1"), bytearray(b"v1"),
                7, "2024-05-01 00:00:01", 0,
                [("trace", bytearray(b"abc"))],
            ),
            (
                "repos.changes", 1, None, bytearray(b"v2"),
                9, "2024-05-01 00:00:02", 0, None,
            ),
        ],
        "topic string, partition int, key binary, value binary, "
        "offset long, timestamp string, timestampType int, "
        "headers array<struct<key:string,value:binary>>",
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))


def test_normalize_kafka_frame_contract(spark):
    out = normalize_kafka_frame(_kafka_shaped(spark))
    assert out.columns == [
        "topic", "partition", "key", "value", "timestamp", "headers",
        "offset",
    ]
    rows = {r["offset"]: r for r in out.collect()}
    assert rows[7]["timestamp"] == 1714521601000  # epoch millis
    assert rows[7]["headers"] == {"trace": "abc"}
    assert bytes(rows[7]["value"]) == b"v1"
    assert rows[9]["key"] is None and rows[9]["headers"] is None
    # offset IS the LSN: per-partition monotone, untouched by the map
    assert sorted(rows) == [7, 9]


def test_normalized_frame_feeds_the_json_boundary(spark):
    """The normalized frame drives the same converter boundary as the
    parquet-dump path — offset rides through as the LSN."""
    from transforms_for_apache_kafka_connect_spark.streaming.engine import (
        prepare_stream_events,
    )

    raw = _kafka_shaped(spark).withColumn(
        "key", F.to_json(F.struct(F.col("offset").alias("id"))).cast("binary")
    ).withColumn(
        "value",
        F.to_json(
            F.struct(F.col("offset").alias("id"), F.lit("u").alias("op"))
        ).cast("binary"),
    )
    env = prepare_stream_events(
        normalize_kafka_frame(raw),
        raw_format="json",
        key_schema="id long",
        value_schema="id long, op string",
    )
    got = {r["key"]["id"]: r for r in env.collect()}
    assert set(got) == {7, 9}
    assert got[7]["value"]["op"] == "u"


# ------------------------------------------------------------- class probe

def test_kafka_stream_gated_when_module_absent(spark, monkeypatch):
    monkeypatch.setattr(ks, "_JVM_KAFKA", None)
    monkeypatch.setattr(
        ks, "kafka_available", lambda s: False
    )
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        ks.kafka_stream(
            spark, bootstrap_servers="b:9092", subscribe="t"
        )


def test_kafka_stream_wiring_with_mocked_reader(spark, monkeypatch):
    """With the probe forced on and the reader mocked, kafka_stream
    must use format('kafka'), pass the exact option map, and apply the
    normalization to whatever the source loads."""
    monkeypatch.setattr(ks, "kafka_available", lambda s: True)
    seen = {}

    class FakeReader:
        def format(self, f):
            seen["format"] = f
            return self

        def options(self, **kw):
            seen["options"] = kw
            return self

        def load(self):
            return _kafka_shaped(spark)

    fake_spark = types.SimpleNamespace(
        read=FakeReader(), readStream=FakeReader()
    )
    out = ks.kafka_stream(
        fake_spark,
        bootstrap_servers="b:9092",
        subscribe="repos.changes",
        max_offsets_per_trigger=1000,
    )
    assert seen["format"] == "kafka"
    assert seen["options"]["subscribe"] == "repos.changes"
    assert seen["options"]["maxOffsetsPerTrigger"] == "1000"
    assert seen["options"]["includeHeaders"] == "true"
    assert out.columns[-1] == "offset"
    assert out.count() == 2


# ----------------------------------------------------- properties parsing

def test_kafka_options_from_properties_full():
    props = """
name=repos-cdc
transforms=route
transforms.route.type=io.aiven.kafka.connect.transforms.ExtractTopic$Value
transforms.route.field.name=repo
source.kafka.bootstrap.servers=b1:9092,b2:9092
source.kafka.topics=repos.changes,repos.meta
source.kafka.starting.offsets=earliest
source.kafka.max.offsets.per.trigger=500000
source.kafka.fail.on.data.loss=false
source.kafka.option.kafka.security.protocol=SASL_SSL
"""
    kw = kafka_options_from_properties(props)
    assert kw == {
        "bootstrap_servers": "b1:9092,b2:9092",
        "subscribe": "repos.changes,repos.meta",
        "starting_offsets": "earliest",
        "max_offsets_per_trigger": 500000,
        "fail_on_data_loss": False,
        "options": {"kafka.security.protocol": "SASL_SSL"},
    }
    # and the same file still compiles its transform chain
    from transforms_for_apache_kafka_connect_spark.plans.properties import (
        chain_from_properties,
    )

    assert chain_from_properties(props) is not None


def test_kafka_options_absent_falls_back_empty():
    assert kafka_options_from_properties("name=x\ntransforms=") == {}


def test_kafka_properties_drive_the_gated_path(spark, monkeypatch):
    """End-to-end seam: a properties file opting into the live topic
    parses into kwargs that drive kafka_stream's wiring (reader
    mocked; the real path differs only in the jar being present)."""
    monkeypatch.setattr(ks, "kafka_available", lambda s: True)
    seen = {}

    class FakeReader:
        def format(self, f):
            seen["format"] = f
            return self

        def options(self, **kw):
            seen["options"] = kw
            return self

        def load(self):
            return _kafka_shaped(spark)

    fake_spark = types.SimpleNamespace(
        read=FakeReader(), readStream=FakeReader()
    )
    kw = kafka_options_from_properties(
        "source.kafka.bootstrap.servers=b:9092\n"
        "source.kafka.topic.pattern=repos\\..*\n"
    )
    out = ks.kafka_stream(fake_spark, **kw)
    assert seen["options"]["subscribePattern"] == "repos..*"
    assert out.count() == 2


def test_kafka_stream_batch_mode_uses_bounded_reader(spark, monkeypatch):
    """batch=True goes through spark.read (bounded backfill) with
    endingOffsets wired; streaming mode must NOT accept endingOffsets
    implicitly (it simply forwards what was given)."""
    monkeypatch.setattr(ks, "kafka_available", lambda s: True)
    seen = {}

    class FakeReader:
        def __init__(self, name):
            self.name = name

        def format(self, f):
            seen["which"] = self.name
            seen["format"] = f
            return self

        def options(self, **kw):
            seen["options"] = kw
            return self

        def load(self):
            return _kafka_shaped(spark)

    fake_spark = types.SimpleNamespace(
        read=FakeReader("read"), readStream=FakeReader("readStream")
    )
    out = ks.kafka_stream(
        fake_spark,
        bootstrap_servers="b:9092",
        assign='{"t": [0]}',
        starting_offsets='{"t": {"0": 0}}',
        ending_offsets='{"t": {"0": 100}}',
        batch=True,
    )
    assert seen["which"] == "read"
    assert seen["options"]["endingOffsets"] == '{"t": {"0": 100}}'
    assert out.count() == 2


def test_duplicate_header_keys_fold_last_wins(spark):
    """Kafka headers are an ordered multiset — duplicate keys are
    legal (per-hop trace/retry headers); the normalization must fold
    them last-wins instead of letting map_from_entries raise
    DUPLICATED_MAP_KEY and kill the stream on a poison record."""
    df = spark.createDataFrame(
        [(
            "t", 0, None, bytearray(b"v"), 1, "2024-05-01 00:00:01", 0,
            [("retry", bytearray(b"1")), ("trace", bytearray(b"x")),
             ("retry", bytearray(b"2"))],
        )],
        "topic string, partition int, key binary, value binary, "
        "offset long, timestamp string, timestampType int, "
        "headers array<struct<key:string,value:binary>>",
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    row = normalize_kafka_frame(df).first()
    assert row["headers"] == {"retry": "2", "trace": "x"}
