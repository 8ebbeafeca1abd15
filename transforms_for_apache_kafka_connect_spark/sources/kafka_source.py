"""Live Kafka topic source (class-probe-gated, like spark-avro and
Iceberg).

The reference library runs INSIDE Kafka Connect, so its deployment
story is "point the connector at a topic" (reference:
src/integration-test/java/io/aiven/kafka/connect/transforms/
IntegrationTest.java:72-155 — every test is broker-backed). This
engine replays parquet dumps of topics in the sandbox, but a
production deployment wants the same live-topic entry: this module
wires ``spark.readStream.format("kafka")`` (the spark-sql-kafka
module every real Spark distribution ships) into the engine's raw
frame contract, gated on a JVM class probe exactly like
``sources/avro_boundary.jvm_avro_available`` — no broker or jar in
this sandbox, so tests pin the option wiring and the frame
normalization on mocked readers/static frames.

Offset -> LSN mapping: the engine's dedupe/merge contract needs a
per-KEY monotone sequence, not a global one. A Kafka topic gives
exactly that under keyed partitioning (the default partitioner pins a
key to one partition, and offsets are monotone within a partition) —
so ``offset`` IS the LSN. Keys spread across partitions (custom
partitioners, repartitioned topics) have no cross-partition order to
recover, same as any Kafka consumer; route such topics through an
upstream sequencer or carry an LSN in the payload and override
``lsn_col``.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "kafka_available",
    "kafka_stream",
    "kafka_reader_options",
    "normalize_kafka_frame",
    "kafka_options_from_properties",
]

_KAFKA_PROVIDER = "org.apache.spark.sql.kafka010.KafkaSourceProvider"

_JVM_KAFKA: bool | None = None


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka module is on the classpath (real
    Spark distributions ship it; the sandbox pip build does not)."""
    global _JVM_KAFKA
    if _JVM_KAFKA is None:
        try:
            spark._jvm.java.lang.Class.forName(_KAFKA_PROVIDER)
            _JVM_KAFKA = True
        except Exception:
            _JVM_KAFKA = False
    return _JVM_KAFKA


def kafka_reader_options(
    *,
    bootstrap_servers: str,
    subscribe: str | None = None,
    subscribe_pattern: str | None = None,
    assign: str | None = None,
    starting_offsets: str = "earliest",
    ending_offsets: str | None = None,
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
    options: Mapping[str, str] | None = None,
) -> dict[str, str]:
    """The exact option map handed to the Kafka reader — factored out
    so tests can pin the wiring without a broker. Exactly one of
    ``subscribe`` (comma-separated topics), ``subscribe_pattern``
    (regex) or ``assign`` (JSON {topic: [partitions]}) must be given
    (the Kafka source's own contract)."""
    chosen = [
        k for k, v in (
            ("subscribe", subscribe),
            ("subscribePattern", subscribe_pattern),
            ("assign", assign),
        ) if v
    ]
    if len(chosen) != 1:
        raise ValueError(
            "exactly one of subscribe / subscribe_pattern / assign is "
            f"required, got {chosen or 'none'}"
        )
    out: dict[str, str] = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
        "includeHeaders": "true",
    }
    if subscribe:
        out["subscribe"] = subscribe
    if subscribe_pattern:
        out["subscribePattern"] = subscribe_pattern
    if assign:
        out["assign"] = assign
    if ending_offsets is not None:
        out["endingOffsets"] = ending_offsets
    if max_offsets_per_trigger is not None:
        out["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    for k, v in (options or {}).items():
        out[k] = v
    return out


def normalize_kafka_frame(df: DataFrame) -> DataFrame:
    """Kafka source schema -> the engine's raw frame contract:
    ``(topic, partition, key, value, timestamp, headers, offset)``
    with ``timestamp`` in epoch millis, ``headers`` a
    ``map<string,string>`` (Connect header values are stringly here —
    binary header payloads cast lossily; carry those in the value),
    and ``offset`` the LSN (see module docstring for why that is
    sound under keyed partitioning). ``key``/``value`` stay BINARY —
    the converter boundary (``prepare_stream_events`` raw_format=
    json/avro/protobuf/maxwell/canal/dms) owns decoding."""
    cols = set(df.columns)
    if "headers" in cols:
        entries = F.transform(
            F.col("headers"),
            lambda h: F.struct(
                h.getField("key").alias("key"),
                h.getField("value").cast("string").alias("value"),
            ),
        )
        # Kafka headers are an ordered MULTISET (duplicate keys are
        # legal and common — per-hop trace/retry headers);
        # map_from_entries raises on duplicates, so fold last-wins
        # first — the same contract as envelope_from_kafka
        # (sources/json_boundary.py)
        deduped = F.filter(
            entries,
            lambda e, i: i
            == F.array_max(
                F.transform(
                    entries,
                    lambda e2, i2: F.when(
                        e2.getField("key") == e.getField("key"), i2
                    ).otherwise(F.lit(-1)),
                )
            ),
        )
        headers = F.when(
            F.col("headers").isNotNull(), F.map_from_entries(deduped)
        ).cast("map<string,string>")
    else:
        headers = F.lit(None).cast("map<string,string>")
    return df.select(
        F.col("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("key"),
        F.col("value"),
        F.unix_millis(F.col("timestamp")).alias("timestamp"),
        headers.alias("headers"),
        F.col("offset").cast("long").alias("offset"),
    )


def kafka_stream(
    spark: SparkSession,
    *,
    bootstrap_servers: str,
    subscribe: str | None = None,
    subscribe_pattern: str | None = None,
    assign: str | None = None,
    starting_offsets: str = "earliest",
    ending_offsets: str | None = None,
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
    options: Mapping[str, str] | None = None,
    batch: bool = False,
) -> DataFrame:
    """A live Kafka topic as the engine's raw frame (streaming by
    default; ``batch=True`` uses the bounded ``spark.read`` source with
    ``ending_offsets`` for backfills). Feed the result to
    ``Replayer.stream`` / ``TopicTableRouter.stream`` with the
    matching ``raw_format``/schemas — the same boundary + ledger
    machinery as the parquet-dump path, only the source differs.

    Raises RuntimeError when the spark-sql-kafka module is absent
    (sandbox builds): the option wiring and frame normalization stay
    unit-testable through ``kafka_reader_options`` /
    ``normalize_kafka_frame`` without a broker.
    """
    if not kafka_available(spark):
        raise RuntimeError(
            "the Kafka source requires the spark-sql-kafka module on "
            f"the classpath ({_KAFKA_PROVIDER}); run with --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>"
        )
    opts = kafka_reader_options(
        bootstrap_servers=bootstrap_servers,
        subscribe=subscribe,
        subscribe_pattern=subscribe_pattern,
        assign=assign,
        starting_offsets=starting_offsets,
        ending_offsets=ending_offsets,
        max_offsets_per_trigger=max_offsets_per_trigger,
        fail_on_data_loss=fail_on_data_loss,
        options=options,
    )
    reader = spark.read if batch else spark.readStream
    raw = reader.format("kafka").options(**opts).load()
    return normalize_kafka_frame(raw)


def kafka_options_from_properties(source) -> dict[str, Any]:
    """``source.kafka.*`` connector-properties keys ->
    :func:`kafka_stream` kwargs (empty dict when no
    ``source.kafka.bootstrap.servers`` is declared — the caller falls
    back to the file source). Engine extension keys:

    * ``source.kafka.bootstrap.servers`` (required to opt in)
    * ``source.kafka.topics`` -> ``subscribe``
    * ``source.kafka.topic.pattern`` -> ``subscribe_pattern``
    * ``source.kafka.assign`` -> ``assign`` (JSON)
    * ``source.kafka.starting.offsets`` / ``.ending.offsets``
    * ``source.kafka.max.offsets.per.trigger`` (int)
    * ``source.kafka.fail.on.data.loss`` (true/false)
    * ``source.kafka.option.<name>`` -> verbatim reader option
      (e.g. ``source.kafka.option.kafka.security.protocol``)
    """
    from transforms_for_apache_kafka_connect_spark.plans.properties import (
        _load_props,
    )

    props = _load_props(source)
    servers = props.get("source.kafka.bootstrap.servers")
    if not servers:
        return {}
    out: dict[str, Any] = {"bootstrap_servers": servers}
    if "source.kafka.topics" in props:
        out["subscribe"] = props["source.kafka.topics"]
    if "source.kafka.topic.pattern" in props:
        out["subscribe_pattern"] = props["source.kafka.topic.pattern"]
    if "source.kafka.assign" in props:
        out["assign"] = props["source.kafka.assign"]
    if "source.kafka.starting.offsets" in props:
        out["starting_offsets"] = props["source.kafka.starting.offsets"]
    if "source.kafka.ending.offsets" in props:
        out["ending_offsets"] = props["source.kafka.ending.offsets"]
    if "source.kafka.max.offsets.per.trigger" in props:
        out["max_offsets_per_trigger"] = int(
            props["source.kafka.max.offsets.per.trigger"]
        )
    if "source.kafka.fail.on.data.loss" in props:
        out["fail_on_data_loss"] = (
            props["source.kafka.fail.on.data.loss"].strip().lower() == "true"
        )
    opt_prefix = "source.kafka.option."
    extra = {
        k[len(opt_prefix):]: v
        for k, v in props.items()
        if k.startswith(opt_prefix)
    }
    if extra:
        out["options"] = extra
    return out
