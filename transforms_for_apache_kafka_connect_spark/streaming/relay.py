"""CDC relay: re-emit a LakeTable's committed changelog as a standard
change-stream envelope — the engine as a CDC *source* (Debezium
analog), closing the loop the reference sits in the middle of.

The reference's SMTs run between a source connector (Debezium tailing
a database) and a sink; this engine already consumes such streams.
``changelog_envelope`` makes any ``changelog=True`` table a *producer*
of the same stream shape: committed row-level changes
(insert / update_preimage / update_postimage / delete, sink.py
``read_changelog``) fold into one event per (key, change LSN) with
Debezium-style ``before``/``after`` images and op ∈ {c, u, d}. The
output is the engine's canonical envelope, so it feeds directly into
another :class:`Replayer` (a downstream lake hop), any SMT chain, or —
via ``publish_changelog`` — a bytes-oriented sink through the
JSON/Avro converter boundaries (the serialize direction of reference
entry point B).

Scale shape: one changelog scan (partition-pruned by epoch/batch_id),
one aggregation keyed on (key, change LSN) whose input is at most two
rows per change (pre+post image) — no joins, no window sorts; images
travel as packed structs.

Exactly-once composition: the changelog only contains COMMITTED
batches (ledger-filtered read), every change carries the LSN of the
source event that produced it, and the downstream consumer's own LWW +
ledger make re-publication idempotent — relaying the same changelog
twice converges to the same state.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: changelog bookkeeping columns that are not row payload
_META_COLS = {"_change_type", "_change_lsn", "epoch", "batch_id"}
#: sink-internal columns that must not leak into relay images: the
#: consumer's updates_for derives ``_lsn`` from the envelope LSN and
#: ``__is_delete`` from op — a shadow copy inside ``after`` would
#: collide downstream
_INTERNAL_COLS = {"_lsn", "_deleted"}


def changelog_envelope(
    table: Any,
    spark: SparkSession,
    *,
    epoch: str | None = None,
    topic: str | None = None,
    observe: Any | None = None,
) -> DataFrame:
    """Committed changelog -> canonical change-stream envelope.

    One output event per (key, change LSN): inserts become op ``c``
    (after image only), update pre+post image pairs fold into op ``u``
    (both images), deletes become op ``d`` (before image only). The
    envelope key is the table key; the envelope/record LSN is the LSN
    of the source event that produced the change, so downstream LWW
    ordering is preserved across relay hops.
    """
    chg = table.read_changelog(spark, epoch=epoch)
    key_cols = list(table.key_cols)
    payload_cols = [
        c
        for c in chg.columns
        if c not in _META_COLS and c not in _INTERNAL_COLS
    ]
    img = F.struct(*[F.col(c) for c in payload_cols])
    is_after = F.col("_change_type").isin("insert", "update_postimage")
    is_before = F.col("_change_type").isin("update_preimage", "delete")
    op_rank = (
        F.when(F.col("_change_type") == "delete", F.lit(2))
        .when(F.col("_change_type") == "insert", F.lit(0))
        .otherwise(F.lit(1))
    )
    grouped = (
        chg.groupBy(*key_cols, "_change_lsn")
        .agg(
            F.first(F.when(is_after, img), ignorenulls=True).alias("after"),
            F.first(F.when(is_before, img), ignorenulls=True).alias("before"),
            F.max(op_rank).alias("__opn"),
        )
    )
    op = (
        F.when(F.col("__opn") == 2, F.lit("d"))
        .when(F.col("__opn") == 0, F.lit("c"))
        .otherwise(F.lit("u"))
    )
    topic_name = topic or os.path.basename(str(table.root).rstrip("/"))
    value = F.struct(
        op.alias("op"),
        F.col("_change_lsn").cast("long").alias("lsn"),
        F.lit(None).cast("long").alias("ts_ms"),
        F.col("before").alias("before"),
        F.col("after").alias("after"),
    )
    out = grouped.select(
        F.lit(topic_name).alias("topic"),
        F.lit(0).cast("int").alias("partition"),
        F.struct(*[F.col(c) for c in key_cols]).alias("key"),
        value.alias("value"),
        F.col("_change_lsn").cast("long").alias("timestamp"),
        F.lit(None).cast("map<string,string>").alias("headers"),
    )
    if observe is not None:
        # per-op emission counters riding the plan (CollectMetrics —
        # zero extra pass), parity with the sink's merge metrics for
        # the publish direction. Pass a ``pyspark.sql.Observation``
        # (its ``.get`` blocks until the first action) or a metric
        # name string (streaming consumers then read each trigger's
        # counts from StreamingQueryProgress.observedMetrics)
        out = out.observe(
            observe,
            F.count(F.lit(1)).alias("n_events"),
            F.count_if(F.col("value.op") == "c").alias("n_creates"),
            F.count_if(F.col("value.op") == "u").alias("n_updates"),
            F.count_if(F.col("value.op") == "d").alias("n_deletes"),
        )
    return out


def publish_changelog(
    table: Any,
    spark: SparkSession,
    *,
    format: str = "json",
    epoch: str | None = None,
    topic: str | None = None,
    confluent_framing: bool = False,
    schema_id: int = 1,
    use_jvm: bool | None = None,
) -> DataFrame:
    """Changelog -> raw converter bytes (topic, partition, key bytes,
    value bytes, timestamp, headers): the serialize direction of the
    converter boundary, ready for a bytes-oriented sink (e.g. a Kafka
    producer writing ``key``/``value`` as-is). ``format`` is ``"json"``
    or ``"avro"`` (writer schemas derived from the envelope's Spark
    types via ``spark_to_avro_schema``; Confluent framing optional),
    or a third-party wire dialect — ``"maxwell"`` (changed-columns
    ``old`` diff), ``"canal"`` (FlatMessage, stringified values) or
    ``"dms"`` (AWS DMS metadata shape) — so the matching consumer
    tails this table with no engine-specific code.

    The bytes round-trip through ``envelope_from_json``/``_avro`` back
    to the identical envelope — pinned by tests — so a downstream
    engine instance consumes this stream with the stock boundary.
    """
    env = changelog_envelope(table, spark, epoch=epoch, topic=topic)
    if format == "json":
        if confluent_framing or schema_id != 1:
            raise ValueError(
                "confluent_framing/schema_id apply only to format='avro' "
                "(JSON payloads are unframed); refusing to silently "
                "publish unframed bytes a framed consumer would corrupt"
            )
        from transforms_for_apache_kafka_connect_spark.sources.json_boundary import (
            envelope_to_json,
        )

        return envelope_to_json(env, as_binary=True)
    if format == "avro":
        from transforms_for_apache_kafka_connect_spark.sources.avro_boundary import (
            envelope_to_avro,
        )

        schemas = relay_schemas(table, spark, epoch=epoch, topic=topic)
        return envelope_to_avro(
            env,
            value_schema=schemas["value_schema"],
            key_schema=schemas["key_schema"],
            confluent_framing=confluent_framing,
            schema_id=schema_id,
            use_jvm=use_jvm,
        )
    if format in ("maxwell", "canal", "dms"):
        if confluent_framing or schema_id != 1:
            raise ValueError(
                "confluent_framing/schema_id apply only to format='avro' "
                f"({format} payloads are unframed JSON)"
            )
        from transforms_for_apache_kafka_connect_spark.sources.cdc_envelopes import (
            envelope_to_canal,
            envelope_to_dms,
            envelope_to_maxwell,
        )

        to_wire = {"maxwell": envelope_to_maxwell,
                   "canal": envelope_to_canal,
                   "dms": envelope_to_dms}[format]
        wire = to_wire(env, table=topic or "changelog")
        # offset (the LSN) rides along: a producer keys partitioning or
        # ordering on it, and the decode side recovers exact per-key
        # ordering via lsn=F.col("offset")
        return wire.select(
            "topic",
            "partition",
            F.col("key").cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            "timestamp",
            "headers",
            "offset",
        )
    raise ValueError(
        f"unknown publish format: {format!r} (json|avro|maxwell|canal|dms)"
    )


def relay_schemas(
    table: Any,
    spark: SparkSession,
    *,
    epoch: str | None = None,
    topic: str | None = None,
) -> dict:
    """The Avro key/value schemas a ``publish_changelog(format="avro")``
    stream is written with — the ONE place both sides derive them, so a
    consumer passes these straight to ``envelope_from_avro`` instead of
    re-deriving them by hand from the envelope's Spark types."""
    from transforms_for_apache_kafka_connect_spark.sources.avro_boundary import (
        spark_to_avro_schema,
    )

    env = changelog_envelope(table, spark, epoch=epoch, topic=topic)
    return {
        "key_schema": spark_to_avro_schema(env.schema["key"].dataType, "key"),
        "value_schema": spark_to_avro_schema(
            env.schema["value"].dataType, "value"
        ),
    }
