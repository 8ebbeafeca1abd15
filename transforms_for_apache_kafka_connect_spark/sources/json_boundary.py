"""JSON bytes ↔ struct converter boundary (reference JsonConverter
analog).

The reference's SMT chains sit behind Kafka Connect's ``JsonConverter``
(reference src/integration-test/.../IntegrationTest.java:172-173): raw
``byte[]`` key/value payloads are deserialized into typed Connect data
before the chain, and serialized back after. This module is that
boundary for the engine: a raw stream (binary or string JSON columns)
becomes the typed envelope the operators consume, and an envelope can
be serialized back to JSON for a bytes-oriented sink.

Spark-first shape: pure ``from_json`` / ``to_json`` Column expressions
— fully codegen'd, schema checked at plan time, zero Python in the hot
path. Bytes are decoded as UTF-8 (the engine-wide charset pin,
SURVEY.md §2.2.1).

Error contract: the reference converter throws ``DataException``
("Converting byte[] to Kafka Connect data failed due to serialization
error") on malformed JSON. Vectorized analog (SURVEY.md §4.3): a
non-null raw value that parses to NULL marks the row's error column;
the chain/engine batch-fail gate turns the first such row into a
``DataException`` before anything commits. Null raw values stay null —
they are tombstones, never errors.

Schema inference: pass explicit DDL/StructType schemas in production
(a stream cannot be sampled). For batch exploration,
``infer_json_schema`` runs Spark's distributed JSON inference over a
bounded sample and returns the schema to pin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.record import (
    ensure_error_col,
    merge_error,
)

#: reference JsonConverter's DataException message prefix
SERIALIZATION_ERROR = (
    "Converting byte[] to Kafka Connect data failed due to "
    "serialization error: "
)


def _as_string(col: Column) -> Column:
    # BinaryType -> UTF-8 string; StringType passes through unchanged
    return col.cast("string")


#: reserved struct field used to detect malformed documents
_CORRUPT = "__tkc_corrupt"


def _parse_with_corruption(
    raw: Column, schema: T.StructType
) -> tuple[Column, Column]:
    """``from_json`` + vectorized malformed-document detection.

    PERMISSIVE mode maps malformed input to a struct of nulls — which
    is indistinguishable from a valid-but-empty document — so the
    corrupt-record column is appended to the parse schema: it is
    non-null exactly for malformed rows. Malformed rows surface as a
    NULL struct plus a true ``bad`` flag."""
    if any(f.name == _CORRUPT for f in schema.fields):
        raise ValueError(f"schema may not contain reserved field {_CORRUPT!r}")
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    parsed = F.from_json(
        raw, with_corrupt, {"columnNameOfCorruptRecord": _CORRUPT}
    )
    bad = parsed[_CORRUPT].isNotNull()
    clean = F.when(~bad, parsed.dropFields(_CORRUPT))
    return clean, bad


def infer_json_schema(
    df: DataFrame, col: str = "value", sample: int = 1000
) -> T.StructType:
    """JSON schema inference over a bounded sample (batch DataFrames
    only — pin the result as an explicit schema for streaming use).

    The sample is collected to the driver (bounded by ``sample``) and
    fed to Spark's JSON inference through a tiny parallelize — PySpark's
    reader takes only paths or an RDD of strings (no Dataset[String]
    overload), and this shape keeps Python workers off the distributed
    scan entirely: the scan side is a pure limit+collect."""
    spark = df.sparkSession
    strings = [
        r[0]
        for r in (
            df.select(_as_string(F.col(col)).alias("json"))
            .filter(F.col("json").isNotNull())
            .limit(sample)
            .collect()
        )
    ]
    if not strings:
        return T.StructType([])
    return spark.read.json(spark.sparkContext.parallelize(strings, 2)).schema


def envelope_from_json(
    raw: DataFrame,
    *,
    value_schema: T.StructType | str | None = None,
    key_schema: T.StructType | str | None = None,
    key_col: str = "key",
    value_col: str = "value",
    infer_sample: int = 1000,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Raw JSON-bytes stream -> typed envelope.

    ``raw`` needs ``value`` (binary or string JSON; null = tombstone)
    and optionally ``key``/``topic``/``partition``/``timestamp``/
    ``headers`` — missing envelope slots get defaults. With
    ``key_schema``/``value_schema`` absent, the schema is inferred from
    a sample (batch only).

    Malformed JSON (non-null input, null parse) sets the per-record
    error column with the reference JsonConverter's message — the
    engine's batch-fail gate surfaces it as a ``DataException``.
    """
    if value_schema is None:
        value_schema = infer_json_schema(raw, value_col, infer_sample)
    if isinstance(value_schema, str):
        value_schema = T._parse_datatype_string(value_schema)

    cols = dict.fromkeys(raw.columns)
    raw_value = _as_string(F.col(value_col))
    parsed_value, value_bad = _parse_with_corruption(raw_value, value_schema)

    if key_col in cols and key_schema is not None:
        if isinstance(key_schema, str):
            key_schema = T._parse_datatype_string(key_schema)
        raw_key = _as_string(F.col(key_col))
        key_expr, key_bad = _parse_with_corruption(raw_key, key_schema)
    elif key_col in cols:
        # no key schema: keep the key as its UTF-8 string form (the
        # reference's schemaless primitive-key path)
        raw_key = _as_string(F.col(key_col))
        key_expr = raw_key
        key_bad = F.lit(False)
    else:
        raw_key = F.lit(None).cast("string")
        key_expr = raw_key
        key_bad = F.lit(False)

    env = raw.select(
        (F.col("topic") if "topic" in cols else F.lit("json_topic")).alias("topic"),
        (
            F.col("partition").cast("int")
            if "partition" in cols
            else F.lit(0).cast("int")
        ).alias("partition"),
        key_expr.alias("key"),
        parsed_value.alias("value"),
        (
            F.col("timestamp").cast("long")
            if "timestamp" in cols
            else F.lit(None).cast("long")
        ).alias("timestamp"),
        (
            F.col("headers")
            if "headers" in cols
            else F.lit(None).cast(T.MapType(T.StringType(), T.StringType()))
        ).alias("headers"),
        # quote the document that actually failed to parse (a malformed
        # key must not point the operator at the — valid — value)
        F.when(key_bad, raw_key).otherwise(raw_value).alias("__raw_bad"),
        (value_bad | key_bad).alias("__json_bad"),
        *[F.col(c) for c in (passthrough or []) if c in cols],
    )
    env = ensure_error_col(env)
    env = merge_error(
        env,
        F.col("__json_bad"),
        F.concat(
            F.lit(SERIALIZATION_ERROR),
            F.format_string("invalid JSON document: %s", F.col("__raw_bad")),
        ),
    )
    return env.drop("__raw_bad", "__json_bad")


def envelope_from_kafka(
    raw: DataFrame,
    *,
    value_schema: T.StructType | str | None = None,
    key_schema: T.StructType | str | None = None,
    parse_json: bool = True,
    infer_sample: int = 1000,
) -> DataFrame:
    """Spark Kafka-source DataFrame -> typed envelope.

    ``spark.read/readStream.format("kafka")`` produces exactly
    ``key binary, value binary, topic string, partition int,
    offset long, timestamp timestamp, timestampType int`` (plus
    ``headers array<struct<key:string, value:binary>>`` with
    ``includeHeaders=true``). This adapter turns that shape into the
    engine envelope with pure Column expressions:

    * headers array -> ``map<string,string>`` (UTF-8; Kafka allows
      duplicate header keys — last occurrence wins, matching Connect's
      ``Headers.lastWithName``);
    * timestamp -> epoch millis;
    * key/value bytes -> typed structs via the JSON converter boundary
      (``parse_json=True``) or UTF-8 strings (``parse_json=False``,
      the raw-passthrough path);
    * the Kafka ``offset`` survives as a passthrough column — with
      compacted-topic ingestion it is the natural per-partition LSN
      for the engine's LWW dedupe.

    Malformed JSON follows the converter error contract
    (``SERIALIZATION_ERROR`` -> batch-fail gate)."""
    cols = dict.fromkeys(raw.columns)
    if "value" not in cols:
        raise ValueError("kafka frame must have a 'value' column")

    prepped = raw
    if "headers" in cols and isinstance(
        raw.schema["headers"].dataType, T.ArrayType
    ):
        entries = F.transform(
            F.col("headers"),
            lambda h: F.struct(
                h.getField("key").alias("key"),
                h.getField("value").cast("string").alias("value"),
            ),
        )
        # map_from_entries raises on duplicate keys; Kafka headers are
        # multi-valued, so fold duplicates last-wins first
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
        prepped = prepped.withColumn(
            "headers",
            F.when(
                F.col("headers").isNotNull(), F.map_from_entries(deduped)
            ).cast("map<string,string>"),
        )
    ts_type = (
        raw.schema["timestamp"].dataType if "timestamp" in cols else None
    )
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        prepped = prepped.withColumn(
            "timestamp", F.unix_millis(F.col("timestamp").cast("timestamp"))
        )

    passthrough = [c for c in ("offset",) if c in cols]
    if parse_json:
        return envelope_from_json(
            prepped,
            value_schema=value_schema,
            key_schema=key_schema,
            infer_sample=infer_sample,
            passthrough=passthrough,
        )
    return ensure_error_col(
        prepped.select(
            (F.col("topic") if "topic" in cols else F.lit("kafka_topic"))
            .alias("topic"),
            (
                F.col("partition").cast("int")
                if "partition" in cols
                else F.lit(0).cast("int")
            ).alias("partition"),
            _as_string(F.col("key")).alias("key")
            if "key" in cols
            else F.lit(None).cast("string").alias("key"),
            _as_string(F.col("value")).alias("value"),
            (
                F.col("timestamp").cast("long")
                if "timestamp" in cols
                else F.lit(None).cast("long")
            ).alias("timestamp"),
            (
                F.col("headers")
                if "headers" in cols
                else F.lit(None).cast("map<string,string>")
            ).alias("headers"),
            *[F.col(c) for c in passthrough],
        )
    )


def envelope_to_json(env: DataFrame, *, as_binary: bool = False) -> DataFrame:
    """Typed envelope -> raw JSON columns (the converter's serialize
    direction). Tombstones stay null; struct/map keys serialize to
    JSON, scalar keys to their string form."""
    key_type = env.schema["key"].dataType
    key_expr = (
        F.to_json(F.col("key"))
        if isinstance(key_type, (T.StructType, T.MapType, T.ArrayType))
        else F.col("key").cast("string")
    )
    value_expr = F.when(
        F.col("value").isNotNull(), F.to_json(F.col("value"))
    )
    if as_binary:
        key_expr = key_expr.cast("binary")
        value_expr = value_expr.cast("binary")
    return env.select(
        "topic",
        "partition",
        key_expr.alias("key"),
        value_expr.alias("value"),
        "timestamp",
        "headers",
    )
