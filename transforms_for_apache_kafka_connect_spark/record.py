"""The change-record envelope.

The reference's unit of data is a ConnectRecord with 8 slots
(topic, kafkaPartition, keySchema, key, valueSchema, value, timestamp,
headers) — see reference ExtractTopic.java:94-103. We model a *batch*
of records as a DataFrame with envelope columns (SURVEY.md §1.4):

    topic:      string
    partition:  int
    key:        any (struct / map / scalar; nullable)
    value:      any (struct / map / scalar; nullable -> tombstone)
    timestamp:  long (epoch millis)
    headers:    map<string,string>

Schema regimes: a STRUCT-typed key/value column == the reference's
schema-ful ``Struct`` path; a MAP-typed column == the schemaless
``Map`` path. Operators dispatch on the Spark type exactly where the
reference dispatches on ``value instanceof Struct`` vs ``Map``
(ExtractTopic.java:75,120).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_COLUMNS = ("topic", "partition", "key", "value", "timestamp", "headers")

#: per-record error channel (SURVEY.md §4.3); null = healthy row
ERROR_COL = "__smt_error"


def envelope(
    df: DataFrame,
    *,
    key_cols: list[str] | None = None,
    value_cols: list[str] | None = None,
    topic: str = "original_topic",
    partition: int = 0,
    timestamp_col: str | None = None,
) -> DataFrame:
    """Wrap a flat table into the record envelope.

    ``key_cols``/``value_cols`` become struct columns; remaining
    envelope slots get constants (the reference tests pin
    topic='original_topic', partition=0 — ExtractTopicTest.java:355-364).
    """
    key_expr: Column = (
        F.struct(*[F.col(c) for c in key_cols]) if key_cols else F.lit(None).cast("string")
    )
    value_expr: Column = (
        F.struct(*[F.col(c) for c in value_cols])
        if value_cols
        else F.lit(None).cast("string")
    )
    ts_expr = (
        F.col(timestamp_col).cast("long") if timestamp_col else F.lit(123).cast("long")
    )
    return df.select(
        F.lit(topic).alias("topic"),
        F.lit(partition).cast("int").alias("partition"),
        key_expr.alias("key"),
        value_expr.alias("value"),
        ts_expr.alias("timestamp"),
        F.lit(None).cast(T.MapType(T.StringType(), T.StringType())).alias("headers"),
    )


def ensure_error_col(df: DataFrame) -> DataFrame:
    """Add the null error column if absent (idempotent)."""
    if ERROR_COL in df.columns:
        return df
    return df.withColumn(ERROR_COL, F.lit(None).cast("string"))


def merge_error(df: DataFrame, cond: Column, msg: Column) -> DataFrame:
    """Record ``msg`` for rows matching ``cond`` unless an earlier stage
    already errored them (first error wins == reference fail-on-first
    fold order)."""
    df = ensure_error_col(df)
    return df.withColumn(
        ERROR_COL,
        F.coalesce(F.col(ERROR_COL), F.when(cond, msg)),
    )


def keep_rows(df: DataFrame, keep: Column) -> DataFrame:
    """Drop rows failing ``keep`` — but never drop an errored row: it
    must survive to the chain end so the batch fails exactly as the
    reference's per-record exception would have."""
    df = ensure_error_col(df)
    return df.filter(keep | F.col(ERROR_COL).isNotNull())


def first_error(df: DataFrame) -> str | None:
    """Return the first error message in the batch, if any (one action)."""
    df = ensure_error_col(df)
    row = df.filter(F.col(ERROR_COL).isNotNull()).select(ERROR_COL).head(1)
    return row[0][0] if row else None


def enforce(df: DataFrame) -> DataFrame:
    """Fail the batch if any row errored, else strip the error column.

    This is the vectorized equivalent of the reference's per-record
    ``throw new DataException(...)`` (SURVEY.md §4.3).
    """
    from transforms_for_apache_kafka_connect_spark.errors import DataException

    msg = first_error(df)
    if msg is not None:
        raise DataException(msg)
    return df.drop(ERROR_COL)
