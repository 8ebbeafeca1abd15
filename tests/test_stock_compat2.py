"""Stock SMT compat part 2: TimestampConverter, SetSchemaMetadata,
InsertHeader, DropHeaders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.errors import ConfigException
from transforms_for_apache_kafka_connect_spark.operators import (
    DropHeaders,
    ExtractTopicFromSchemaName,
    InsertHeader,
    SetSchemaMetadata,
    TimestampConverter,
)
from transforms_for_apache_kafka_connect_spark.record import enforce
from tests.helpers import make_records, struct_type

MS = 1_556_204_536_000  # 2019-04-25 15:02:16 UTC


def _ts_records(spark):
    v = struct_type(ts_ms=T.LongType(), name=T.StringType())
    return make_records(spark, [(None, (MS, "x"))], T.StringType(), v)


def test_timestamp_converter_unix_to_string_and_back(spark):
    df = _ts_records(spark)
    st = TimestampConverter(
        field="ts_ms", target_type="string", format="yyyy-MM-dd HH:mm:ss"
    )
    out = enforce(st.apply(df)).first()["value"]
    assert out["ts_ms"] == "2019-04-25 15:02:16"

    # string -> unix roundtrip recovers the (second-truncated) millis
    v2 = struct_type(t=T.StringType())
    df2 = make_records(
        spark, [(None, ("2019-04-25 15:02:16",))], T.StringType(), v2
    )
    st2 = TimestampConverter(
        field="t", target_type="unix", format="yyyy-MM-dd HH:mm:ss"
    )
    assert enforce(st2.apply(df2)).first()["value"]["t"] == MS


def test_timestamp_converter_to_timestamp_type(spark):
    st = TimestampConverter(field="ts_ms", target_type="Timestamp")
    out = enforce(st.apply(_ts_records(spark)))
    assert isinstance(
        out.schema["value"].dataType["ts_ms"].dataType, T.TimestampType
    )
    assert out.select(
        F.unix_millis("value.ts_ms").alias("ms")
    ).first()["ms"] == MS


def test_timestamp_converter_config():
    with pytest.raises(ConfigException, match="target.type"):
        TimestampConverter(field="x")
    with pytest.raises(ConfigException, match="one of"):
        TimestampConverter(field="x", target_type="Date8")
    with pytest.raises(ConfigException, match="format option"):
        TimestampConverter(field="x", target_type="string")


def test_set_schema_metadata_feeds_extract_topic(spark):
    # the stock chain [SetSchemaMetadata, ExtractTopicFromSchemaName]
    # works end-to-end through the engine's schema-metadata channel
    df = _ts_records(spark)
    chain = Chain([
        {"type": "set_schema_metadata", "schema.name": "com.acme.Order",
         "schema.version": 3},
        {"type": "extract_topic_from_schema_name",
         "schema.name.regex": r"(?:[.]|^)([^.]*)$"},
    ])
    out = chain.run(df).first()
    assert out["topic"] == "Order"

    with pytest.raises(ConfigException, match="Neither schema name"):
        SetSchemaMetadata()


def test_insert_and_drop_headers(spark):
    df = _ts_records(spark)  # headers start null
    st = InsertHeader(header="app.id", value_literal="tkc")
    out = enforce(st.apply(df)).first()
    assert out["headers"] == {"app.id": "tkc"}
    # overwrite same header, add another, then drop one
    chain = Chain([
        {"type": "insert_header", "header": "app.id", "value.literal": "v2"},
        {"type": "insert_header", "header": "trace", "value.literal": "t1"},
        {"type": "drop_headers", "headers": ["trace"]},
    ])
    out2 = chain.run(enforce(st.apply(df))).first()
    assert out2["headers"] == {"app.id": "v2"}

    with pytest.raises(ConfigException, match="Missing required"):
        InsertHeader(header="x")
    with pytest.raises(ConfigException, match="Missing required"):
        DropHeaders()
