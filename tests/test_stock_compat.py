"""Stock Kafka Connect SMT compatibility pack: InsertField, ValueToKey,
Cast, HoistField, Flatten (RegexRouter/ReplaceField are tested in
test_routing_filter.py / test_field_ops.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.errors import (
    ConfigException,
    DataException,
)
from transforms_for_apache_kafka_connect_spark.operators import (
    Cast,
    Flatten,
    HoistField,
    InsertField,
    ValueToKey,
)
from transforms_for_apache_kafka_connect_spark.record import enforce
from tests.helpers import STR_MAP, make_records, struct_type

V = struct_type(a=T.StringType(), n=T.LongType())


def _records(spark):
    return make_records(
        spark,
        [(None, ("x", 41)), (None, None)],  # one live, one tombstone
        T.StringType(),
        V,
    )


def test_insert_field_static_and_metadata(spark):
    st = InsertField(
        static_field="source", static_value="cdc",
        topic_field="t", timestamp_field="ts",
    )
    rows = enforce(st.apply(_records(spark))).collect()
    live = next(r for r in rows if r["value"] is not None)["value"]
    assert live["source"] == "cdc"
    assert live["t"] == "original_topic" and live["ts"] == 123
    # tombstone stays null (withField null-propagates)
    assert any(r["value"] is None for r in rows)


def test_insert_field_requires_static_value():
    with pytest.raises(ConfigException, match="static.value"):
        InsertField(static_field="x")


def test_value_to_key_struct_and_map(spark):
    out = enforce(ValueToKey(fields=["a"]).apply(_records(spark))).collect()
    live = next(r for r in out if r["value"] is not None)
    assert live["key"].asDict() == {"a": "x"}
    tomb = next(r for r in out if r["value"] is None)
    assert tomb["key"] is None  # no value -> no key material

    m = make_records(spark, [(None, {"a": "x"})], T.StringType(), STR_MAP)
    out2 = enforce(ValueToKey(fields=["a"]).apply(m)).first()
    assert out2["key"].asDict() == {"a": "x"}


def test_value_to_key_missing_field_errors(spark):
    with pytest.raises(DataException, match="Field does not exist"):
        ValueToKey(fields=["nope"]).apply(_records(spark))


def test_value_to_key_config():
    with pytest.raises(ConfigException, match="Missing required"):
        ValueToKey()
    with pytest.raises(ConfigException, match="non-empty"):
        ValueToKey(fields="")


def test_cast_fields(spark):
    st = Cast(spec="n:string,a:string")
    out = enforce(st.apply(_records(spark))).collect()
    live = next(r for r in out if r["value"] is not None)["value"]
    assert live["n"] == "41" and isinstance(live["n"], str)
    # int64 -> int8 wraps like a JVM cast
    st2 = Cast(spec="n:int8")
    live2 = next(
        r for r in enforce(st2.apply(_records(spark))).collect()
        if r["value"] is not None
    )["value"]
    assert live2["n"] == 41


def test_cast_unknown_type():
    with pytest.raises(ConfigException, match="one of"):
        Cast(spec="n:decimal")
    with pytest.raises(ConfigException, match="Missing required"):
        Cast()


def test_hoist_field(spark):
    df = make_records(spark, [(None, "line1"), (None, None)],
                      T.StringType(), T.StringType())
    rows = enforce(HoistField(field="line").apply(df)).collect()
    live = next(r for r in rows if r["value"] is not None)
    assert live["value"].asDict() == {"line": "line1"}
    assert any(r["value"] is None for r in rows)


def test_flatten_nested(spark):
    inner = struct_type(c=T.StringType(), d=T.LongType())
    v = T.StructType([
        T.StructField("a", T.StringType(), True),
        T.StructField("b", inner, True),
    ])
    df = make_records(spark, [(None, ("x", ("y", 7))), (None, None)],
                      T.StringType(), v)
    rows = enforce(Flatten().apply(df)).collect()
    live = next(r for r in rows if r["value"] is not None)["value"].asDict()
    assert live == {"a": "x", "b.c": "y", "b.d": 7}
    rows2 = enforce(Flatten(delimiter="_").apply(df)).collect()
    live2 = next(r for r in rows2 if r["value"] is not None)["value"].asDict()
    assert set(live2) == {"a", "b_c", "b_d"}


def test_stock_chain_fuses(spark):
    chain = Chain([
        {"type": "insert_field", "static.field": "src", "static.value": "s1"},
        {"type": "cast", "spec": "n:string"},
        {"type": "value_to_key", "fields": ["a"]},
        {"type": "flatten"},
    ])
    out = chain.run(_records(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    live = next(r for r in out.collect() if r["value"] is not None)
    assert live["key"].asDict() == {"a": "x"}
    assert live["value"]["src"] == "s1" and live["value"]["n"] == "41"
