"""Parity tests: ConcatFields (F1), CaseTransform (F4),
ExtractTimestamp (F6), MakeTombstone/TombstoneHandler (F8),
MoneyConverter (F9) — goldens per FIXTURES.md / reference JUnit."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark import DataException
from transforms_for_apache_kafka_connect_spark.errors import ConfigException
from transforms_for_apache_kafka_connect_spark.operators import (
    CaseTransform,
    ConcatFields,
    ExtractTimestamp,
    MakeTombstone,
    MoneyConverter,
    TombstoneHandler,
)
from transforms_for_apache_kafka_connect_spark.operators.tombstone_handler import (
    FAIL_MESSAGE,
)
from transforms_for_apache_kafka_connect_spark.record import enforce
from tests.helpers import STR_MAP, struct_type, values_df

# ---------------------------------------------------------------- ConcatFields

F1_T = struct_type(
    bar=T.StringType(), test=T.StringType(), age=T.LongType(), foo=T.BooleanType()
)
F1_CONCAT = ConcatFields(
    field_names=["test", "foo", "bar", "age"],
    output_field_name="combined",
    delimiter="-",
    field_replace_missing="*",
)
DATE_STR = "Sun Apr 26 12:25:51 UTC 1970"


def test_concat_all_present(spark):
    df = values_df(spark, [("Baz", DATE_STR, 100, False)], F1_T)
    out = enforce(F1_CONCAT.apply(df)).collect()
    assert out[0]["value"]["combined"] == f"{DATE_STR}-false-Baz-100"
    # schema widened with trailing optional string (ConcatFieldsTest.java:58-64)
    assert out[0]["value"].__fields__[-1] == "combined"


def test_concat_null_field_replaced(spark):
    df = values_df(spark, [("Baz", DATE_STR, 100, None)], F1_T)
    out = enforce(F1_CONCAT.apply(df)).collect()
    assert out[0]["value"]["combined"] == f"{DATE_STR}-*-Baz-100"


def test_concat_missing_schema_field_replaced(spark):
    df = values_df(
        spark,
        [("Baz", DATE_STR, 100)],
        struct_type(bar=T.StringType(), test=T.StringType(), age=T.LongType()),
    )
    out = enforce(F1_CONCAT.apply(df)).collect()
    assert out[0]["value"]["combined"] == f"{DATE_STR}-*-Baz-100"


def test_concat_map_regime(spark):
    df = values_df(spark, [{"test": "a", "foo": "b", "bar": "c", "age": "1"}], STR_MAP)
    out = enforce(F1_CONCAT.apply(df)).collect()
    assert out[0]["value"]["combined"] == "a-b-c-1"


def test_concat_null_value_errors(spark):
    df = values_df(spark, [None], F1_T)
    with pytest.raises(DataException, match="Value can't be null"):
        enforce(F1_CONCAT.apply(df))


def test_concat_non_struct_raises(spark):
    df = values_df(spark, ["scalar"], T.StringType())
    with pytest.raises(DataException, match="type must be STRUCT or MAP"):
        F1_CONCAT.apply(df)


def test_concat_config_required(spark):
    # empty field list is VALID (reference LIST semantics,
    # ConcatFieldsConfigTest.java:44-49); missing/empty output errors
    ConcatFields(field_names=[], output_field_name="x")
    with pytest.raises(ConfigException):
        ConcatFields(field_names=["a"], output_field_name="")
    with pytest.raises(ConfigException):
        ConcatFields(field_names=["a"])


# -------------------------------------------------------------- CaseTransform

F4_T = struct_type(
    original_uppercase_1=T.StringType(),
    original_uppercase_2=T.StringType(),
    original_lowercase_1=T.StringType(),
    original_lowercase_2=T.StringType(),
    do_not_touch=T.StringType(),
)
F4_ROW = ("UPPERCASE", "CamelCase_1", "lowercase", "CamelCase_2", "DoNotTouch")


def test_case_lower(spark):
    df = values_df(spark, [F4_ROW], F4_T)
    st = CaseTransform(
        field_names=["original_uppercase_1", "original_uppercase_2"], case="lower"
    )
    v = enforce(st.apply(df)).collect()[0]["value"]
    assert v["original_uppercase_1"] == "uppercase"
    assert v["original_uppercase_2"] == "camelcase_1"
    assert v["do_not_touch"] == "DoNotTouch"
    assert v["original_lowercase_1"] == "lowercase"


def test_case_upper(spark):
    df = values_df(spark, [F4_ROW], F4_T)
    st = CaseTransform(
        field_names=["original_lowercase_1", "original_lowercase_2"], case="upper"
    )
    v = enforce(st.apply(df)).collect()[0]["value"]
    assert v["original_lowercase_1"] == "LOWERCASE"
    assert v["original_lowercase_2"] == "CAMELCASE_2"


def test_case_null_stays_null_missing_ignored(spark):
    df = values_df(spark, [(None,)], struct_type(a=T.StringType()))
    st = CaseTransform(field_names=["a", "nonexistent"], case="upper")
    v = enforce(st.apply(df)).collect()[0]["value"]
    assert v["a"] is None
    assert "nonexistent" not in v.__fields__


def test_case_map_regime_missing_key_not_added(spark):
    df = values_df(spark, [{"a": "x"}], STR_MAP)
    st = CaseTransform(field_names=["a", "b"], case="upper")
    v = enforce(st.apply(df)).collect()[0]["value"]
    assert v == {"a": "X"}


def test_case_key_place(spark):
    df = values_df(
        spark, ["v"], T.StringType(), key_type=struct_type(a=T.StringType()), keys=[("Ab",)]
    )
    st = CaseTransform(field_names=["a"], case="upper", place="key")
    out = enforce(st.apply(df)).collect()[0]
    assert out["key"]["a"] == "AB"


def test_case_config(spark):
    with pytest.raises(ConfigException):
        CaseTransform(field_names=["a"], case="title")


# ----------------------------------------------------------- ExtractTimestamp

def test_ts_long_millis(spark):
    df = values_df(spark, [(11363151277,)], struct_type(test_field=T.LongType()))
    out = enforce(ExtractTimestamp(field_name="test_field").apply(df)).collect()
    assert out[0]["timestamp"] == 11363151277


def test_ts_long_seconds(spark):
    df = values_df(spark, [(11363151,)], struct_type(test_field=T.LongType()))
    out = enforce(
        ExtractTimestamp(field_name="test_field", timestamp_resolution="seconds").apply(df)
    ).collect()
    assert out[0]["timestamp"] == 11363151000


@pytest.mark.parametrize("res", ["milliseconds", "seconds"])
def test_ts_timestamp_type_ignores_resolution(spark, res):
    ts = datetime.datetime(2020, 11, 15, 1, 2, 3, tzinfo=datetime.timezone.utc)
    df = values_df(spark, [(ts,)], struct_type(test_field=T.TimestampType()))
    out = enforce(
        ExtractTimestamp(field_name="test_field", timestamp_resolution=res).apply(df)
    ).collect()
    assert out[0]["timestamp"] == int(ts.timestamp() * 1000)


def test_ts_map_regime(spark):
    df = values_df(spark, [{"test_field": "11363151277"}], STR_MAP)
    out = enforce(ExtractTimestamp(field_name="test_field").apply(df)).collect()
    assert out[0]["timestamp"] == 11363151277


def test_ts_null_field_errors(spark):
    df = values_df(spark, [(None,)], struct_type(test_field=T.LongType()))
    with pytest.raises(DataException, match="must be present and its value can't be null"):
        enforce(ExtractTimestamp(field_name="test_field").apply(df))


def test_ts_missing_field_raises(spark):
    df = values_df(spark, [("x",)], struct_type(other=T.StringType()))
    with pytest.raises(DataException, match="must be present"):
        ExtractTimestamp(field_name="test_field").apply(df)


def test_ts_wrong_type_raises(spark):
    df = values_df(spark, [("x",)], struct_type(test_field=T.StringType()))
    with pytest.raises(DataException, match="INT64 or org.apache.kafka.connect.data.Timestamp"):
        ExtractTimestamp(field_name="test_field").apply(df)


def test_ts_non_struct_raises(spark):
    df = values_df(spark, ["x"], T.StringType())
    with pytest.raises(DataException, match="type must be STRUCT or MAP"):
        ExtractTimestamp(field_name="test_field").apply(df)


def test_ts_config(spark):
    with pytest.raises(ConfigException):
        ExtractTimestamp(field_name="")
    with pytest.raises(ConfigException, match="timestamp.resolution"):
        ExtractTimestamp(field_name="f", timestamp_resolution="micros")


# ------------------------------------------------------------------ Tombstones

def test_make_tombstone(spark):
    df = values_df(spark, ["dummy value"], T.StringType())
    out = enforce(MakeTombstone().apply(df)).collect()[0]
    assert out["value"] is None
    assert out["topic"] == "original_topic"
    assert out["timestamp"] == 123


def test_tombstone_handler_drop(spark):
    df = values_df(spark, ["a", None, "b"], T.StringType())
    for behavior in ("drop_silent", "drop_warn", "DROP_WARN"):
        out = enforce(TombstoneHandler(behavior=behavior).apply(df)).collect()
        assert sorted(r["value"] for r in out) == ["a", "b"]


def test_tombstone_handler_fail(spark):
    df = values_df(spark, ["a", None], T.StringType())
    with pytest.raises(DataException) as ei:
        enforce(TombstoneHandler(behavior="fail").apply(df))
    assert str(ei.value) == FAIL_MESSAGE


def test_tombstone_handler_non_tombstones_pass(spark):
    df = values_df(spark, ["a", "b"], T.StringType())
    out = enforce(TombstoneHandler(behavior="fail").apply(df)).collect()
    assert len(out) == 2


def test_tombstone_handler_config(spark):
    with pytest.raises(ConfigException, match="Unsupported behavior name"):
        TombstoneHandler(behavior="explode")


# -------------------------------------------------------------- MoneyConverter

def test_money_decimal(spark):
    t = T.StructType([T.StructField("price", T.DecimalType(20, 4), True)])
    import decimal

    df = values_df(spark, [(decimal.Decimal("103.6999"),)], t)
    out = enforce(MoneyConverter(field_name="price").apply(df)).collect()
    assert out[0]["value"]["price"] == "103.70"


def test_money_long(spark):
    df = values_df(spark, [(103,)], struct_type(price=T.LongType()))
    out = enforce(MoneyConverter(field_name="price").apply(df)).collect()
    assert out[0]["value"]["price"] == "103.00"


def test_money_null_optional(spark):
    df = values_df(spark, [(None,)], struct_type(price=T.LongType()))
    out = enforce(MoneyConverter(field_name="price").apply(df)).collect()
    assert out[0]["value"]["price"] is None


def test_money_null_required(spark):
    df = values_df(spark, [(None,)], struct_type(price=T.LongType()))
    with pytest.raises(DataException, match="Money column is not optional, but data is null"):
        enforce(MoneyConverter(field_name="price", optional=False).apply(df))


def test_money_string_raises(spark):
    df = values_df(spark, [("103.6999",)], struct_type(price=T.StringType()))
    with pytest.raises(DataException, match="Money type should have BigDecimal type"):
        MoneyConverter(field_name="price").apply(df)
