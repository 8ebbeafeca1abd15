"""Parity tests: ExtractTopic / ExtractTopicFromSchemaName (F7),
FilterByFieldValue (F3), KeyToValue (F5), and chain composition."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark import Chain, DataException
from transforms_for_apache_kafka_connect_spark.errors import ConfigException
from transforms_for_apache_kafka_connect_spark.operators import (
    ExtractTopic,
    ExtractTopicFromSchemaName,
    FilterByFieldValue,
    KeyToValue,
)
from transforms_for_apache_kafka_connect_spark.record import enforce
from tests.helpers import STR_MAP, make_records, struct_type, values_df

# ---------------------------------------------------------------- ExtractTopic

def test_topic_whole_value_scalars(spark):
    for val, typ, expected in [
        (123, T.LongType(), "123"),
        (False, T.BooleanType(), "false"),
        ("new_topic", T.StringType(), "new_topic"),
    ]:
        df = values_df(spark, [val], typ)
        out = enforce(ExtractTopic().apply(df)).collect()
        assert out[0]["topic"] == expected


def test_topic_struct_field(spark):
    df = values_df(spark, [("new-topic",)], struct_type(**{"field-0": T.StringType()}))
    out = enforce(ExtractTopic(field_name="field-0").apply(df)).collect()
    assert out[0]["topic"] == "new-topic"


def test_topic_map_field(spark):
    df = values_df(spark, [{"test_field": "routed"}], STR_MAP)
    out = enforce(ExtractTopic(field_name="test_field").apply(df)).collect()
    assert out[0]["topic"] == "routed"


def test_topic_null_field_skip_true_keeps_original(spark):
    df = values_df(spark, [(None,)], struct_type(test_field=T.StringType()))
    out = enforce(
        ExtractTopic(field_name="test_field", skip_missing_or_null=True).apply(df)
    ).collect()
    assert out[0]["topic"] == "original_topic"


def test_topic_empty_field_skip_false_errors(spark):
    df = values_df(spark, [("",)], struct_type(test_field=T.StringType()))
    with pytest.raises(DataException, match="test_field in value can't be null or empty"):
        enforce(ExtractTopic(field_name="test_field").apply(df))


def test_topic_blank_asymmetry(spark):
    # with schema: " " is a LEGAL topic (ExtractTopic.java:201 uses "".equals)
    df = values_df(spark, [(" ",)], struct_type(test_field=T.StringType()))
    out = enforce(ExtractTopic(field_name="test_field").apply(df)).collect()
    assert out[0]["topic"] == " "
    # schemaless: " " is MISSING (isBlank, :138,151)
    dfm = values_df(spark, [{"test_field": " "}], STR_MAP)
    with pytest.raises(DataException, match="can't be null or empty"):
        enforce(ExtractTopic(field_name="test_field").apply(dfm))


def test_topic_missing_struct_field_raises(spark):
    df = values_df(spark, [("x",)], struct_type(other=T.StringType()))
    with pytest.raises(DataException, match="test_field in value schema can't be missing"):
        ExtractTopic(field_name="test_field").apply(df)


def test_topic_struct_whole_value_raises(spark):
    df = values_df(spark, [("x",)], struct_type(a=T.StringType()))
    with pytest.raises(DataException):
        ExtractTopic().apply(df)


def test_topic_unsupported_field_type_raises(spark):
    df = values_df(
        spark, [(["a"],)], struct_type(test_field=T.ArrayType(T.StringType()))
    )
    with pytest.raises(DataException, match="schema type in value must be"):
        ExtractTopic(field_name="test_field").apply(df)


def test_topic_key_place(spark):
    df = values_df(spark, ["v"], T.StringType(), keys=["key-topic"])
    out = enforce(ExtractTopic(place="key").apply(df)).collect()
    assert out[0]["topic"] == "key-topic"


# ------------------------------------------------- ExtractTopicFromSchemaName

def _named_df(spark, names):
    df = values_df(spark, ["x"] * len(names), T.StringType())
    from pyspark.sql import functions as F

    import pandas as pd

    names_df = spark.createDataFrame(
        [(n,) for n in names], "value_schema_name: string"
    )
    # zip by position via monotonically increasing ids is overkill for tests;
    # just rebuild with the name column
    rows = [("original_topic", 0, None, "x", 123, None, n) for n in names]
    schema = T.StructType(
        [
            T.StructField("topic", T.StringType(), False),
            T.StructField("partition", T.IntegerType(), False),
            T.StructField("key", T.StringType(), True),
            T.StructField("value", T.StringType(), True),
            T.StructField("timestamp", T.LongType(), True),
            T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
            T.StructField("value_schema_name", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_schema_name_plain(spark):
    df = _named_df(spark, ["com.acme.schema.SchemaNameToTopic1"])
    out = enforce(ExtractTopicFromSchemaName().apply(df)).collect()
    assert out[0]["topic"] == "com.acme.schema.SchemaNameToTopic1"


def test_schema_name_map(spark):
    df = _named_df(
        spark,
        ["com.acme.schema.SchemaNameToTopic1", "com.acme.schema.SchemaNameToTopic2"],
    )
    st = ExtractTopicFromSchemaName(
        schema_name_topic_map=(
            "com.acme.schema.SchemaNameToTopic1:TheNameToReplace1,"
            "com.acme.schema.SchemaNameToTopic2:TheNameToReplace2"
        )
    )
    out = {r["value_schema_name"]: r["topic"] for r in enforce(st.apply(df)).collect()}
    assert out["com.acme.schema.SchemaNameToTopic1"] == "TheNameToReplace1"
    assert out["com.acme.schema.SchemaNameToTopic2"] == "TheNameToReplace2"


def test_schema_name_regex(spark):
    df = _named_df(spark, ["com.acme.schema.SchemaNameToTopic"])
    st = ExtractTopicFromSchemaName(schema_name_regex=r"(?:[.]|^)([^.]*)$")
    out = enforce(st.apply(df)).collect()
    assert out[0]["topic"] == "SchemaNameToTopic"


def test_schema_name_regex_no_match_falls_back(spark):
    df = _named_df(spark, ["plainname"])
    st = ExtractTopicFromSchemaName(schema_name_regex=r"xyz(\d+)abc")
    out = enforce(st.apply(df)).collect()
    assert out[0]["topic"] == "plainname"


def test_schema_name_mutual_exclusion(spark):
    with pytest.raises(ConfigException, match="should not be defined together"):
        ExtractTopicFromSchemaName(schema_name_topic_map="a:b", schema_name_regex="x")


def test_schema_name_null_errors(spark):
    df = _named_df(spark, [None])
    with pytest.raises(DataException, match="value schema name can't be null"):
        enforce(ExtractTopicFromSchemaName().apply(df))


# ---------------------------------------------------------- FilterByFieldValue

DBZ_T = struct_type(
    before=T.StringType(),
    after=struct_type(pk=T.StringType(), value=T.StringType()),
    source=T.StringType(),
    op=T.StringType(),
    ts_ms=T.StringType(),
    transaction=T.StringType(),
)


def _dbz(spark, ops):
    rows = [(None, ("1", "New data"), None, op, "1620393591654", None) for op in ops]
    return values_df(spark, rows, DBZ_T)


def test_filter_exact_non_matching_drops(spark):
    df = _dbz(spark, ["r", "u", "r", "c"])
    st = FilterByFieldValue(field_name="op", field_value="r", field_value_matches=False)
    out = enforce(st.apply(df)).collect()
    assert sorted(r["value"]["op"] for r in out) == ["c", "u"]


def test_filter_exact_matching_keeps(spark):
    df = _dbz(spark, ["r", "u"])
    st = FilterByFieldValue(field_name="op", field_value="r")
    out = enforce(st.apply(df)).collect()
    assert [r["value"]["op"] for r in out] == ["r"]


def test_filter_regex_find_semantics(spark):
    df = values_df(
        spark, [{"language": "Javascript"}, {"language": "Rust"}], STR_MAP
    )
    st = FilterByFieldValue(
        field_name="language",
        field_value_pattern=".*Java.*",
        field_value_matches=False,
    )
    out = enforce(st.apply(df)).collect()
    assert [r["value"]["language"] for r in out] == ["Rust"]


def test_filter_whole_value_raw(spark):
    df = values_df(spark, ["A42", "43"], T.StringType())
    st = FilterByFieldValue(field_value_pattern="42")
    out = enforce(st.apply(df)).collect()
    assert [r["value"] for r in out] == ["A42"]  # find, not full match


def test_filter_typed_numeric_equality(spark):
    # whole value (byte) 42 matches config string "42"
    df = values_df(spark, [42, 43], T.ByteType())
    st = FilterByFieldValue(field_value="42")
    out = enforce(st.apply(df)).collect()
    assert [r["value"] for r in out] == [42]


def test_filter_tombstone_always_passes(spark):
    df = _dbz(spark, ["u"]).union(
        make_records(spark, [(None, None)], T.StringType(), DBZ_T)
    )
    st = FilterByFieldValue(field_name="op", field_value="u")
    out = enforce(st.apply(df)).collect()
    assert len(out) == 2  # the matching row AND the tombstone


def test_filter_regex_null_field_is_nonmatch(spark):
    df = values_df(spark, [{"other": "x"}], STR_MAP)
    st = FilterByFieldValue(field_name="language", field_value_pattern=".*")
    assert enforce(st.apply(df)).count() == 0
    st2 = FilterByFieldValue(
        field_name="language", field_value_pattern=".*", field_value_matches=False
    )
    assert enforce(st2.apply(df)).count() == 1


def test_filter_exact_null_field_errors(spark):
    df = values_df(spark, [{"other": "x"}], STR_MAP)
    st = FilterByFieldValue(field_name="language", field_value="Rust")
    with pytest.raises(DataException, match="exact-match"):
        enforce(st.apply(df))


def test_filter_config_xor(spark):
    with pytest.raises(ConfigException, match="Either field.value or field.value.pattern"):
        FilterByFieldValue(field_name="op")
    with pytest.raises(ConfigException):
        FilterByFieldValue(field_name="op", field_value="r", field_value_pattern="x")


# ------------------------------------------------------------------ KeyToValue

KEY_A = struct_type(a=T.IntegerType(), b=T.IntegerType(), c=T.IntegerType())
VAL_X = struct_type(x=T.IntegerType(), y=T.IntegerType(), z=T.IntegerType())


def _k2v_df(spark):
    return make_records(spark, [((1, 2, 3), (100, 200, 300))], KEY_A, VAL_X)


def test_k2v_copy_fields(spark):
    out = enforce(KeyToValue(key_fields=["a", "b"]).apply(_k2v_df(spark))).collect()
    v = out[0]["value"]
    assert v.asDict() == {"x": 100, "y": 200, "z": 300, "a": 1, "b": 2}
    assert v.__fields__ == ["x", "y", "z", "a", "b"]  # order preserved then appended


def test_k2v_wildcard_struct(spark):
    out = enforce(KeyToValue(key_fields=["*"]).apply(_k2v_df(spark))).collect()
    assert out[0]["value"]["_key"].asDict() == {"a": 1, "b": 2, "c": 3}


def test_k2v_wildcard_primitive(spark):
    df = make_records(spark, [(123, (100, 200, 300))], T.IntegerType(), VAL_X)
    out = enforce(KeyToValue(key_fields=["*"]).apply(df)).collect()
    assert out[0]["value"]["_key"] == 123


def test_k2v_rename_matrix(spark):
    # key.fields=a,b,a,b,a / value.fields=m,n,x,y -> {x:1,y:2,z:300,m:1,n:2,a:1}
    st = KeyToValue(key_fields=["a", "b", "a", "b", "a"], value_fields=["m", "n", "x", "y"])
    out = enforce(st.apply(_k2v_df(spark))).collect()
    v = out[0]["value"]
    assert v.asDict() == {"x": 1, "y": 2, "z": 300, "m": 1, "n": 2, "a": 1}
    assert v.__fields__ == ["x", "y", "z", "m", "n", "a"]


def test_k2v_map_regimes(spark):
    df = make_records(
        spark, [({"a": "1", "b": "2"}, {"x": "100"})], STR_MAP, STR_MAP
    )
    out = enforce(KeyToValue(key_fields=["a"]).apply(df)).collect()
    assert out[0]["value"] == {"x": "100", "a": "1"}


def test_k2v_duplicate_destination(spark):
    # reference throws DataException at configure (KeyToValue.java:88-91)
    with pytest.raises(DataException, match="More than one key value is copied"):
        KeyToValue(key_fields=["a", "b"], value_fields=["m", "m"])


def test_k2v_missing_key_field(spark):
    with pytest.raises(DataException, match="Key field 'nope' not found in key schema"):
        KeyToValue(key_fields=["nope"]).apply(_k2v_df(spark))


def test_k2v_schemaless_key_into_struct_value(spark):
    df = make_records(spark, [({"a": "1"}, (100, 200, 300))], STR_MAP, VAL_X)
    with pytest.raises(DataException, match="value requires a schema"):
        KeyToValue(key_fields=["a"]).apply(df)


def test_k2v_primitive_key_named_field(spark):
    df = make_records(spark, [(123, (100, 200, 300))], T.IntegerType(), VAL_X)
    with pytest.raises(DataException, match="cannot be copied"):
        KeyToValue(key_fields=["a"]).apply(df)


# ----------------------------------------------------------------------- Chain

def test_chain_compose_and_fuse(spark):
    df = _dbz(spark, ["r", "u", "c", "d"])
    chain = Chain(
        [
            {"type": "filter_by_field_value", "field.name": "op",
             "field.value": "r", "field.value.matches": False},
            {"type": "concat_fields", "field.names": ["op", "ts_ms"],
             "output.field.name": "op_ts", "delimiter": "@"},
            {"type": "case_transform", "field.names": ["op"], "case": "upper"},
        ]
    )
    out = chain.run(df).collect()
    ops = sorted(r["value"]["op"] for r in out)
    assert ops == ["C", "D", "U"]
    assert all(r["value"]["op_ts"].endswith("@1620393591654") for r in out)


def test_chain_unknown_type(spark):
    with pytest.raises(ConfigException, match="Unknown transform type"):
        Chain([{"type": "nope"}])


def test_chain_error_survives_drop_stages(spark):
    # a record that errors in stage 1 must fail the batch even if a later
    # filter would have dropped it (reference: per-record exception wins)
    df = _dbz(spark, ["u"]).union(
        make_records(spark, [(None, None)], T.StringType(), DBZ_T)
    )
    chain = Chain(
        [
            {"type": "tombstone_handler", "behavior": "fail"},
            {"type": "filter_by_field_value", "field.name": "op", "field.value": "u"},
        ]
    )
    with pytest.raises(DataException, match="Tombstone record encountered"):
        chain.run(df)


# ---------------------------------------------------------- typed-field matrix

def test_topic_long_and_boolean_fields(spark):
    from pyspark.sql import types as T2

    df = values_df(spark, [(123,)], struct_type(test_field=T2.LongType()))
    out = enforce(ExtractTopic(field_name="test_field").apply(df)).collect()
    assert out[0]["topic"] == "123"
    dfb = values_df(spark, [(False,)], struct_type(test_field=T2.BooleanType()))
    out = enforce(ExtractTopic(field_name="test_field").apply(dfb)).collect()
    assert out[0]["topic"] == "false"


# ----------------------------------------------------- KeyToValue F5 leftovers

def test_k2v_string_trios(spark):
    kt = struct_type(a1=T.StringType(), a2=T.StringType(), a3=T.StringType())
    vt = struct_type(b1=T.StringType(), b2=T.StringType(), b3=T.StringType())
    df = make_records(spark, [(("x", "y", "z"), ("p", "q", "r"))], kt, vt)
    out = enforce(KeyToValue(key_fields=["a2"]).apply(df)).collect()
    assert out[0]["value"].asDict() == {"b1": "p", "b2": "q", "b3": "r", "a2": "y"}


def test_k2v_wildcard_struct_into_map_value(spark):
    kt = struct_type(a=T.IntegerType(), b=T.IntegerType())
    df = make_records(spark, [((1, 2), {"x": "100"})], kt, STR_MAP)
    out = enforce(KeyToValue(key_fields=["*"]).apply(df)).collect()
    v = out[0]["value"]
    assert v["x"] == "100"
    assert '"a":1' in v["_key"] and '"b":2' in v["_key"]  # JSON-stringified


# ------------------------------------------------------------------ RegexRouter

def test_regex_router_stock_semantics(spark):
    from transforms_for_apache_kafka_connect_spark.operators import RegexRouter

    df = values_df(spark, ["v"], T.StringType())  # topic=original_topic
    out = enforce(
        RegexRouter(regex=r"original_(.*)", replacement=r"routed_$1").apply(df)
    ).collect()
    assert out[0]["topic"] == "routed_topic"
    # non-matching (partial match must NOT rewrite: matches(), not find())
    out2 = enforce(
        RegexRouter(regex=r"origin", replacement="nope").apply(df)
    ).collect()
    assert out2[0]["topic"] == "original_topic"


def test_regex_router_in_chain(spark):
    df = values_df(spark, [{"test_field": "orders-raw"}], STR_MAP)
    chain = Chain(
        [
            {"type": "extract_topic", "field.name": "test_field"},
            {"type": "regex_router", "regex": "(.*)-raw", "replacement": "$1"},
        ]
    )
    assert chain.run(df).collect()[0]["topic"] == "orders"


def test_regex_router_bad_regex(spark):
    from transforms_for_apache_kafka_connect_spark.operators import RegexRouter

    with pytest.raises(ConfigException, match="Invalid value"):
        RegexRouter(regex="([unclosed", replacement="x")
