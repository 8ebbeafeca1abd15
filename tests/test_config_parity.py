"""Config-validation message parity with the reference's config test
classes — messages asserted byte-identical to:

* HashConfigTest.java:33-37
* ExtractTimestampConfigTest.java:31-44,88-97
* ConcatFieldsConfigTest.java:36-49
* TombstoneHandlerConfigTest.java
* ExtractTopicFromSchemaNameConfigTest.java
* ExtractTopicConfigTest.java (defaults/empty accepted, no errors)
* KeyToValue.java:88-91 (duplicate destination -> DataException)

No SparkSession needed: all validation is eager at stage construction
(the configure() analog — SURVEY.md §3 step 2).
"""

from __future__ import annotations

import pytest

from transforms_for_apache_kafka_connect_spark.errors import (
    ConfigException,
    DataException,
)
from transforms_for_apache_kafka_connect_spark.operators import (
    CaseTransform,
    ConcatFields,
    ExtractTimestamp,
    ExtractTopic,
    ExtractTopicFromSchemaName,
    FilterByFieldValue,
    Hash,
    KeyToValue,
    TombstoneHandler,
)


def _msg(excinfo) -> str:
    return str(excinfo.value)


# ----------------------------------------------------------------- Hash

def test_hash_missing_function():
    with pytest.raises(ConfigException) as e:
        Hash()
    assert _msg(e) == (
        'Missing required configuration "function" which has no default value.'
    )


def test_hash_invalid_function():
    with pytest.raises(ConfigException) as e:
        Hash(function="crc32")
    assert _msg(e) == (
        "Invalid value crc32 for configuration function: "
        "String must be one of: md5, sha1, sha256"
    )


def test_hash_empty_function_is_invalid_value():
    with pytest.raises(ConfigException) as e:
        Hash(function="")
    assert _msg(e) == (
        "Invalid value  for configuration function: "
        "String must be one of: md5, sha1, sha256"
    )


@pytest.mark.parametrize("fn", ["md5", "sha1", "sha256"])
def test_hash_valid_functions(fn):
    assert Hash(function=fn).function == fn


def test_hash_empty_field_name_treated_absent():
    assert Hash(function="sha256", field_name="").field_name is None
    assert Hash(function="sha256", field_name="test").field_name == "test"


@pytest.mark.parametrize("skip", [True, False])
def test_hash_skip_missing_or_null(skip):
    assert Hash(function="sha256", skip_missing_or_null=skip).skip_missing_or_null is skip


# ----------------------------------------------------- ExtractTimestamp

def test_extract_timestamp_missing_field_name():
    with pytest.raises(ConfigException) as e:
        ExtractTimestamp()
    assert _msg(e) == (
        'Missing required configuration "field.name" which has no default value.'
    )


def test_extract_timestamp_empty_field_name():
    with pytest.raises(ConfigException) as e:
        ExtractTimestamp(field_name="")
    assert _msg(e) == (
        "Invalid value  for configuration field.name: String must be non-empty"
    )


def test_extract_timestamp_resolution_default_and_valid():
    assert ExtractTimestamp(field_name="test").timestamp_resolution == "milliseconds"
    assert (
        ExtractTimestamp(field_name="test", timestamp_resolution="seconds")
        .timestamp_resolution == "seconds"
    )
    assert (
        ExtractTimestamp(field_name="test", timestamp_resolution="milliseconds")
        .timestamp_resolution == "milliseconds"
    )


def test_extract_timestamp_wrong_resolution():
    with pytest.raises(ConfigException) as e:
        ExtractTimestamp(field_name="test", timestamp_resolution="foo")
    assert _msg(e) == (
        "Invalid value foo for configuration timestamp.resolution: "
        "Unsupported resolution type 'foo'. Supported are: milliseconds, seconds"
    )


# --------------------------------------------------------- ConcatFields

def test_concat_fields_missing_field_names():
    with pytest.raises(ConfigException) as e:
        ConcatFields()
    assert _msg(e) == (
        'Missing required configuration "field.names" which has no default value.'
    )


def test_concat_fields_empty_list_then_missing_output():
    # reference: "" parses to an empty (valid) LIST; the error is the
    # NEXT missing required key (ConcatFieldsConfigTest.java:44-49)
    with pytest.raises(ConfigException) as e:
        ConcatFields(field_names="")
    assert _msg(e) == (
        'Missing required configuration "output.field.name" which has no default value.'
    )


def test_concat_fields_empty_output_field_name():
    with pytest.raises(ConfigException) as e:
        ConcatFields(field_names=["a"], output_field_name="")
    assert _msg(e) == (
        "Invalid value  for configuration output.field.name: "
        "String must be non-empty"
    )


def test_concat_fields_defined():
    st = ConcatFields(
        field_names=["test", "foo", "bar"],
        output_field_name="combined",
        delimiter="-",
        field_replace_missing="*",
    )
    assert st.field_names == ["test", "foo", "bar"]
    assert st.output_field_name == "combined"
    assert st.delimiter == "-" and st.field_replace_missing == "*"


def test_concat_fields_list_from_string():
    assert ConcatFields(
        field_names="test,foo,bar", output_field_name="c"
    ).field_names == ["test", "foo", "bar"]


# ----------------------------------------------------- TombstoneHandler

def test_tombstone_unknown_behavior():
    with pytest.raises(ConfigException) as e:
        TombstoneHandler(behavior="asdasdsadas")
    assert _msg(e) == (
        "Invalid value asdasdsadas for configuration behavior: "
        "Unsupported behavior name: asdasdsadas. "
        "Supported are: drop_silent,drop_warn,fail"
    )


def test_tombstone_empty_behavior():
    with pytest.raises(ConfigException) as e:
        TombstoneHandler(behavior="")
    assert _msg(e) == (
        "Invalid value  for configuration behavior: String must be non-empty"
    )


def test_tombstone_missing_behavior():
    with pytest.raises(ConfigException) as e:
        TombstoneHandler()
    assert _msg(e) == (
        'Missing required configuration "behavior" which has no default value.'
    )


@pytest.mark.parametrize(
    "raw,expected",
    [("DROP_SILENT", "drop_silent"), ("fail", "fail"), ("Drop_WArn", "drop_warn")],
)
def test_tombstone_case_insensitive_behaviors(raw, expected):
    assert TombstoneHandler(behavior=raw).behavior == expected


# ------------------------------------------- ExtractTopicFromSchemaName

def test_etfsn_defaults_ok():
    ExtractTopicFromSchemaName()


def test_etfsn_map_and_regex_together():
    with pytest.raises(ConfigException) as e:
        ExtractTopicFromSchemaName(
            schema_name_topic_map="map:value", schema_name_regex="regex"
        )
    assert _msg(e) == (
        "schema.name.topic-map and schema.name.regex "
        "should not be defined together."
    )


def test_etfsn_valid_map():
    st = ExtractTopicFromSchemaName(
        schema_name_topic_map=(
            "com.acme.schema.SchemaNameToTopic1:Name1,"
            "com.acme.schema.SchemaNameToTopic2:Name2"
        )
    )
    assert len(st._map) == 2


def test_etfsn_invalid_map():
    with pytest.raises(ConfigException) as e:
        ExtractTopicFromSchemaName(
            schema_name_topic_map="com.acme.schema.SchemaNameToTopic1TheNameToReplace1"
        )
    assert _msg(e) == (
        "schema.name.topic-map is not valid. Format should be: "
        '"SchemaValue1:NewValue1,SchemaValue2:NewValue2"'
    )


def test_etfsn_invalid_regex():
    with pytest.raises(ConfigException) as e:
        ExtractTopicFromSchemaName(schema_name_regex="***")
    assert _msg(e) == "*** set as schema.name.regex is not valid regex."


def test_etfsn_valid_regex():
    st = ExtractTopicFromSchemaName(schema_name_regex="(?:[.]|^)([^.]*)$")
    assert st.schema_name_regex == "(?:[.]|^)([^.]*)$"


# --------------------------------------------------------- ExtractTopic

def test_extract_topic_defaults_and_empty_field_name():
    # ExtractTopicConfigTest: no required configs; empty field.name is
    # treated as absent
    st = ExtractTopic()
    assert not st.field_name and st.skip_missing_or_null is False
    assert not ExtractTopic(field_name="").field_name
    assert ExtractTopic(field_name="test").field_name == "test"


# --------------------------------------------------- FilterByFieldValue

def test_filter_xor_required():
    expected = (
        "Either field.value or field.value.pattern have to be set "
        "to apply filter transform"
    )
    with pytest.raises(ConfigException) as e:
        FilterByFieldValue(field_name="f")
    assert _msg(e) == expected
    with pytest.raises(ConfigException) as e:
        FilterByFieldValue(field_name="f", field_value="x", field_value_pattern="y")
    assert _msg(e) == expected


# ----------------------------------------------------------- CaseTransform

def test_case_transform_missing_field_names():
    with pytest.raises(ConfigException) as e:
        CaseTransform(case="upper")
    assert _msg(e) == (
        'Missing required configuration "field.names" which has no default value.'
    )


def test_case_transform_missing_case():
    with pytest.raises(ConfigException) as e:
        CaseTransform(field_names=["a"])
    assert _msg(e) == (
        'Missing required configuration "case" which has no default value.'
    )


def test_case_transform_empty_case():
    with pytest.raises(ConfigException) as e:
        CaseTransform(field_names=["a"], case="")
    assert _msg(e) == (
        "Invalid value  for configuration case: String must be non-empty"
    )


def test_case_transform_unknown_case():
    # CaseTransformConfig.Case.fromString (CaseTransformConfig.java:95-101)
    with pytest.raises(ConfigException) as e:
        CaseTransform(field_names=["a"], case="mixed")
    assert _msg(e) == "Unknown enum value mixed"


def test_case_transform_empty_field_list_valid():
    assert CaseTransform(field_names="", case="upper").field_names == []


# ----------------------------------------------------------- KeyToValue

def test_key_to_value_missing_key_fields():
    with pytest.raises(ConfigException) as e:
        KeyToValue()
    assert _msg(e) == (
        'Missing required configuration "key.fields" which has no default value.'
    )


def test_key_to_value_duplicate_destination_is_data_exception():
    with pytest.raises(DataException) as e:
        KeyToValue(key_fields=["a", "b"], value_fields=["dest", "dest"])
    assert _msg(e) == (
        "More than one key value is copied to the value field name 'dest'"
    )
