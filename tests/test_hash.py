"""Hash parity tests — golden digests from reference HashTest.java:43-65
(via FIXTURES.md F2)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark import DataException
from transforms_for_apache_kafka_connect_spark.errors import ConfigException
from transforms_for_apache_kafka_connect_spark.operators import Hash
from transforms_for_apache_kafka_connect_spark.record import enforce
from tests.helpers import STR_MAP, struct_type, values_df

GOLDEN = {
    "": {
        "md5": "d41d8cd98f00b204e9800998ecf8427e",
        "sha1": "da39a3ee5e6b4b0d3255bfef95601890afd80709",
        "sha256": "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855",
    },
    "jerry@big-corp.com": {
        "md5": "10e5756d5d4c9c1cadd5e1b952071378",
        "sha1": "dd9ab6e93603bf618db0894a82da64f1623a94b6",
        "sha256": "20e85b05e7349963fc64746fbc7f3f4fdf31507921360847ebef333b229cf2d6",
    },
}

VALUE_T = struct_type(email=T.StringType(), name=T.StringType())


@pytest.mark.parametrize("fn", ["md5", "sha1", "sha256"])
def test_whole_value_golden(spark, fn):
    df = values_df(spark, ["", "jerry@big-corp.com"], T.StringType())
    out = enforce(Hash(function=fn).apply(df)).orderBy("value").collect()
    got = sorted(r["value"] for r in out)
    want = sorted(GOLDEN[s][fn] for s in GOLDEN)
    assert got == want


@pytest.mark.parametrize("fn", ["md5", "sha1", "sha256"])
def test_named_field_golden_struct(spark, fn):
    df = values_df(
        spark, [("jerry@big-corp.com", "jerry"), ("", "jerry")], VALUE_T
    )
    out = enforce(Hash(function=fn, field_name="email").apply(df)).collect()
    got = {r["value"]["email"] for r in out}
    assert got == {GOLDEN[s][fn] for s in GOLDEN}
    # untouched field passes through (HashTest field preservation)
    assert all(r["value"]["name"] == "jerry" for r in out)


def test_named_field_map_regime(spark):
    df = values_df(spark, [{"email": "jerry@big-corp.com", "name": "jerry"}], STR_MAP)
    out = enforce(Hash(function="sha256", field_name="email").apply(df)).collect()
    assert out[0]["value"]["email"] == GOLDEN["jerry@big-corp.com"]["sha256"]
    assert out[0]["value"]["name"] == "jerry"


def test_null_field_skip_true_passes_through(spark):
    df = values_df(spark, [(None, "jerry")], VALUE_T)
    out = enforce(
        Hash(function="sha256", field_name="email", skip_missing_or_null=True).apply(df)
    ).collect()
    assert out[0]["value"]["email"] is None


def test_null_field_skip_false_errors(spark):
    df = values_df(spark, [(None, "jerry")], VALUE_T)
    with pytest.raises(DataException, match="email in value can't be null"):
        enforce(Hash(function="sha256", field_name="email").apply(df))


def test_missing_schema_field_skip_false_raises(spark):
    df = values_df(spark, [("x",)], struct_type(other=T.StringType()))
    with pytest.raises(DataException, match="email in value schema can't be missing"):
        Hash(function="sha256", field_name="email").apply(df)


def test_missing_schema_field_skip_true_noop(spark):
    df = values_df(spark, [("x",)], struct_type(other=T.StringType()))
    out = enforce(
        Hash(function="sha256", field_name="email", skip_missing_or_null=True).apply(df)
    ).collect()
    assert out[0]["value"]["other"] == "x"


def test_non_string_field_raises(spark):
    df = values_df(spark, [(1,)], struct_type(email=T.LongType()))
    with pytest.raises(DataException, match="email schema type in value must be STRING"):
        Hash(function="sha256", field_name="email").apply(df)


def test_whole_value_non_string_raises(spark):
    df = values_df(spark, [42], T.LongType())
    with pytest.raises(DataException, match="value schema type must be STRING"):
        Hash(function="sha256").apply(df)


def test_key_place(spark):
    df = values_df(
        spark, ["v"], T.StringType(), keys=["jerry@big-corp.com"]
    )
    out = enforce(Hash(function="md5", place="key").apply(df)).collect()
    assert out[0]["key"] == GOLDEN["jerry@big-corp.com"]["md5"]
    assert out[0]["value"] == "v"


def test_determinism(spark):
    # sameValueSameHash x10 (HashTest.java:249-261)
    df = values_df(spark, ["jerry@big-corp.com"] * 10, T.StringType())
    out = enforce(Hash(function="sha1").apply(df)).collect()
    assert {r["value"] for r in out} == {GOLDEN["jerry@big-corp.com"]["sha1"]}


def test_bad_function_config(spark):
    with pytest.raises(ConfigException, match="function"):
        Hash(function="crc32")
