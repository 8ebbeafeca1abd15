"""Robustness corpus (naughty-strings style, generated inline) for the
string-touching SMTs — the reference uses the public BLNS corpus for
hex/hash roundtrips (utils/HexTest.java:48-67); we pin a deterministic
tricky-string set covering the same failure classes."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.operators import (
    CaseTransform,
    ConcatFields,
    Hash,
)
from transforms_for_apache_kafka_connect_spark.record import enforce
from tests.helpers import struct_type, values_df

TRICKY = [
    "",
    " ",
    "\t\n\r",
    "null",
    "None",
    "undefined",
    "0",
    "-1.5e308",
    "'; DROP TABLE documents;--",
    '{"json": ["in", "a", "string"]}',
    "line1\nline2",
    "quote\"innerquote'",
    "back\\slash",
    "ünïcödé Ωμέγα",
    "日本語のテキスト",
    "العربية",
    "‮RTL override",
    "emoji 🎉🚀😀",
    "zero​width",
    "combining áccent",
    "ﬁ ligature ﬆ",
    "ⅧⅨⅩ roman",
    "ᴛʜᴇ sᴍᴀʟʟ ᴄᴀᴘs",
    "𝕳𝖊𝖆𝖛𝖞 𝖋𝖗𝖆𝖐𝖙𝖚𝖗",
    "a" * 10_000,
]


@pytest.fixture(scope="module")
def tricky_df(spark):
    return values_df(
        spark, [(s,) for s in TRICKY], struct_type(s=T.StringType())
    )


def test_hash_matches_hashlib_on_tricky_strings(spark, tricky_df):
    out = enforce(
        Hash(function="sha256", field_name="s").apply(tricky_df)
    ).select(F.col("value.s").alias("h")).collect()
    expected = [hashlib.sha256(s.encode("utf-8")).hexdigest() for s in TRICKY]
    assert [r["h"] for r in out] == expected


def test_md5_sha1_tricky(spark, tricky_df):
    for fn, href in (("md5", hashlib.md5), ("sha1", hashlib.sha1)):
        out = enforce(Hash(function=fn, field_name="s").apply(tricky_df)).select(
            F.col("value.s").alias("h")
        ).collect()
        assert [r["h"] for r in out] == [
            href(s.encode("utf-8")).hexdigest() for s in TRICKY
        ]


def test_case_transform_roundtrip_tricky(spark, tricky_df):
    upper = enforce(
        CaseTransform(field_names=["s"], case="upper").apply(tricky_df)
    ).select(F.col("value.s").alias("s")).collect()
    assert [r["s"] for r in upper] == [s.upper() for s in TRICKY]
    lower = enforce(
        CaseTransform(field_names=["s"], case="lower").apply(tricky_df)
    ).select(F.col("value.s").alias("s")).collect()
    assert [r["s"] for r in lower] == [s.lower() for s in TRICKY]


def test_concat_preserves_tricky_bytes(spark, tricky_df):
    st = ConcatFields(
        field_names=["s", "s"], output_field_name="c", delimiter="|"
    )
    out = enforce(st.apply(tricky_df)).select(F.col("value.c").alias("c")).collect()
    assert [r["c"] for r in out] == [f"{s}|{s}" for s in TRICKY]
