"""Robustness corpora for the string-touching SMTs.

Two corpora: the inline TRICKY set (fast smoke, hand-picked failure
classes) and the full 744-line Big List of Naughty Strings — the exact
public-domain corpus the reference runs through its hex/hash roundtrip
(utils/HexTest.java:48-67, src/test/resources/blns.txt; the reference
reads ALL lines verbatim, comments and blanks included — so do we).
UTF-8 is the pinned charset (SURVEY.md §2.2.1); golden digests below
are cross-checked against coreutils sha256sum/md5sum/sha1sum."""

from __future__ import annotations

import hashlib
import os

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


# ------------------------------------------------------- full BLNS corpus

BLNS_PATH = os.path.join(os.path.dirname(__file__), "resources", "blns.txt")


def blns_lines() -> list[str]:
    # reference reads every line verbatim (HexTest.java:49-50)
    with open(BLNS_PATH, encoding="utf-8") as f:
        return f.read().split("\n")


@pytest.fixture(scope="module")
def blns_df(spark):
    # carry a row index inside the value struct so output can be
    # re-ordered to match the file order after collect
    return values_df(
        spark,
        list(enumerate(blns_lines())),
        struct_type(i=T.IntegerType(), s=T.StringType()),
    )


def test_blns_corpus_is_reference_exact():
    lines = blns_lines()
    assert len(lines) == 745  # 744 strings + trailing empty line
    # a pinned non-ASCII line exists where expected
    assert lines[148] == "Ω≈ç√∫˜µ≤≥÷"


def test_blns_full_corpus_hash_parity(spark, blns_df):
    """Every BLNS line hashes to the same digest Spark-side as Python
    hashlib over UTF-8 bytes — the engine-wide charset pin."""
    lines = blns_lines()
    for fn, href in (
        ("sha256", hashlib.sha256),
        ("md5", hashlib.md5),
        ("sha1", hashlib.sha1),
    ):
        rows = (
            enforce(Hash(function=fn, field_name="s").apply(blns_df))
            .select(F.col("value.i").alias("i"), F.col("value.s").alias("h"))
            .orderBy("i")
            .collect()
        )
        assert [r["h"] for r in rows] == [
            href(s.encode("utf-8")).hexdigest() for s in lines
        ], f"digest mismatch for {fn}"


def test_blns_golden_non_ascii_digests(spark):
    """Golden digests for a pinned non-ASCII BLNS line, cross-checked
    against `printf '%s' 'Ω≈ç√∫˜µ≤≥÷' | sha256sum` (and md5sum/sha1sum)."""
    s = "Ω≈ç√∫˜µ≤≥÷"
    df = values_df(spark, [(s,)], struct_type(s=T.StringType()))
    got = {}
    for fn in ("sha256", "md5", "sha1"):
        got[fn] = (
            enforce(Hash(function=fn, field_name="s").apply(df))
            .select(F.col("value.s"))
            .first()[0]
        )
    assert got["sha256"] == (
        "d24cf890187e8815d094d388e208c7a160c5b0c87efe032be38338b22aa34b2c"
    )
    assert got["md5"] == "7053f131cd88ef763e72a44d84758bc4"
    assert got["sha1"] == "b64c788e842cbea95c9e4cf5ede9c3b9394c7d77"


def test_blns_hex_roundtrip(spark, blns_df):
    """HexTest.java:48-67 analog: lowercase-hex encode of the UTF-8
    bytes, decode back, compare to the original — over all 744 lines."""
    flat = blns_df.select(
        F.col("value.i").alias("i"), F.col("value.s").alias("s")
    )
    out = flat.select(
        "i",
        "s",
        F.lower(F.hex(F.col("s").cast("binary"))).alias("enc"),
        F.unhex(F.lower(F.hex(F.col("s").cast("binary")))).cast("string").alias("dec"),
        F.length(F.col("s").cast("binary")).alias("n_bytes"),
        F.length(F.lower(F.hex(F.col("s").cast("binary")))).alias("n_hex"),
    ).collect()
    for r in out:
        assert r["dec"] == r["s"], f"roundtrip failed at line {r['i']}"
        assert r["n_hex"] == 2 * r["n_bytes"]


def test_blns_case_transform_matches_python(spark, blns_df):
    # JVM (Locale.ROOT) and Python str casing agree on every BLNS line
    # (probed: 0 mismatches across the corpus) — pin it
    lines = blns_lines()
    for case, pyfn in (("upper", str.upper), ("lower", str.lower)):
        rows = (
            enforce(CaseTransform(field_names=["s"], case=case).apply(blns_df))
            .select(F.col("value.i").alias("i"), F.col("value.s").alias("s"))
            .orderBy("i")
            .collect()
        )
        assert [r["s"] for r in rows] == [pyfn(s) for s in lines], case


def test_blns_concat_preserves_bytes(spark, blns_df):
    st = ConcatFields(field_names=["s", "s"], output_field_name="c", delimiter="|")
    lines = blns_lines()
    rows = (
        enforce(st.apply(blns_df))
        .select(F.col("value.i").alias("i"), F.col("value.c").alias("c"))
        .orderBy("i")
        .collect()
    )
    assert [r["c"] for r in rows] == [f"{s}|{s}" for s in lines]
