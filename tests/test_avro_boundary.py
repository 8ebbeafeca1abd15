"""AvroConverter boundary (the schema-ful converter regime,
SURVEY.md §1.2): Avro binary bytes -> typed envelope -> chain, plus the
serialize direction, the pure-Python spec codec's golden bytes, and the
Confluent wire-framing contract. The JVM from_avro path is jar-gated
(skips in the sandbox, mirrors the Iceberg e2e gating)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.errors import DataException
from transforms_for_apache_kafka_connect_spark.record import ERROR_COL, enforce
from transforms_for_apache_kafka_connect_spark.sources import (
    avro_schema_to_spark,
    change_stream,
    decode_record,
    encode_record,
    envelope_from_avro,
    envelope_to_avro,
    jvm_avro_available,
    spark_to_avro_schema,
)

VALUE_SCHEMA = {
    "type": "record",
    "name": "v",
    "fields": [
        {"name": "user_id", "type": ["null", "long"]},
        {"name": "event_type", "type": ["null", "string"]},
        {"name": "amount", "type": ["null", "double"]},
    ],
}
KEY_SCHEMA = {
    "type": "record",
    "name": "k",
    "fields": [{"name": "id", "type": ["null", "long"]}],
}


# ----------------------------------------------------------- codec goldens
# Byte values pinned directly from the public Avro 1.12 spec's Binary
# Encoding section (zigzag examples: 1 -> 0x02, -1 -> 0x01, 64 -> 0x80
# 0x01; strings are length-prefixed UTF-8).

def _flat(name, typ):
    return {"type": "record", "name": "r", "fields": [{"name": name, "type": typ}]}


@pytest.mark.parametrize(
    "typ,val,expected",
    [
        ("long", 1, b"\x02"),
        ("long", -1, b"\x01"),
        ("long", 64, b"\x80\x01"),
        ("int", -64, b"\x7f"),
        ("string", "foo", b"\x06foo"),
        ("boolean", True, b"\x01"),
        ("bytes", b"\x00\xff", b"\x04\x00\xff"),
        (["null", "long"], None, b"\x00"),
        (["null", "long"], 3, b"\x02\x06"),
    ],
)
def test_codec_golden_bytes(typ, val, expected):
    sch = _flat("x", typ)
    assert encode_record(sch, {"x": val}) == expected
    assert decode_record(sch, expected) == {"x": val}


def test_codec_roundtrip_all_types():
    sch = {
        "type": "record",
        "name": "all",
        "fields": [
            {"name": "a", "type": ["null", "long"]},
            {"name": "b", "type": "string"},
            {"name": "c", "type": "double"},
            {"name": "d", "type": "float"},
            {"name": "e", "type": {"type": "array", "items": "int"}},
            {"name": "f", "type": {"type": "map", "values": ["null", "string"]}},
            {"name": "g", "type": {"type": "enum", "name": "E", "symbols": ["x", "y"]}},
            {"name": "h", "type": {"type": "fixed", "name": "Fx", "size": 2}},
            {"name": "i", "type": {"type": "record", "name": "nested",
                                   "fields": [{"name": "z", "type": "boolean"}]}},
        ],
    }
    rec = {
        "a": -(2**62), "b": "héllo 世界", "c": 3.14159,
        "d": 0.5, "e": [1, -2, 0], "f": {"k": "v", "n": None},
        "g": "y", "h": b"ab", "i": {"z": True},
    }
    assert decode_record(sch, encode_record(sch, rec)) == rec


def test_decode_rejects_trailing_and_truncated():
    sch = _flat("x", "long")
    with pytest.raises(ValueError):
        decode_record(sch, b"\x02\x02")  # trailing byte
    with pytest.raises(Exception):
        decode_record(sch, b"\x80")  # truncated varint


def test_encode_rejects_multibranch_union():
    # branch-index arithmetic assumes ['null', T]; anything wider must
    # refuse loudly instead of writing the wrong branch
    sch = _flat("x", ["null", "string", "long"])
    with pytest.raises(ValueError, match="nullable unions"):
        encode_record(sch, {"x": 5})


def test_zero_byte_body_roundtrips_framed(spark):
    # a record whose only field is null-typed encodes to a 0-byte body:
    # the framed payload is exactly the 5 frame bytes and must be valid
    sch = {"type": "record", "name": "e",
           "fields": [{"name": "x", "type": "null"}]}
    body = encode_record(sch, {"x": None})
    assert body == b""
    framed = b"\x00" + (3).to_bytes(4, "big") + body
    raw = spark.createDataFrame([(None, framed)], "key binary, value binary")
    env = envelope_from_avro(
        raw, value_schema=sch, confluent_framing=True, use_jvm=False
    )
    assert env.filter(F.col(ERROR_COL).isNotNull()).count() == 0
    assert env.select("avro_schema_id").collect()[0][0] == 3


def test_resolve_record_inside_arrays_and_maps():
    # spec resolution must reach records nested in arrays/maps
    from transforms_for_apache_kafka_connect_spark.sources import resolve_record

    w = {"type": "record", "name": "o", "fields": [
        {"name": "items", "type": {"type": "array", "items": {
            "type": "record", "name": "i",
            "fields": [{"name": "a", "type": "int"}]}}},
        {"name": "m", "type": {"type": "map", "values": {
            "type": "record", "name": "mv",
            "fields": [{"name": "x", "type": "int"}]}}},
    ]}
    r = {"type": "record", "name": "o", "fields": [
        {"name": "items", "type": {"type": "array", "items": {
            "type": "record", "name": "i",
            "fields": [{"name": "a", "type": "long"},
                       {"name": "region", "type": "string",
                        "default": "emea"}]}}},
        {"name": "m", "type": {"type": "map", "values": {
            "type": "record", "name": "mv",
            "fields": [{"name": "x", "type": "double"}]}}},
    ]}
    out = resolve_record(w, r, {
        "items": [{"a": 1}, {"a": 2}],
        "m": {"k": {"x": 7}},
    })
    assert out == {
        "items": [{"a": 1, "region": "emea"}, {"a": 2, "region": "emea"}],
        "m": {"k": {"x": 7.0}},
    }
    assert isinstance(out["m"]["k"]["x"], float)


def test_schema_mapping():
    st = avro_schema_to_spark(VALUE_SCHEMA)
    assert [f.name for f in st.fields] == ["user_id", "event_type", "amount"]
    assert isinstance(st["user_id"].dataType, T.LongType)
    with pytest.raises(ValueError):
        avro_schema_to_spark(["null", "long", "string"])  # multi-branch
    # spark -> avro -> spark closes the loop
    back = avro_schema_to_spark(spark_to_avro_schema(st, "v"))
    assert back == st


# ------------------------------------------------------------ envelope path

def _raw(spark, with_frame=False):
    rows = [
        (encode_record(KEY_SCHEMA, {"id": i}),
         encode_record(VALUE_SCHEMA,
                       {"user_id": i * 10, "event_type": "click" if i % 2 else None,
                        "amount": float(i) / 4}))
        for i in range(50)
    ]
    if with_frame:
        frame = b"\x00" + (7).to_bytes(4, "big")
        rows = [(frame + k, frame + v) for k, v in rows]
    return spark.createDataFrame(rows, "key binary, value binary")


def test_envelope_from_avro_python_path(spark):
    env = envelope_from_avro(
        _raw(spark), key_schema=KEY_SCHEMA, value_schema=VALUE_SCHEMA,
        use_jvm=False,
    )
    assert env.filter(F.col(ERROR_COL).isNotNull()).count() == 0
    out = enforce(env)
    rows = {r["id"]: r for r in out.select(
        F.col("key.id").alias("id"), F.col("value.user_id").alias("uid"),
        F.col("value.event_type").alias("et"), F.col("value.amount").alias("amt"),
    ).collect()}
    assert len(rows) == 50
    assert rows[3].uid == 30 and rows[3].et == "click" and rows[3].amt == 0.75
    assert rows[4].et is None


def test_envelope_avro_roundtrip_via_change_stream(spark):
    events = change_stream(spark, 300, n_repos=8, paths_per_repo=3)
    v_schema = spark_to_avro_schema(events.schema["value"].dataType, "v")
    k_schema = spark_to_avro_schema(events.schema["key"].dataType, "k")
    raw = envelope_to_avro(
        events, value_schema=v_schema, key_schema=k_schema, use_jvm=False
    )
    assert dict(raw.dtypes)["value"] == "binary"
    back = enforce(envelope_from_avro(
        raw, value_schema=v_schema, key_schema=k_schema, use_jvm=False
    ))
    a = events.drop("headers")
    b = back.select(*a.columns)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_confluent_framing_strip_and_id(spark):
    env = envelope_from_avro(
        _raw(spark, with_frame=True), key_schema=KEY_SCHEMA,
        value_schema=VALUE_SCHEMA, confluent_framing=True, use_jvm=False,
    )
    assert env.filter(F.col(ERROR_COL).isNotNull()).count() == 0
    ids = env.select("avro_schema_id").distinct().collect()
    assert [r[0] for r in ids] == [7]


def test_bad_frame_and_corrupt_payload_set_error(spark):
    good_v = encode_record(VALUE_SCHEMA, {"user_id": 1, "event_type": "x", "amount": None})
    frame = b"\x00" + (7).to_bytes(4, "big")
    rows = [
        (None, frame + good_v),          # ok
        (None, b"\x01" + good_v[:4]),    # wrong magic byte
        (None, frame + b"\x80\x80"),     # truncated varint body
        (None, None),                    # tombstone: never an error
    ]
    raw = spark.createDataFrame(rows, "key binary, value binary")
    env = envelope_from_avro(
        raw, value_schema=VALUE_SCHEMA, confluent_framing=True, use_jvm=False
    )
    errs = env.filter(F.col(ERROR_COL).isNotNull()).count()
    assert errs == 2
    with pytest.raises(DataException):
        enforce(env)


def test_tombstone_value_stays_null(spark):
    good = encode_record(VALUE_SCHEMA, {"user_id": 1, "event_type": "x", "amount": 1.0})
    raw = spark.createDataFrame(
        [(b"k1", good), (b"k2", None)], "key binary, value binary"
    )
    env = enforce(envelope_from_avro(raw, value_schema=VALUE_SCHEMA, use_jvm=False))
    assert env.filter(F.col("value").isNull()).count() == 1


def test_chain_runs_on_avro_envelope(spark):
    """Avro bytes -> envelope -> reference SMT chain: the schema-ful
    regime entry path end-to-end (reference README.md converter+SMT
    stack)."""
    rows = [
        (encode_record(KEY_SCHEMA, {"id": i}),
         encode_record(VALUE_SCHEMA,
                       {"user_id": i, "event_type": "click" if i % 2 else "view",
                        "amount": 1.0}))
        for i in range(40)
    ]
    raw = spark.createDataFrame(rows, "key binary, value binary")
    env = envelope_from_avro(
        raw, key_schema=KEY_SCHEMA, value_schema=VALUE_SCHEMA, use_jvm=False
    )
    chain = Chain([
        {"type": "filter_by_field_value", "field.name": "event_type",
         "field.value": "click", "field.value.matches": True},
        {"type": "hash", "field.name": "event_type", "function": "sha256"},
    ])
    out = chain.run(env)
    got = {r[0] for r in out.select("value.event_type").distinct().collect()}
    import hashlib
    assert got == {hashlib.sha256(b"click").hexdigest()}


# -------------------------------------------------------- logical types

def test_decimal_logical_type_codec():
    from decimal import Decimal

    sch = _flat("x", {"type": "bytes", "logicalType": "decimal",
                      "precision": 10, "scale": 2})
    for v in (Decimal("123.45"), Decimal("-0.01"), Decimal("0.00"),
              Decimal("-99999999.99")):
        enc = encode_record(sch, {"x": v})
        assert decode_record(sch, enc) == {"x": v}
    # spec example: 123.45 -> unscaled 12345 -> big-endian 0x3039
    assert encode_record(sch, {"x": Decimal("123.45")}) == b"\x04\x30\x39"
    # fixed-width decimal pads to the declared size
    fsch = _flat("x", {"type": "fixed", "name": "d", "size": 4,
                       "logicalType": "decimal", "precision": 9, "scale": 0})
    assert decode_record(fsch, encode_record(fsch, {"x": Decimal("7")})) == {
        "x": Decimal("7")
    }


def test_temporal_logical_types_codec():
    import datetime as dt

    sch = {
        "type": "record", "name": "t",
        "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "tm", "type": {"type": "long",
                                    "logicalType": "timestamp-millis"}},
            {"name": "tu", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
        ],
    }
    rec = {
        "d": dt.date(2023, 6, 15),
        "tm": dt.datetime(2023, 6, 15, 12, 30, 45, 123000),
        "tu": dt.datetime(1969, 12, 31, 23, 59, 59, 999999),
    }
    assert decode_record(sch, encode_record(sch, rec)) == rec
    # epoch day zero encodes as varint 0
    assert encode_record(_flat("x", {"type": "int", "logicalType": "date"}),
                         {"x": dt.date(1970, 1, 1)}) == b"\x00"


def test_logical_types_spark_mapping_and_roundtrip(spark):
    from decimal import Decimal

    sch = {
        "type": "record", "name": "v",
        "fields": [
            {"name": "amount", "type": ["null", {
                "type": "bytes", "logicalType": "decimal",
                "precision": 12, "scale": 2}]},
            {"name": "day", "type": ["null", {
                "type": "int", "logicalType": "date"}]},
            {"name": "ts", "type": ["null", {
                "type": "long", "logicalType": "timestamp-micros"}]},
        ],
    }
    st = avro_schema_to_spark(sch)
    assert isinstance(st["amount"].dataType, T.DecimalType)
    assert st["amount"].dataType.scale == 2
    assert isinstance(st["day"].dataType, T.DateType)
    assert isinstance(st["ts"].dataType, T.TimestampType)
    # spark -> avro keeps the logical annotations
    back = spark_to_avro_schema(st, "v")
    assert back["fields"][0]["type"][1]["logicalType"] == "decimal"

    import datetime as dt

    rows = [
        (encode_record(sch, {"amount": Decimal("19.99"),
                             "day": dt.date(2024, 2, 29),
                             "ts": dt.datetime(2024, 2, 29, 8, 0, 0)}),),
        (encode_record(sch, {"amount": None, "day": None, "ts": None}),),
    ]
    raw = spark.createDataFrame(rows, "value binary")
    env = enforce(envelope_from_avro(raw, value_schema=sch, use_jvm=False))
    got = env.select("value.amount", "value.day", "value.ts").collect()
    by_amount = {str(r["amount"]): r for r in got}
    assert by_amount["19.99"]["day"] == dt.date(2024, 2, 29)
    assert by_amount["19.99"]["ts"] == dt.datetime(2024, 2, 29, 8, 0, 0)
    assert by_amount["None"]["day"] is None
    # and the serialize direction round-trips through envelope_to_avro
    out = envelope_to_avro(env, value_schema=sch, use_jvm=False)
    env2 = enforce(envelope_from_avro(out, value_schema=sch, use_jvm=False))
    a = env.select("value.amount", "value.day", "value.ts")
    b = env2.select("value.amount", "value.day", "value.ts")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# ------------------------------------------------------ schema resolution

V1 = {
    "type": "record", "name": "v",
    "fields": [
        {"name": "user_id", "type": "int"},
        {"name": "event_type", "type": ["null", "string"]},
        {"name": "legacy_flag", "type": "boolean"},
    ],
}
V2 = {
    "type": "record", "name": "v",
    "fields": [
        {"name": "user_id", "type": "long"},           # int -> long promotion
        {"name": "event_type", "type": ["null", "string"]},
        {"name": "amount", "type": ["null", "double"]},  # added, nullable
        {"name": "region", "type": "string", "default": "emea"},  # added, default
        # legacy_flag removed
    ],
}


def test_resolve_record_rules():
    from transforms_for_apache_kafka_connect_spark.sources import resolve_record

    old = {"user_id": 7, "event_type": "click", "legacy_flag": True}
    out = resolve_record(V1, V2, old)
    assert out == {
        "user_id": 7,            # promoted int->long
        "event_type": "click",
        "amount": None,          # added nullable -> null
        "region": "emea",        # added with default
    }
    assert isinstance(out["user_id"], int)
    # reader field with no default and no null branch -> loud error
    bad_reader = {
        "type": "record", "name": "v",
        "fields": [{"name": "missing", "type": "string"}],
    }
    with pytest.raises(ValueError, match="no default"):
        resolve_record(V1, bad_reader, old)


def test_resolve_record_nested():
    from transforms_for_apache_kafka_connect_spark.sources import resolve_record

    w = {
        "type": "record", "name": "o",
        "fields": [{"name": "inner", "type": {
            "type": "record", "name": "i",
            "fields": [{"name": "a", "type": "int"}],
        }}],
    }
    r = {
        "type": "record", "name": "o",
        "fields": [{"name": "inner", "type": {
            "type": "record", "name": "i",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": ["null", "string"]},
            ],
        }}],
    }
    assert resolve_record(w, r, {"inner": {"a": 3}}) == {
        "inner": {"a": 3, "b": None}
    }


def test_evolving_topic_lands_in_one_spark_type(spark):
    """Payloads written under schema id 1 (V1) and id 2 (V2) decode and
    resolve onto the V2 reader in one pass — the mid-stream
    schema-evolution contract of a real registry-backed topic."""
    from transforms_for_apache_kafka_connect_spark.sources import encode_record

    def framed(sid, schema, rec):
        return b"\x00" + sid.to_bytes(4, "big") + encode_record(schema, rec)

    rows = [
        (None, framed(1, V1, {"user_id": 1, "event_type": "a", "legacy_flag": True})),
        (None, framed(1, V1, {"user_id": 2, "event_type": None, "legacy_flag": False})),
        (None, framed(2, V2, {"user_id": 3, "event_type": "b", "amount": 1.5,
                              "region": "apac"})),
        (None, framed(9, V1, {"user_id": 4, "event_type": "c", "legacy_flag": True})),
    ]
    raw = spark.createDataFrame(rows, "key binary, value binary")
    env = envelope_from_avro(
        raw, value_schema=V2, confluent_framing=True,
        writer_schemas={1: V1, 2: V2}, use_jvm=False,
    )
    good = env.filter(F.col(ERROR_COL).isNull()).select(
        F.col("value.user_id").alias("uid"),
        F.col("value.amount").alias("amount"),
        F.col("value.region").alias("region"),
        F.col("avro_schema_id").alias("sid"),
    ).collect()
    by_uid = {r.uid: r for r in good}
    assert set(by_uid) == {1, 2, 3}
    assert by_uid[1].amount is None and by_uid[1].region == "emea"
    assert by_uid[3].amount == 1.5 and by_uid[3].region == "apac"
    assert by_uid[1].sid == 1 and by_uid[3].sid == 2
    # unknown schema id 9 follows the converter error contract
    assert env.filter(F.col(ERROR_COL).isNotNull()).count() == 1


def test_writer_schemas_guardrails(spark):
    raw = spark.createDataFrame([(None, b"\x00")], "key binary, value binary")
    with pytest.raises(ValueError, match="confluent_framing"):
        envelope_from_avro(
            raw, value_schema=V2, writer_schemas={1: V1},
            confluent_framing=False, use_jvm=False,
        )
    with pytest.raises(ValueError, match="Python codec path"):
        envelope_from_avro(
            raw, value_schema=V2, writer_schemas={1: V1},
            confluent_framing=True, use_jvm=True,
        )


def test_raw_avro_stream_end_to_end(spark, tmp_path):
    # raw Avro bytes on disk -> readStream -> AvroConverter boundary ->
    # chain -> LWW -> merge: the schema-ful analog of the raw-JSON
    # streaming entry (test_json_boundary.py)
    from pyspark.sql import functions as F

    from transforms_for_apache_kafka_connect_spark.sources import (
        repositories_snapshot,
    )
    from transforms_for_apache_kafka_connect_spark.streaming import (
        LakeTable,
        Replayer,
    )

    n = 2_000
    events = change_stream(spark, n, n_repos=20, paths_per_repo=5)
    v_schema = spark_to_avro_schema(events.schema["value"].dataType, "v")
    k_schema = spark_to_avro_schema(events.schema["key"].dataType, "k")
    raw = envelope_to_avro(
        events, value_schema=v_schema, key_schema=k_schema,
        confluent_framing=True, use_jvm=False,
    )
    src = str(tmp_path / "raw")
    raw.write.parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    table = LakeTable(str(tmp_path / "t"), n_buckets=8)
    rep = Replayer(
        table=table,
        chain=Chain([{"type": "tombstone_handler", "behavior": "drop_silent"}]),
        epoch="e1",
    )
    q = rep.stream(
        stream,
        str(tmp_path / "ckpt"),
        available_now=True,
        raw_format="avro",
        key_schema=k_schema,
        value_schema=v_schema,
        confluent_framing=True,
    )
    q.awaitTermination(300)
    q.stop()

    oracle = repositories_snapshot(spark, events)
    final = table.read(spark)
    assert final.count() == oracle.count()
    cmp = final.select("repo", "path", "content").join(
        oracle.select("repo", "path", F.col("content").alias("c2")),
        ["repo", "path"],
        "full_outer",
    )
    assert cmp.filter(
        "content IS NULL OR c2 IS NULL OR content != c2"
    ).count() == 0


def test_raw_avro_stream_requires_schema(spark, tmp_path):
    from transforms_for_apache_kafka_connect_spark.streaming import (
        LakeTable,
        Replayer,
    )

    table = LakeTable(str(tmp_path / "t"), n_buckets=4)
    rep = Replayer(table=table, chain=Chain([]), epoch="e1")
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="value_schema"):
        rep.stream(df, str(tmp_path / "ckpt"), raw_format="avro")


def test_jvm_path_when_available(spark):
    """Runs the JVM from_avro path when the spark-avro jar is present;
    skips (declared) in the sandbox pip build."""
    if not jvm_avro_available(spark):
        pytest.skip("spark-avro jar not on classpath (sandbox pip build)")
    env = enforce(envelope_from_avro(
        _raw(spark), key_schema=KEY_SCHEMA, value_schema=VALUE_SCHEMA,
        use_jvm=True,
    ))
    assert env.count() == 50


def test_decimal_high_precision_no_rounding():
    # the default decimal context rounds at 28 significant digits;
    # the codec must carry the full advertised precision (38)
    from decimal import Decimal

    sch = _flat("x", {"type": "bytes", "logicalType": "decimal",
                      "precision": 38, "scale": 2})
    v = Decimal("123456789012345678901234567890123456.78")
    assert decode_record(sch, encode_record(sch, {"x": v})) == {"x": v}


def test_decimal_scale_overflow_is_an_error():
    from decimal import Decimal

    sch = _flat("x", {"type": "bytes", "logicalType": "decimal",
                      "precision": 10, "scale": 2})
    with pytest.raises(ValueError, match="does not fit scale"):
        encode_record(sch, {"x": Decimal("1.239")})


def test_timestamp_codec_respects_tz():
    import datetime as dt
    from zoneinfo import ZoneInfo

    sch = _flat("x", {"type": "long", "logicalType": "timestamp-micros"})
    ny = ZoneInfo("America/New_York")
    wall = dt.datetime(2024, 1, 15, 12, 0, 0)  # noon ET = 17:00 UTC
    enc_ny = encode_record(sch, {"x": wall}, tz=ny)
    enc_utc = encode_record(sch, {"x": wall})
    assert enc_ny != enc_utc  # the zone matters on the wire
    # round-trip in the same zone restores the wall time
    assert decode_record(sch, enc_ny, tz=ny) == {"x": wall}
    # and the UTC reading of the ET encoding is shifted by 5h
    assert decode_record(sch, enc_ny) == {
        "x": dt.datetime(2024, 1, 15, 17, 0, 0)
    }


def test_resolution_rejects_logical_type_kind_mismatch():
    from transforms_for_apache_kafka_connect_spark.sources import resolve_record

    w = _flat("x", "long")  # plain epoch long
    r = _flat("x", {"type": "long", "logicalType": "timestamp-micros"})
    with pytest.raises(ValueError, match="logicalType mismatch"):
        resolve_record(w, r, {"x": 1_000_000})
    # same KIND with different unit is fine (both decode to datetime)
    import datetime as dt

    w2 = _flat("x", {"type": "long", "logicalType": "timestamp-millis"})
    v = dt.datetime(2024, 3, 1, 10, 0, 0)
    assert resolve_record(w2, r, {"x": v}) == {"x": v}
