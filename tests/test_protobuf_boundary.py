"""ProtobufConverter boundary (the third Connect converter regime):
protobuf wire bytes -> typed envelope -> chain, plus the serialize
direction, the pure-Python codec's golden bytes (pinned from the
public protobuf encoding guide's worked examples), schema evolution by
field number, and the Confluent protobuf framing contract (magic +
schema id + message-indexes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.record import ERROR_COL, enforce
from transforms_for_apache_kafka_connect_spark.sources import (
    decode_frame,
    decode_message,
    encode_frame,
    encode_message,
    envelope_from_protobuf,
    envelope_to_protobuf,
    proto_schema_to_spark,
)

# ------------------------------------------------------------ codec goldens
# The worked examples in the public encoding guide
# (protobuf.dev/programming-guides/encoding).


def s(*fields):
    return {"name": "m", "fields": list(fields)}


def f(name, number, type_, **kw):
    return {"name": name, "number": number, "type": type_, **kw}


class TestGoldenBytes:
    def test_int32_150(self):
        # message Test1 { int32 a = 1; }, a=150 -> `08 96 01`
        sch = s(f("a", 1, "int32"))
        assert encode_message(sch, {"a": 150}) == bytes.fromhex("089601")
        assert decode_message(sch, bytes.fromhex("089601")) == {"a": 150}

    def test_string_testing(self):
        # message Test2 { string b = 2; } -> `12 07` + "testing"
        sch = s(f("b", 2, "string"))
        wire = bytes.fromhex("1207") + b"testing"
        assert encode_message(sch, {"b": "testing"}) == wire
        assert decode_message(sch, wire) == {"b": "testing"}

    def test_nested_message(self):
        # message Test3 { Test1 c = 3; } -> `1a 03 08 96 01`
        inner = s(f("a", 1, "int32"))
        sch = s(f("c", 3, {"message": inner}))
        wire = bytes.fromhex("1a03089601")
        assert encode_message(sch, {"c": {"a": 150}}) == wire
        assert decode_message(sch, wire) == {"c": {"a": 150}}

    def test_packed_repeated(self):
        # repeated int32 f = 6 with [3, 270, 86942]
        # -> `32 06 03 8e 02 9e a7 05`
        sch = s(f("f", 6, "int32", repeated=True))
        wire = bytes.fromhex("3206038e029ea705")
        assert encode_message(sch, {"f": [3, 270, 86942]}) == wire
        assert decode_message(sch, wire) == {"f": [3, 270, 86942]}

    def test_unpacked_repeated_accepted(self):
        # spec: parsers must accept the unpacked form for packable
        # fields (and concatenate mixed runs)
        sch = s(f("f", 6, "int32", repeated=True))
        unpacked = bytes.fromhex("3003") + bytes.fromhex("308e02")
        assert decode_message(sch, unpacked) == {"f": [3, 270]}
        mixed = bytes.fromhex("3003") + bytes.fromhex("32038e029e")
        # 0x9e alone is a truncated varint inside the packed run
        with pytest.raises(ValueError):
            decode_message(sch, mixed)

    def test_negative_int32_ten_bytes(self):
        # spec: int32 negatives sign-extend to 64 bits (always 10
        # varint bytes): a=-2 -> `08 fe ff ff ff ff ff ff ff ff 01`
        sch = s(f("a", 1, "int32"))
        wire = bytes.fromhex("08feffffffffffffffff01")
        assert encode_message(sch, {"a": -2}) == wire
        assert decode_message(sch, wire) == {"a": -2}

    @pytest.mark.parametrize(
        "v,enc",
        [(0, 0), (-1, 1), (1, 2), (-2, 3),
         (0x7FFFFFFF, 0xFFFFFFFE), (-0x80000000, 0xFFFFFFFF)],
    )
    def test_sint32_zigzag_table(self, v, enc):
        # the spec's zigzag table
        sch = s(f("a", 1, "sint32"))
        wire = encode_message(sch, {"a": v})
        # strip the tag byte, decode the varint by hand
        acc, shift = 0, 0
        for b in wire[1:]:
            acc |= (b & 0x7F) << shift
            shift += 7
        assert acc == enc
        assert decode_message(sch, wire) == {"a": v}

    def test_fixed_width_types(self):
        sch = s(
            f("d", 1, "double"), f("x", 2, "fixed64"),
            f("y", 3, "sfixed64"), f("g", 4, "float"),
            f("u", 5, "fixed32"), f("w", 6, "sfixed32"),
        )
        rec = {"d": 1.5, "x": 2**64 - 1, "y": -7, "g": 0.5,
               "u": 2**32 - 1, "w": -9}
        out = decode_message(sch, encode_message(sch, rec))
        # fixed64 lands as two's-complement long (documented wrap)
        assert out["x"] == -1
        assert out == {**rec, "x": -1}
        # re-encode is byte-identical (wrap is lossless mod 2^64)
        assert encode_message(sch, out) == encode_message(sch, rec)

    def test_map_field(self):
        sch = s(f("m", 7, {"map": {"key": "string", "value": "int64"}}))
        rec = {"m": {"a": 1, "b": 0}}
        wire = encode_message(sch, rec)
        assert decode_message(sch, wire) == rec

    def test_enum_field(self):
        sch = s(f("e", 2, {"enum": {"symbols": ["UNKNOWN", "A", "B"]}}))
        assert decode_message(sch, encode_message(sch, {"e": "B"})) == {
            "e": "B"
        }
        # default symbol omits from the wire (implicit presence)
        assert encode_message(sch, {"e": "UNKNOWN"}) == b""
        # open enums: unknown number survives as its integer string
        assert decode_message(sch, bytes.fromhex("1009")) == {"e": "9"}

    def test_bool_and_bytes(self):
        sch = s(f("b", 1, "bool"), f("raw", 2, "bytes"))
        rec = {"b": True, "raw": b"\x00\xff"}
        assert decode_message(sch, encode_message(sch, rec)) == rec


class TestPresence:
    def test_implicit_presence_defaults_omitted(self):
        sch = s(f("a", 1, "int32"), f("t", 2, "string"))
        assert encode_message(sch, {"a": 0, "t": ""}) == b""
        # absent decodes back to defaults, not None
        assert decode_message(sch, b"") == {"a": 0, "t": ""}

    def test_explicit_presence_optional(self):
        sch = s(f("a", 1, "int32", optional=True))
        # optional zero IS written (explicit presence: `08 00`)
        assert encode_message(sch, {"a": 0}) == bytes.fromhex("0800")
        # absent optional decodes to None, not 0
        assert decode_message(sch, b"") == {"a": None}

    def test_absent_message_is_none_absent_repeated_empty(self):
        inner = s(f("a", 1, "int32"))
        sch = s(
            f("c", 1, {"message": inner}),
            f("r", 2, "string", repeated=True),
            f("m", 3, {"map": {"key": "string", "value": "int32"}}),
        )
        assert decode_message(sch, b"") == {"c": None, "r": [], "m": {}}

    def test_last_one_wins_and_message_merge(self):
        sch = s(f("a", 1, "int32"))
        # duplicated singular scalar: last value wins
        wire = bytes.fromhex("0801") + bytes.fromhex("089601")
        assert decode_message(sch, wire) == {"a": 150}
        # duplicated embedded message: merge per inner field
        inner = s(f("a", 1, "int32"), f("b", 2, "string"))
        outer = s(f("c", 1, {"message": inner}))
        part1 = encode_message(outer, {"c": {"a": 5}})
        part2 = encode_message(outer, {"c": {"b": "x"}})
        assert decode_message(outer, part1 + part2) == {
            "c": {"a": 5, "b": "x"}
        }


class TestSchemaEvolution:
    def test_unknown_fields_skipped_every_wire_type(self):
        writer = s(
            f("a", 1, "int32"), f("d", 2, "double"),
            f("t", 3, "string"), f("g", 4, "float"),
        )
        reader = s(f("a", 1, "int32"))
        wire = encode_message(
            writer, {"a": 7, "d": 1.5, "t": "gone", "g": 2.0}
        )
        assert decode_message(reader, wire) == {"a": 7}

    def test_added_field_reads_default(self):
        writer = s(f("a", 1, "int32"))
        reader = s(f("a", 1, "int32"), f("n", 5, "string"),
                   f("o", 6, "int64", optional=True))
        out = decode_message(reader, encode_message(writer, {"a": 3}))
        assert out == {"a": 3, "n": "", "o": None}

    def test_renamed_field_resolves_by_number(self):
        # the proto contract: names are local, numbers are the wire
        writer = s(f("old_name", 1, "int32"))
        reader = s(f("new_name", 1, "int32"))
        out = decode_message(reader, encode_message(writer, {"old_name": 9}))
        assert out == {"new_name": 9}


class TestErrorContract:
    @pytest.mark.parametrize(
        "bad",
        [
            bytes.fromhex("08"),  # tag then truncated varint
            bytes.fromhex("09 01 02"),  # i64 field with 2 bytes
            bytes.fromhex("0a 05 68 69"),  # LEN longer than payload
            bytes.fromhex("0f"),  # invalid wire type 7
            bytes.fromhex("00 01"),  # field number 0
        ],
    )
    def test_malformed_raises(self, bad):
        sch = s(f("a", 1, "int64"))
        with pytest.raises(ValueError):
            decode_message(sch, bad)

    def test_group_wire_types_skipped(self):
        # deprecated SGROUP/EGROUP on an unknown field: depth-correct
        # skip; field 2 (known) must still land
        sch = s(f("a", 2, "int32"))
        wire = (
            bytes.fromhex("0b")        # field 1 SGROUP
            + bytes.fromhex("089601")  # inner varint field
            + bytes.fromhex("0c")      # field 1 EGROUP
            + bytes.fromhex("1003")    # field 2 = 3
        )
        assert decode_message(sch, wire) == {"a": 3}


class TestFraming:
    def test_frame_zero_index_single_byte(self):
        # the common [0] optimizes to one 0x00 byte
        frame = encode_frame(17, [0])
        assert frame == b"\x00" + (17).to_bytes(4, "big") + b"\x00"
        sid, idx, off = decode_frame(frame + b"")
        assert (sid, idx, off) == (17, [0], 6)

    def test_frame_nested_indexes(self):
        frame = encode_frame(3, [1, 2])
        sid, idx, off = decode_frame(frame + b"\x08\x01")
        assert (sid, idx) == (3, [1, 2])
        # zigzag varints: count 2 -> 0x04, values 1,2 -> 0x02,0x04
        assert frame[5:] == bytes.fromhex("040204")

    def test_bad_frame_raises(self):
        with pytest.raises(ValueError):
            decode_frame(b"\x01\x00\x00\x00\x07\x00")
        with pytest.raises(ValueError):
            decode_frame(b"\x00\x00\x00")


# --------------------------------------------------------------- spark legs

VALUE_SCHEMA = s(
    f("user_id", 1, "int64", optional=True),
    f("event_type", 2, "string", optional=True),
    f("value", 3, "double", optional=True),
    f("props", 4, "string", optional=True),
)
KEY_SCHEMA = s(f("event_id", 1, "int64", optional=True))


class TestSparkBoundary:
    def test_spark_type_mapping(self):
        sch = s(
            f("a", 1, "int32"), f("b", 2, "uint64"),
            f("c", 3, "string", repeated=True),
            f("m", 4, {"map": {"key": "string", "value": "double"}}),
            f("n", 5, {"message": s(f("x", 1, "bool"))}),
        )
        st = proto_schema_to_spark(sch)
        assert st["a"].dataType == T.IntegerType()
        assert st["b"].dataType == T.LongType()
        assert st["c"].dataType == T.ArrayType(T.StringType())
        assert st["m"].dataType == T.MapType(T.StringType(), T.DoubleType())
        assert isinstance(st["n"].dataType, T.StructType)

    def test_round_trip_envelope(self, spark):
        rows = [
            (1, 10, "click", 1.5, "p"),
            (2, 20, "view", 0.0, ""),
            (3, None, None, None, None),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, "
            "value double, props string"
        )
        env = df.select(
            F.lit("t").alias("topic"),
            F.lit(0).alias("partition"),
            F.struct("event_id").alias("key"),
            F.struct("user_id", "event_type", "value", "props").alias(
                "value"
            ),
            F.lit(None).cast("long").alias("timestamp"),
            F.lit(None).cast("map<string,string>").alias("headers"),
        )
        raw = envelope_to_protobuf(
            env, value_schema=VALUE_SCHEMA, key_schema=KEY_SCHEMA,
            confluent_framing=True, schema_id=11,
        )
        back = envelope_from_protobuf(
            raw, value_schema=VALUE_SCHEMA, key_schema=KEY_SCHEMA,
            confluent_framing=True,
        )
        out = {
            r["key"]["event_id"]: r
            for r in enforce(back).collect()
        }
        assert out[1]["value"].asDict() == {
            "user_id": 10, "event_type": "click", "value": 1.5, "props": "p"
        }
        # explicit presence: 0.0/"" survive exactly
        assert out[2]["value"].asDict() == {
            "user_id": 20, "event_type": "view", "value": 0.0, "props": ""
        }
        # all-null struct round-trips as all-null fields
        assert out[3]["value"].asDict() == {
            "user_id": None, "event_type": None, "value": None, "props": None
        }
        assert all(r["proto_schema_id"] == 11 for r in out.values())

    def test_tombstone_stays_null_not_error(self, spark):
        raw = spark.createDataFrame(
            [(b"\x00\x00\x00\x00\x01\x00\x08\x02", None)],
            "key binary, value binary",
        )
        env = envelope_from_protobuf(
            raw, value_schema=VALUE_SCHEMA, confluent_framing=True,
        )
        r = env.collect()[0]
        assert r["value"] is None and r[ERROR_COL] is None

    def test_malformed_payload_sets_error_column(self, spark):
        good = b"\x00\x00\x00\x00\x01\x00" + encode_message(
            VALUE_SCHEMA, {"user_id": 1}
        )
        bad_frame = b"\x07oops"
        bad_body = b"\x00\x00\x00\x00\x01\x00" + bytes.fromhex("08")
        raw = spark.createDataFrame(
            [(good,), (bad_frame,), (bad_body,)], "value binary"
        )
        env = envelope_from_protobuf(
            raw, value_schema=VALUE_SCHEMA, confluent_framing=True,
        )
        errs = [r[ERROR_COL] for r in env.collect()]
        assert errs[0] is None
        assert "invalid protobuf payload" in errs[1]
        assert "invalid protobuf payload" in errs[2]

    def test_spark_to_proto_schema_round_trip(self, spark):
        from transforms_for_apache_kafka_connect_spark.sources import (
            spark_to_proto_schema,
        )

        dt = T.StructType([
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.ArrayType(T.IntegerType())),
            T.StructField("m", T.MapType(T.StringType(), T.StringType())),
            T.StructField(
                "n", T.StructType([T.StructField("x", T.DoubleType())])
            ),
        ])
        sch = spark_to_proto_schema(dt)
        rec = {"a": 1, "b": "s", "c": [1, 2], "m": {"k": "v"},
               "n": {"x": 1.5}}
        assert decode_message(sch, encode_message(sch, rec)) == rec
        # the derived Spark type matches the input modulo nullability
        assert proto_schema_to_spark(sch) == T.StructType([
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.ArrayType(T.IntegerType())),
            T.StructField("m", T.MapType(T.StringType(), T.StringType())),
            T.StructField(
                "n",
                T.StructType([T.StructField("x", T.DoubleType())]),
            ),
        ])

    def test_evolved_writer_decodes_with_reader_alone(self, spark):
        # writer gained a field the reader doesn't know -> skipped;
        # reader gained a field the writer never wrote -> null
        writer = s(
            f("user_id", 1, "int64", optional=True),
            f("extra", 9, "string", optional=True),
        )
        reader = s(
            f("user_id", 1, "int64", optional=True),
            f("added", 12, "int64", optional=True),
        )
        raw = spark.createDataFrame(
            [(encode_message(writer, {"user_id": 5, "extra": "x"}),)],
            "value binary",
        )
        env = envelope_from_protobuf(raw, value_schema=reader)
        r = env.collect()[0]
        assert r["value"]["user_id"] == 5
        assert r["value"]["added"] is None


def test_raw_protobuf_stream_end_to_end(spark, tmp_path):
    # raw protobuf bytes on disk -> readStream -> ProtobufConverter
    # boundary -> chain -> LWW -> merge: the third-converter analog of
    # the raw-JSON/raw-Avro streaming entries
    from transforms_for_apache_kafka_connect_spark import Chain
    from transforms_for_apache_kafka_connect_spark.sources import (
        change_stream,
        repositories_snapshot,
        spark_to_proto_schema,
    )
    from transforms_for_apache_kafka_connect_spark.streaming import (
        LakeTable,
        Replayer,
    )

    n = 2_000
    events = change_stream(spark, n, n_repos=20, paths_per_repo=5)
    v_schema = spark_to_proto_schema(events.schema["value"].dataType, "v")
    k_schema = spark_to_proto_schema(events.schema["key"].dataType, "k")
    raw = envelope_to_protobuf(
        events, value_schema=v_schema, key_schema=k_schema,
        confluent_framing=True, schema_id=4,
    )
    src = str(tmp_path / "raw")
    raw.write.parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    table = LakeTable(str(tmp_path / "t"), n_buckets=8)
    rep = Replayer(
        table=table,
        chain=Chain(
            [{"type": "tombstone_handler", "behavior": "drop_silent"}]
        ),
        epoch="e1",
    )
    q = rep.stream(
        stream,
        str(tmp_path / "ckpt"),
        available_now=True,
        raw_format="protobuf",
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


def test_protobuf_converter_from_properties(tmp_path):
    from transforms_for_apache_kafka_connect_spark.plans.properties import (
        converters_from_properties,
    )

    sch = tmp_path / "v.json"
    sch.write_text(
        '{"name": "v", "fields": '
        '[{"name": "a", "number": 1, "type": "int64"}]}'
    )
    conv = converters_from_properties(
        "value.converter=io.confluent.connect.protobuf.ProtobufConverter\n"
        f"value.converter.schema.file={sch}\n"
    )
    assert conv["raw_format"] == "protobuf"
    assert conv["confluent_framing"] is True  # implied by the converter
    assert '"a"' in conv["value_schema"]


def test_writer_schemas_rejected_for_protobuf(spark):
    from transforms_for_apache_kafka_connect_spark.streaming.engine import (
        prepare_stream_events,
    )

    df = spark.createDataFrame([(b"",)], "value binary")
    with pytest.raises(ValueError, match="field number"):
        prepare_stream_events(
            df, raw_format="protobuf", value_schema=VALUE_SCHEMA,
            writer_schemas={1: {}},
        )
