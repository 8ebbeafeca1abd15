"""Protobuf bytes ↔ struct converter boundary (ProtobufConverter
analog — the third Connect converter regime after JSON and Avro).

The reference's SMT chains run behind Kafka Connect converters
(reference README.md usage); production Confluent deployments use one
of JsonConverter / AvroConverter / ProtobufConverter. ``json_boundary``
and ``avro_boundary`` closed the first two; this module closes the
triad: raw protobuf-wire key/value payloads become the typed envelope
the operators consume, and an envelope serializes back to protobuf
bytes for a bytes-oriented sink.

The codec is a dependency-free implementation of the public Protocol
Buffers *Encoding* specification (protobuf.dev/programming-guides/
encoding): tag = ``(field_number << 3) | wire_type``; wire types
``VARINT(0)`` / ``I64(1)`` / ``LEN(2)`` / ``I32(5)``; ``sint*`` zigzag;
``int32``/``int64`` negatives as 10-byte two's-complement varints;
packed repeated scalars; maps as repeated ``(key=1, value=2)`` entry
messages. Applied per Arrow batch through ``pandas_udf`` — the
per-record byte walk is sequential, but batches move via Arrow and the
loop touches only the bytes column (same execution shape the
sandbox-verified Avro fallback uses).

No JVM fast path here on purpose: Spark's ``from_protobuf`` (the
spark-protobuf module) takes compiled *descriptor files* which need
``protoc``/the protobuf runtime to produce — neither exists in this
container, and a runtime-generated descriptor would drag in the very
dependency this codec avoids. The schema model is instead a plain dict
(what a ProtobufConverter derives from the registry schema), see
:func:`proto_schema_to_spark`.

**Schema evolution is by field number** — the proto contract itself:
unknown field numbers are skipped wire-type-correctly, absent numbers
take presence-aware defaults, so a topic whose writer schema gained or
dropped fields decodes with the reader schema alone. (Contrast Avro,
where resolution needs the writer schema — protobuf needs no
``writer_schemas`` snapshot and none is accepted.)

Confluent wire framing for protobuf: 1 magic byte (0x00) + 4-byte
big-endian schema id + a *message-indexes* array (zigzag varint count
then that many zigzag varint indexes; the overwhelmingly common
``[0]`` — first message in the schema — is optimized to the single
byte ``0x00``), per the public Confluent wire-format doc.

Error contract matches the JSON/Avro boundaries (SURVEY.md §4.3): a
non-null payload that fails to decode sets the per-record error column
with the converter ``SERIALIZATION_ERROR`` message; the engine's
batch-fail gate raises ``DataException`` before anything commits.
Null payloads are tombstones, never errors.
"""

from __future__ import annotations

import io
import json
import math
import struct as _struct
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.record import (
    ensure_error_col,
    merge_error,
)
from transforms_for_apache_kafka_connect_spark.sources.json_boundary import (
    SERIALIZATION_ERROR,
)

# wire types (encoding spec)
_VARINT, _I64, _LEN, _SGROUP, _EGROUP, _I32 = 0, 1, 2, 3, 4, 5

#: scalar type -> (wire type, signed-varint?) for the varint family
_VARINT_TYPES = {
    "int32": False,
    "int64": False,
    "uint32": False,
    "uint64": False,
    "sint32": True,
    "sint64": True,
    "bool": False,
    "enum": False,
}
_I64_TYPES = {"fixed64", "sfixed64", "double"}
_I32_TYPES = {"fixed32", "sfixed32", "float"}
_LEN_TYPES = {"string", "bytes"}
_SCALARS = set(_VARINT_TYPES) | _I64_TYPES | _I32_TYPES | _LEN_TYPES

#: Confluent wire format: magic 0x00 + 4-byte big-endian schema id
#: (+ message indexes, variable length — handled separately)
_FRAME_LEN = 5


def _norm(schema: Any) -> Any:
    """Schemas appear as JSON strings or dicts; normalize to dicts."""
    if isinstance(schema, str):
        return json.loads(schema)
    return schema


def _field_kind(field: dict) -> tuple[str, Any]:
    """-> ('scalar'|'enum'|'message'|'map', detail). ``type`` is a
    scalar name, ``{"enum": {...}}``, ``{"message": {...}}`` or
    ``{"map": {"key": K, "value": V}}``."""
    t = field["type"]
    if isinstance(t, str):
        if t not in _SCALARS or t == "enum":
            raise ValueError(f"unsupported proto type: {t!r}")
        return "scalar", t
    if isinstance(t, dict):
        if "enum" in t:
            return "enum", t["enum"]
        if "message" in t:
            return "message", _norm(t["message"])
        if "map" in t:
            return "map", t["map"]
    raise ValueError(f"unsupported proto type: {t!r}")


def proto_schema_to_spark(schema: Any) -> T.StructType:
    """Map a message schema dict to the Spark type the decoder
    produces.

    Schema model (what a ProtobufConverter derives from the registry's
    ``.proto``): ``{"name": ..., "fields": [{"name", "number",
    "type", "repeated"?, "optional"?}, ...]}``; ``type`` is a scalar
    type name, ``{"enum": {"symbols": [...]}}`` (-> string, symbol
    name), ``{"message": {...}}`` (-> nested struct) or
    ``{"map": {"key": K, "value": V}}`` (-> map).

    Signedness: ``uint32``/``fixed32`` fit in LongType; ``uint64``
    lands as LongType with two's-complement wrap above 2^63-1 (the
    same compromise Connect's converter makes — Spark has no unsigned
    64-bit type), documented rather than silent: the decode is
    lossless modulo 2^64 and re-encodes byte-identically."""
    schema = _norm(schema)
    fields = []
    for f in schema["fields"]:
        kind, detail = _field_kind(f)
        if kind == "scalar":
            dt = _scalar_spark(detail)
        elif kind == "enum":
            dt = T.StringType()
        elif kind == "message":
            dt = proto_schema_to_spark(detail)
        else:  # map
            dt = T.MapType(
                _scalar_spark(detail["key"])
                if isinstance(detail["key"], str)
                else T.StringType(),
                _value_spark(detail["value"]),
            )
        if f.get("repeated") and kind != "map":
            dt = T.ArrayType(dt)
        fields.append(T.StructField(f["name"], dt, nullable=True))
    return T.StructType(fields)


def _scalar_spark(t: str) -> T.DataType:
    if t in ("int32", "sint32", "sfixed32"):
        return T.IntegerType()
    if t in ("int64", "sint64", "sfixed64", "uint64", "uint32", "fixed64",
             "fixed32"):
        return T.LongType()
    if t == "bool":
        return T.BooleanType()
    if t == "float":
        return T.FloatType()
    if t == "double":
        return T.DoubleType()
    if t == "string":
        return T.StringType()
    if t == "bytes":
        return T.BinaryType()
    raise ValueError(f"unsupported proto scalar: {t!r}")


def _value_spark(t: Any) -> T.DataType:
    """Map-value types: scalar name or nested enum/message dict."""
    if isinstance(t, str):
        return _scalar_spark(t)
    if isinstance(t, dict):
        if "enum" in t:
            return T.StringType()
        if "message" in t:
            return proto_schema_to_spark(t["message"])
    raise ValueError(f"unsupported map value type: {t!r}")


# ------------------------------------------------------------ wire helpers


def _write_varint(u: int, out: io.BytesIO) -> None:
    """Unsigned varint (encoding spec: base-128, little-endian
    groups, MSB = continuation)."""
    if u < 0:
        raise ValueError("varint must be non-negative")
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    acc = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _zigzag(n: int) -> int:
    """sint* encode (spec: ZigZag maps signed to unsigned so small
    magnitudes stay short)."""
    return (n << 1) ^ (n >> 63)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _tag(number: int, wire: int) -> int:
    return (number << 3) | wire


# ------------------------------------------------------------------ encode


def _encode_scalar(t: str, v: Any, out: io.BytesIO) -> None:
    if t in _VARINT_TYPES:
        if t == "bool":
            _write_varint(1 if v else 0, out)
        elif t in ("sint32", "sint64"):
            _write_varint(_zigzag(int(v)) & 0xFFFFFFFFFFFFFFFF, out)
        else:
            # int32/int64 negatives: 10-byte two's-complement varint
            # (spec: "sign-extended to 64 bits"); uints must be in range
            n = int(v)
            if t.startswith("uint") and n < 0:
                raise ValueError(f"{t} cannot encode negative {n}")
            _write_varint(n & 0xFFFFFFFFFFFFFFFF, out)
    elif t == "double":
        out.write(_struct.pack("<d", float(v)))
    elif t == "float":
        out.write(_struct.pack("<f", float(v)))
    elif t in ("fixed64", "sfixed64"):
        out.write(_struct.pack("<q" if t == "sfixed64" else "<Q",
                               int(v) & 0xFFFFFFFFFFFFFFFF
                               if t == "fixed64" else int(v)))
    elif t in ("fixed32", "sfixed32"):
        out.write(_struct.pack("<i" if t == "sfixed32" else "<I",
                               int(v) & 0xFFFFFFFF
                               if t == "fixed32" else int(v)))
    elif t == "string":
        b = str(v).encode("utf-8")
        _write_varint(len(b), out)
        out.write(b)
    elif t == "bytes":
        b = bytes(v)
        _write_varint(len(b), out)
        out.write(b)
    else:  # pragma: no cover - guarded by _field_kind
        raise ValueError(f"unsupported proto scalar: {t!r}")


def _scalar_wire(t: str) -> int:
    if t in _VARINT_TYPES:
        return _VARINT
    if t in _I64_TYPES:
        return _I64
    if t in _I32_TYPES:
        return _I32
    return _LEN


def _is_default(kind: str, t: Any, v: Any) -> bool:
    """proto3 implicit presence: default-valued scalars are omitted
    from the wire."""
    if kind == "enum":
        return v == t["symbols"][0]
    if t == "bool":
        return v is False
    if t == "string":
        return v == ""
    if t == "bytes":
        return bytes(v) == b""
    if t in ("float", "double"):
        # NaN is NOT the default (0.0) — it must hit the wire
        return v == 0 and not (isinstance(v, float) and math.isnan(v))
    return v == 0


def _encode_field(field: dict, v: Any, out: io.BytesIO) -> None:
    kind, detail = _field_kind(field)
    num = field["number"]
    if field.get("repeated") and kind != "map":
        items = list(v)
        if not items:
            return
        if kind == "scalar" and detail not in _LEN_TYPES:
            # packed (proto3 default for numeric repeated scalars)
            body = io.BytesIO()
            for item in items:
                _encode_scalar(detail, item, body)
            payload = body.getvalue()
            _write_varint(_tag(num, _LEN), out)
            _write_varint(len(payload), out)
            out.write(payload)
        else:
            for item in items:
                _encode_single(field, kind, detail, item, out)
        return
    if kind == "map":
        entries = v.items() if isinstance(v, dict) else v
        key_t = detail["key"]
        val_field = {"name": "value", "number": 2, "type": detail["value"]}
        for k, val in entries:
            entry = io.BytesIO()
            _write_varint(_tag(1, _scalar_wire(key_t)), entry)
            _encode_scalar(key_t, k, entry)
            # map values always written, even defaults (entry messages
            # use explicit presence for the value field in practice;
            # writing defaults keeps decode lossless for None-vs-0)
            if val is not None:
                vk, vd = _field_kind(val_field)
                _encode_single(val_field, vk, vd, val, entry)
            payload = entry.getvalue()
            _write_varint(_tag(num, _LEN), out)
            _write_varint(len(payload), out)
            out.write(payload)
        return
    # singular
    if kind == "scalar" and not field.get("optional") \
            and _is_default(kind, detail, v):
        return  # implicit presence: defaults are omitted
    if kind == "enum" and not field.get("optional") \
            and _is_default(kind, detail, v):
        return
    _encode_single(field, kind, detail, v, out)


def _encode_single(
    field: dict, kind: str, detail: Any, v: Any, out: io.BytesIO
) -> None:
    num = field["number"]
    if kind == "scalar":
        _write_varint(_tag(num, _scalar_wire(detail)), out)
        _encode_scalar(detail, v, out)
    elif kind == "enum":
        _write_varint(_tag(num, _VARINT), out)
        symbols = detail["symbols"]
        _write_varint(symbols.index(v) if isinstance(v, str) else int(v), out)
    elif kind == "message":
        body = encode_message(detail, v)
        _write_varint(_tag(num, _LEN), out)
        _write_varint(len(body), out)
        out.write(body)
    else:  # pragma: no cover
        raise ValueError(f"cannot encode kind {kind!r}")


def encode_message(schema: Any, record: dict | None) -> bytes:
    """One record dict -> protobuf wire bytes (no framing).

    Presence rules (proto3): a ``None`` value or absent key is never
    written; a default-valued scalar on a field WITHOUT
    ``"optional": True`` is omitted (implicit presence); with
    ``"optional": True`` it is written explicitly. Repeated numeric
    scalars pack; strings/bytes/messages repeat unpacked. Maps are
    repeated ``(key=1, value=2)`` entry messages."""
    schema = _norm(schema)
    out = io.BytesIO()
    if record is None:
        return b""
    for f in schema["fields"]:
        v = record.get(f["name"])
        if v is None:
            continue
        _encode_field(f, v, out)
    return out.getvalue()


# ------------------------------------------------------------------ decode


def _skip(wire: int, buf: memoryview, pos: int) -> int:
    """Skip an unknown field wire-type-correctly (the schema-evolution
    path: writer-only field numbers must not desync the walk).
    Deprecated groups (SGROUP/EGROUP) are skipped with depth
    counting."""
    if wire == _VARINT:
        _, pos = _read_varint(buf, pos)
        return pos
    if wire == _I64:
        if pos + 8 > len(buf):
            raise ValueError("truncated i64")
        return pos + 8
    if wire == _I32:
        if pos + 4 > len(buf):
            raise ValueError("truncated i32")
        return pos + 4
    if wire == _LEN:
        ln, pos = _read_varint(buf, pos)
        if pos + ln > len(buf):
            raise ValueError("truncated LEN payload")
        return pos + ln
    if wire == _SGROUP:
        depth = 1
        while depth:
            tag, pos = _read_varint(buf, pos)
            w = tag & 7
            if w == _SGROUP:
                depth += 1
            elif w == _EGROUP:
                depth -= 1
            else:
                pos = _skip(w, buf, pos)
        return pos
    raise ValueError(f"invalid wire type {wire}")


def _decode_scalar(t: str, wire: int, buf: memoryview,
                   pos: int) -> tuple[Any, int]:
    if t in _VARINT_TYPES:
        if wire != _VARINT:
            raise ValueError(f"wire type {wire} for varint field")
        u, pos = _read_varint(buf, pos)
        if t == "bool":
            return bool(u), pos
        if t in ("sint32", "sint64"):
            v = _unzigzag(u)
        elif t in ("int32", "int64"):
            v = u - (1 << 64) if u >= 1 << 63 else u
        else:  # uint32 / uint64 / enum index
            v = u - (1 << 64) if t == "uint64" and u >= 1 << 63 else u
        if t.endswith("32"):
            # int32 values are sign-extended on the wire; fold back
            v = ((v + (1 << 31)) % (1 << 32)) - (1 << 31) \
                if t in ("int32", "sint32") else v & 0xFFFFFFFF
        return v, pos
    if t in _I64_TYPES:
        if wire != _I64 or pos + 8 > len(buf):
            raise ValueError("bad i64 field")
        raw = bytes(buf[pos:pos + 8])
        pos += 8
        if t == "double":
            return _struct.unpack("<d", raw)[0], pos
        if t == "sfixed64":
            return _struct.unpack("<q", raw)[0], pos
        return _wrap64(_struct.unpack("<Q", raw)[0]), pos
    if t in _I32_TYPES:
        if wire != _I32 or pos + 4 > len(buf):
            raise ValueError("bad i32 field")
        raw = bytes(buf[pos:pos + 4])
        pos += 4
        if t == "float":
            return _struct.unpack("<f", raw)[0], pos
        return _struct.unpack("<i" if t == "sfixed32" else "<I", raw)[0], pos
    # LEN: string / bytes
    if wire != _LEN:
        raise ValueError(f"wire type {wire} for LEN field")
    ln, pos = _read_varint(buf, pos)
    if pos + ln > len(buf):
        raise ValueError("truncated LEN payload")
    raw = bytes(buf[pos:pos + ln])
    pos += ln
    return (raw.decode("utf-8") if t == "string" else raw), pos


def _wrap64(u: int) -> int:
    """uint64 -> LongType two's-complement wrap (see
    :func:`proto_schema_to_spark`)."""
    return u - (1 << 64) if u >= 1 << 63 else u


_PACKABLE_WIRES = {_VARINT, _I64, _I32}


def _scalar_default(t: str) -> Any:
    if t == "bool":
        return False
    if t == "string":
        return ""
    if t == "bytes":
        return b""
    if t in ("float", "double"):
        return 0.0
    return 0


def decode_message(schema: Any, payload: bytes) -> dict:
    """Protobuf wire bytes -> record dict.

    Spec-mandated laxities honored: unknown field numbers skipped,
    duplicated singular fields keep the LAST value, repeated scalars
    accept both packed and unpacked encodings (and concatenate),
    nested messages on a duplicated singular field MERGE
    (last-WIRE-PRESENT-field-wins per inner field — a default filled
    for an absent field never overwrites an earlier present value).
    Presence: absent singular scalars decode to the proto3 default
    unless the field is marked ``"optional": True`` (explicit
    presence -> ``None``); absent messages -> ``None``; absent
    repeated/map -> empty."""
    schema = _norm(schema)
    return _fill(schema, _decode_present(schema, memoryview(payload)))


def _decode_present(schema: Any, buf: memoryview) -> dict:
    """The wire walk: returns ONLY wire-present fields (nested message
    values are present-only dicts too) so duplicate-message merge can
    distinguish present from default — defaults land in :func:`_fill`."""
    by_num = {f["number"]: f for f in schema["fields"]}
    pos = 0
    out: dict[str, Any] = {}
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        num, wire = tag >> 3, tag & 7
        if num == 0:
            raise ValueError("field number 0 is invalid")
        f = by_num.get(num)
        if f is None:
            pos = _skip(wire, buf, pos)
            continue
        kind, detail = _field_kind(f)
        name = f["name"]
        if f.get("repeated") and kind != "map":
            lst = out.setdefault(name, [])
            if (
                kind == "scalar"
                and detail not in _LEN_TYPES
                and wire == _LEN
            ):
                # packed run
                ln, pos = _read_varint(buf, pos)
                end = pos + ln
                if end > len(buf):
                    raise ValueError("truncated packed run")
                w = _scalar_wire(detail)
                while pos < end:
                    v, pos = _decode_scalar(detail, w, buf, pos)
                    lst.append(v)
                if pos != end:
                    raise ValueError("packed run overrun")
            else:
                v, pos = _decode_one(kind, detail, wire, buf, pos)
                lst.append(v)
            continue
        if kind == "map":
            if wire != _LEN:
                raise ValueError("map entry must be LEN")
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            if end > len(buf):
                raise ValueError("truncated map entry")
            k, v = _decode_map_entry(detail, buf[pos:end])
            pos = end
            out.setdefault(name, {})[k] = v
            continue
        v, pos = _decode_one(kind, detail, wire, buf, pos)
        if kind == "message" and isinstance(out.get(name), dict):
            # spec: duplicated embedded messages merge — v holds only
            # wire-present inner fields, so a plain update is exactly
            # last-present-wins
            merged = dict(out[name])
            merged.update(v)
            out[name] = merged
        else:
            out[name] = v  # last one wins
    return out


def _fill(schema: Any, present: dict) -> dict:
    """Presence-aware defaults over a present-only dict (recursing
    into nested messages, repeated messages and message-valued
    maps)."""
    out: dict[str, Any] = {}
    for f in schema["fields"]:
        name = f["name"]
        kind, detail = _field_kind(f)
        if f.get("repeated") and kind != "map":
            items = present.get(name, [])
            out[name] = (
                [_fill(detail, it) for it in items]
                if kind == "message"
                else items
            )
        elif kind == "map":
            entries = present.get(name, {})
            val_t = detail["value"]
            if isinstance(val_t, dict) and "message" in val_t:
                vs = _norm(val_t["message"])
                out[name] = {
                    k: (None if v is None else _fill(vs, v))
                    for k, v in entries.items()
                }
            else:
                out[name] = entries
        elif kind == "message":
            v = present.get(name)
            out[name] = None if v is None else _fill(detail, v)
        elif name in present:
            out[name] = present[name]
        elif f.get("optional"):
            out[name] = None
        elif kind == "enum":
            out[name] = detail["symbols"][0]
        else:
            out[name] = _scalar_default(detail)
    return out


def _decode_one(
    kind: str, detail: Any, wire: int, buf: memoryview, pos: int
) -> tuple[Any, int]:
    if kind == "scalar":
        return _decode_scalar(detail, wire, buf, pos)
    if kind == "enum":
        u, pos = _read_varint(buf, pos)
        symbols = detail["symbols"]
        # unknown enum numbers survive as their integer (proto3 open
        # enums) rendered to a string so the column type stays stable
        return (symbols[u] if 0 <= u < len(symbols) else str(u)), pos
    # message
    if wire != _LEN:
        raise ValueError("message field must be LEN")
    ln, pos = _read_varint(buf, pos)
    end = pos + ln
    if end > len(buf):
        raise ValueError("truncated message field")
    rec = _decode_present(detail, buf[pos:end])
    return rec, end


def _decode_map_entry(detail: dict, buf: memoryview) -> tuple[Any, Any]:
    key_t = detail["key"]
    val_field = {"name": "value", "number": 2, "type": detail["value"]}
    vk, vd = _field_kind(val_field)
    k: Any = _scalar_default(key_t)
    v: Any = None
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        num, wire = tag >> 3, tag & 7
        if num == 1:
            k, pos = _decode_scalar(key_t, wire, buf, pos)
        elif num == 2:
            v, pos = _decode_one(vk, vd, wire, buf, pos)
        else:
            pos = _skip(wire, buf, pos)
    if v is None and vk == "scalar":
        v = _scalar_default(vd)
    elif v is None and vk == "enum":
        v = vd["symbols"][0]
    return k, v


# ----------------------------------------------------------------- framing


def encode_frame(schema_id: int, message_indexes: list[int] | None) -> bytes:
    """Confluent protobuf frame: magic 0x00 + 4-byte BE schema id +
    message-indexes array (zigzag varint count, zigzag varint values;
    ``[0]`` optimizes to the single byte 0x00)."""
    out = io.BytesIO()
    out.write(b"\x00")
    out.write(schema_id.to_bytes(4, "big"))
    idx = message_indexes if message_indexes is not None else [0]
    if idx == [0]:
        out.write(b"\x00")
    else:
        _write_varint(_zigzag(len(idx)) & 0xFFFFFFFFFFFFFFFF, out)
        for i in idx:
            _write_varint(_zigzag(i) & 0xFFFFFFFFFFFFFFFF, out)
    return out.getvalue()


def decode_frame(payload: bytes) -> tuple[int, list[int], int]:
    """-> (schema_id, message_indexes, body_offset). Raises on a bad
    frame (wrong magic, truncated id/indexes)."""
    if len(payload) < _FRAME_LEN + 1 or payload[0] != 0:
        raise ValueError("bad Confluent protobuf frame")
    sid = int.from_bytes(payload[1:_FRAME_LEN], "big")
    buf = memoryview(payload)
    n, pos = _read_varint(buf, _FRAME_LEN)
    n = _unzigzag(n)
    if n == 0:
        return sid, [0], pos
    if n < 0 or n > 128:
        raise ValueError("bad message-indexes count")
    idx = []
    for _ in range(n):
        u, pos = _read_varint(buf, pos)
        idx.append(_unzigzag(u))
    return sid, idx, pos


# ------------------------------------------------------------ column codecs


def _decode_column(
    raw: Column,
    schema: Any,
    spark_type: T.StructType,
    *,
    confluent_framing: bool,
) -> tuple[Column, Column]:
    """binary column -> (decoded struct column, bad flag column)."""
    schema_json = json.dumps(_norm(schema))
    from pyspark.sql.functions import pandas_udf

    out_type = T.StructType(
        [
            T.StructField("rec", spark_type, nullable=True),
            T.StructField("bad", T.BooleanType(), nullable=False),
        ]
    )

    @pandas_udf(returnType=out_type)
    def dec(s: pd.Series) -> pd.DataFrame:
        sch = _norm(schema_json)
        recs, bads = [], []
        for payload in s:
            if payload is None:
                recs.append(None)
                bads.append(False)
                continue
            try:
                b = bytes(payload)
                if confluent_framing:
                    _, _, off = decode_frame(b)
                    b = b[off:]
                recs.append(decode_message(sch, b))
                bads.append(False)
            except Exception:
                recs.append(None)
                bads.append(True)
        return pd.DataFrame({"rec": recs, "bad": bads})

    d = dec(raw)
    return d.getField("rec"), d.getField("bad")


def envelope_from_protobuf(
    raw: DataFrame,
    *,
    value_schema: Any,
    key_schema: Any | None = None,
    key_col: str = "key",
    value_col: str = "value",
    confluent_framing: bool = False,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Raw protobuf-bytes stream -> typed envelope.

    ``raw`` needs ``value`` (protobuf wire bytes; null = tombstone)
    and optionally ``key``/``topic``/``partition``/``timestamp``/
    ``headers`` — missing envelope slots get the JSON-boundary
    defaults. Schemas are message dicts (or their JSON), see
    :func:`proto_schema_to_spark`.

    With ``confluent_framing=True`` the magic + schema id +
    message-indexes frame is validated + stripped and the schema id
    survives as a ``proto_schema_id`` passthrough column. Schema
    evolution needs no writer-schema snapshot: the proto wire contract
    (field numbers + wire-typed skip) resolves it in the codec itself.

    Malformed payloads (bad frame, truncated varint, wire-type
    mismatch, packed-run overrun) set the per-record error column with
    the converter ``SERIALIZATION_ERROR`` message — the engine
    batch-fail gate turns the first one into ``DataException``."""
    value_schema = _norm(value_schema)
    spark_value = proto_schema_to_spark(value_schema)
    cols = dict.fromkeys(raw.columns)

    value_expr, value_bad = _decode_column(
        F.col(value_col), value_schema, spark_value,
        confluent_framing=confluent_framing,
    )
    if key_col in cols and key_schema is not None:
        key_schema = _norm(key_schema)
        key_expr, key_bad = _decode_column(
            F.col(key_col), key_schema, proto_schema_to_spark(key_schema),
            confluent_framing=confluent_framing,
        )
    elif key_col in cols:
        key_expr = F.col(key_col).cast("string")
        key_bad = F.lit(False)
    else:
        key_expr = F.lit(None).cast("string")
        key_bad = F.lit(False)

    extra = list(passthrough or [])
    env = raw.select(
        (F.col("topic") if "topic" in cols else F.lit("proto_topic")).alias(
            "topic"
        ),
        (
            F.col("partition").cast("int")
            if "partition" in cols
            else F.lit(0).cast("int")
        ).alias("partition"),
        key_expr.alias("key"),
        value_expr.alias("value"),
        (
            F.col("timestamp").cast("long")
            if "timestamp" in cols
            else F.lit(None).cast("long")
        ).alias("timestamp"),
        (
            F.col("headers")
            if "headers" in cols
            else F.lit(None).cast(T.MapType(T.StringType(), T.StringType()))
        ).alias("headers"),
        (value_bad | key_bad).alias("__proto_bad"),
        *(
            [
                F.when(
                    F.col(value_col).isNotNull(),
                    F.conv(F.hex(F.substring(F.col(value_col), 2, 4)), 16, 10)
                    .cast("long"),
                ).alias("proto_schema_id")
            ]
            if confluent_framing
            else []
        ),
        *[F.col(c) for c in extra if c in cols],
    )
    env = ensure_error_col(env)
    env = merge_error(
        env,
        F.col("__proto_bad"),
        F.lit(SERIALIZATION_ERROR + "invalid protobuf payload"),
    )
    return env.drop("__proto_bad")


def envelope_to_protobuf(
    env: DataFrame,
    *,
    value_schema: Any,
    key_schema: Any | None = None,
    confluent_framing: bool = False,
    schema_id: int = 1,
    message_indexes: list[int] | None = None,
) -> DataFrame:
    """Typed envelope -> raw protobuf-wire columns (serialize
    direction). Tombstones stay null. Scalar keys pass through as
    UTF-8 bytes when no ``key_schema`` is given."""
    value_schema = _norm(value_schema)

    def enc_col(col: Column, schema: Any) -> Column:
        from pyspark.sql.functions import pandas_udf

        schema_json = json.dumps(schema)
        frame = (
            encode_frame(schema_id, message_indexes)
            if confluent_framing
            else b""
        )

        def _clean(v: Any) -> Any:
            # Arrow hands struct columns to pandas UDFs with NaN for
            # null float fields; fold NaN -> None so implicit-presence
            # fields omit instead of writing NaN (same contract the
            # Avro boundary documents)
            if v is pd.NaT:
                return None
            if isinstance(v, pd.Timestamp):
                return v.to_pydatetime()
            if isinstance(v, float) and math.isnan(v):
                return None
            if isinstance(v, dict):
                return {k: _clean(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [_clean(x) for x in v]
            return v

        @pandas_udf(returnType=T.BinaryType())
        def enc(s: pd.Series) -> pd.Series:
            sch = _norm(schema_json)
            recs = (
                s.to_dict("records")
                if isinstance(s, pd.DataFrame)
                else list(s)
            )
            return pd.Series(
                [
                    None
                    if r is None
                    else frame + encode_message(sch, _clean(r))
                    for r in recs
                ],
                dtype=object,
            )

        return F.when(col.isNotNull(), enc(col))

    if key_schema is not None:
        key_expr = enc_col(F.col("key"), _norm(key_schema))
    else:
        key_expr = F.col("key").cast("string").cast("binary")
    return env.select(
        "topic",
        "partition",
        key_expr.alias("key"),
        enc_col(F.col("value"), value_schema).alias("value"),
        "timestamp",
        "headers",
    )


def spark_to_proto_schema(dt: T.DataType, name: str = "m") -> dict:
    """Spark struct type -> message schema dict (the serialize
    direction's default writer schema). Every field gets explicit
    presence (proto3 ``optional``) so nullability round-trips
    faithfully; numbers are assigned in field order starting at 1 —
    stable as long as the struct is (the usual proto-evolution caveat:
    append new columns, don't reorder)."""
    if not isinstance(dt, T.StructType):
        raise ValueError("top-level proto schema must be a struct")

    def conv(t: T.DataType, nm: str) -> Any:
        if isinstance(t, T.StructType):
            return {"message": spark_to_proto_schema(t, nm)}
        if isinstance(t, T.ArrayType):
            inner = conv(t.elementType, nm + "_item")
            return {"repeated_of": inner}
        if isinstance(t, T.MapType):
            if not isinstance(t.keyType, T.StringType):
                raise ValueError("proto map keys must be strings here")
            return {"map": {"key": "string",
                            "value": conv(t.valueType, nm + "_val")}}
        scalar = {
            T.LongType(): "int64",
            T.IntegerType(): "int32",
            T.ShortType(): "int32",
            T.ByteType(): "int32",
            T.StringType(): "string",
            T.BooleanType(): "bool",
            T.DoubleType(): "double",
            T.FloatType(): "float",
            T.BinaryType(): "bytes",
        }.get(t)
        if scalar is None:
            raise ValueError(f"no proto mapping for Spark type {t}")
        return scalar

    fields = []
    for i, f in enumerate(dt.fields, start=1):
        t = conv(f.dataType, name + "_" + f.name)
        entry: dict[str, Any] = {"name": f.name, "number": i}
        if isinstance(t, dict) and "repeated_of" in t:
            entry["type"] = t["repeated_of"]
            entry["repeated"] = True
        else:
            entry["type"] = t
            if isinstance(t, str):
                entry["optional"] = True
        fields.append(entry)
    return {"name": name, "fields": fields}
