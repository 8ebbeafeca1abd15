"""Avro bytes ↔ struct converter boundary (reference AvroConverter
analog — the schema-ful half of the converter contract).

The reference's SMT chains run behind Kafka Connect converters
(reference README.md usage; IntegrationTest.java wires JsonConverter —
production Aiven/Confluent deployments overwhelmingly use
AvroConverter + schema registry for the schema-ful regime, SURVEY.md
§1.2). ``json_boundary`` closed the schemaless half; this module closes
the schema-ful half: raw Avro-binary key/value payloads become the
typed envelope the operators consume, and an envelope serializes back
to Avro bytes for a bytes-oriented sink.

Two execution paths, same semantics (the Iceberg-sink gating pattern):

* **JVM path** — when the ``spark-avro`` module is on the classpath
  (it ships with every real Spark distribution; absent from this
  sandbox's pip build), ``from_avro``/``to_avro`` run the whole decode
  inside codegen — zero Python. Detected at runtime, preferred
  automatically.
* **Arrow-batched Python codec** — a spec-complete Avro binary
  decoder/encoder (Avro 1.12 spec §Binary Encoding: zigzag varints,
  length-prefixed strings/bytes, block-encoded arrays/maps, union
  branch indexes) applied per Arrow batch through ``pandas_udf``. The
  per-record byte walk is inherently sequential, but batches move via
  Arrow and the loop touches only the bytes column — this is the
  sandbox-verified fallback, proven byte-identical to the spec by
  golden-bytes tests (tests/test_avro_boundary.py).

Confluent wire framing: schema-registry payloads prefix the Avro body
with 1 magic byte (0x00) + a 4-byte big-endian schema id
(public Confluent wire-format doc). ``confluent_framing=True`` strips
and validates the frame on decode and re-adds it on encode; the schema
id survives as a passthrough column for registry-aware routing.

Error contract matches the JSON boundary (SURVEY.md §4.3): a non-null
payload that fails to decode sets the per-record error column with the
converter ``SERIALIZATION_ERROR`` message; the engine's batch-fail gate
raises ``DataException`` before anything commits. Null payloads are
tombstones, never errors.
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import math
import struct as _struct
from decimal import Decimal, localcontext
from typing import Any

import pandas as pd

#: decimal contexts default to 28 significant digits — far below the
#: 38 the Spark mapping advertises; all unscaled-int conversions run
#: under this precision so high-precision NUMERIC values never round
_DECIMAL_PREC = 80

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

_PRIMITIVE_SPARK = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def _norm(schema: Any) -> Any:
    """Avro schemas appear as JSON strings, bare type-name strings, or
    dicts; normalize to dict/list/str form."""
    if isinstance(schema, str):
        s = schema.strip()
        if s.startswith("{") or s.startswith("["):
            return json.loads(s)
        return s
    return schema


def avro_schema_to_spark(schema: Any) -> T.DataType:
    """Map an Avro schema to the Spark type the decoder produces.

    Unions must be ``["null", T]`` (the nullable idiom — multi-branch
    unions have no stable columnar shape and are rejected loudly).
    ``enum`` -> string, ``fixed`` -> binary. Logical types with a
    faithful Spark analog map to it — ``decimal`` -> DecimalType
    (Debezium's money/NUMERIC columns), ``date`` -> DateType,
    ``timestamp-millis``/``timestamp-micros`` -> TimestampType; other
    logical types (time-*, uuid, duration) ride their underlying
    primitive."""
    schema = _norm(schema)
    if isinstance(schema, str):
        if schema in _PRIMITIVE_SPARK:
            return _PRIMITIVE_SPARK[schema]
        raise ValueError(f"unsupported avro type: {schema!r}")
    if isinstance(schema, list):  # union
        non_null = [s for s in schema if _norm(s) != "null"]
        if len(non_null) != 1:
            raise ValueError(
                "only nullable unions ['null', T] are supported, got "
                f"{schema!r}"
            )
        return avro_schema_to_spark(non_null[0])
    t = schema["type"]
    lt = schema.get("logicalType")
    if lt == "decimal" and t in ("bytes", "fixed"):
        return T.DecimalType(schema.get("precision", 38), schema.get("scale", 0))
    if lt == "date" and t == "int":
        return T.DateType()
    if lt in ("timestamp-millis", "timestamp-micros") and t == "long":
        return T.TimestampType()
    if t == "record":
        return T.StructType(
            [
                T.StructField(
                    f["name"], avro_schema_to_spark(f["type"]), nullable=True
                )
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(avro_schema_to_spark(schema["items"]))
    if t == "map":
        return T.MapType(T.StringType(), avro_schema_to_spark(schema["values"]))
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    if t in _PRIMITIVE_SPARK or isinstance(t, (dict, list)):
        # {"type": "long", "logicalType": ...} wrapper form
        return avro_schema_to_spark(t)
    raise ValueError(f"unsupported avro type: {schema!r}")


# ------------------------------------------------------------- binary codec
# Avro spec, Binary Encoding section (public): ints/longs are
# zigzag-varint; strings/bytes are length-prefixed; float/double are
# IEEE little-endian; arrays/maps are blocks terminated by count 0;
# unions are a varint branch index then the value; enums are the varint
# symbol index; fixed is raw width bytes.


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    return (acc >> 1) ^ -(acc & 1), pos


def _encode(schema: Any, val: Any, out: io.BytesIO, tz=None) -> None:
    schema = _norm(schema)
    if isinstance(schema, list):  # nullable union
        non_null = [s for s in schema if _norm(s) != "null"]
        if len(non_null) != 1 or len(schema) > 2:
            # the decode direction rejects these loudly in
            # avro_schema_to_spark; the encoder must not corrupt
            # silently either (branch-index arithmetic below assumes
            # exactly ['null', T])
            raise ValueError(
                f"only nullable unions ['null', T] are supported, got "
                f"{schema!r}"
            )
        null_idx = 0 if _norm(schema[0]) == "null" else 1
        if val is None:
            out.write(_zigzag_encode(null_idx))
        else:
            out.write(_zigzag_encode(1 - null_idx))
            _encode(non_null[0], val, out, tz)
        return
    t = schema if isinstance(schema, str) else schema["type"]
    lt = schema.get("logicalType") if isinstance(schema, dict) else None
    if isinstance(t, (dict, list)):
        _encode(t, val, out, tz)
    elif t == "null":
        pass
    elif t == "boolean":
        out.write(b"\x01" if val else b"\x00")
    elif t in ("int", "long"):
        if lt == "date" and isinstance(val, _dt.date):
            val = (val - _dt.date(1970, 1, 1)).days
        elif lt in ("timestamp-millis", "timestamp-micros") and isinstance(
            val, _dt.datetime
        ):
            # naive datetimes are wall time in `tz` (the Spark session
            # zone when called through the boundary; UTC for the bare
            # codec); aware datetimes carry their own offset
            if val.tzinfo is None:
                val = val.replace(tzinfo=tz or _dt.timezone.utc)
            us_epoch = val.astimezone(_dt.timezone.utc) - _dt.datetime(
                1970, 1, 1, tzinfo=_dt.timezone.utc
            )
            us = (us_epoch.days * 86_400_000_000
                  + us_epoch.seconds * 1_000_000 + us_epoch.microseconds)
            val = us // 1000 if lt == "timestamp-millis" else us
        out.write(_zigzag_encode(int(val)))
    elif t == "float":
        out.write(_struct.pack("<f", float(val)))
    elif t == "double":
        out.write(_struct.pack("<d", float(val)))
    elif t == "string":
        b = str(val).encode("utf-8")
        out.write(_zigzag_encode(len(b)))
        out.write(b)
    elif t in ("bytes", "fixed"):
        if lt == "decimal":
            d = val if isinstance(val, Decimal) else Decimal(str(val))
            with localcontext() as ctx:
                ctx.prec = _DECIMAL_PREC
                scaled = d.scaleb(schema.get("scale", 0))
            if scaled != scaled.to_integral_value():
                # Avro spec: a value that does not fit the declared
                # scale is a serialization error, never silent rounding
                raise ValueError(
                    f"decimal {d} does not fit scale "
                    f"{schema.get('scale', 0)}"
                )
            unscaled = int(scaled)
            width = max(1, (unscaled.bit_length() + 8) // 8)
            if t == "fixed":
                width = schema["size"]
            b = unscaled.to_bytes(width, "big", signed=True)
        else:
            b = bytes(val)
        if t == "fixed":
            if len(b) != schema["size"]:
                raise ValueError("fixed size mismatch")
            out.write(b)
        else:
            out.write(_zigzag_encode(len(b)))
            out.write(b)
    elif t == "enum":
        out.write(_zigzag_encode(schema["symbols"].index(val)))
    elif t == "record":
        for f in schema["fields"]:
            fv = val.get(f["name"]) if isinstance(val, dict) else val[f["name"]]
            _encode(f["type"], fv, out, tz)
    elif t == "array":
        items = list(val)
        if items:
            out.write(_zigzag_encode(len(items)))
            for item in items:
                _encode(schema["items"], item, out, tz)
        out.write(b"\x00")
    elif t == "map":
        entries = list(val.items()) if isinstance(val, dict) else list(val)
        if entries:
            out.write(_zigzag_encode(len(entries)))
            for k, v in entries:
                _encode("string", k, out)
                _encode(schema["values"], v, out, tz)
        out.write(b"\x00")
    else:
        raise ValueError(f"unsupported avro type: {schema!r}")


def _decode(schema: Any, buf: memoryview, pos: int, tz=None) -> tuple[Any, int]:
    schema = _norm(schema)
    if isinstance(schema, list):  # nullable union
        idx, pos = _zigzag_decode(buf, pos)
        branch = _norm(schema[idx])
        if branch == "null":
            return None, pos
        return _decode(branch, buf, pos, tz)
    t = schema if isinstance(schema, str) else schema["type"]
    lt = schema.get("logicalType") if isinstance(schema, dict) else None
    if isinstance(t, (dict, list)):
        return _decode(t, buf, pos, tz)
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        v, pos = _zigzag_decode(buf, pos)
        if lt == "date":
            return _dt.date(1970, 1, 1) + _dt.timedelta(days=v), pos
        if lt in ("timestamp-millis", "timestamp-micros"):
            us = v * 1000 if lt == "timestamp-millis" else v
            utc = _dt.datetime(
                1970, 1, 1, tzinfo=_dt.timezone.utc
            ) + _dt.timedelta(microseconds=us)
            # hand back naive wall time in `tz` (the Spark session zone
            # through the boundary; UTC for the bare codec) — exactly
            # what Spark's TimestampType conversion expects
            return utc.astimezone(tz or _dt.timezone.utc).replace(
                tzinfo=None
            ), pos
        return v, pos
    if t == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "string":
        n, pos = _zigzag_decode(buf, pos)
        return str(buf[pos : pos + n], "utf-8"), pos + n
    if t in ("bytes", "fixed"):
        if t == "fixed":
            n = schema["size"]
        else:
            n, pos = _zigzag_decode(buf, pos)
        raw = bytes(buf[pos : pos + n])
        if lt == "decimal":
            # spec: unscaled two's-complement big-endian integer. The
            # default decimal context rounds at 28 significant digits —
            # far below the mapping's precision 38 — so widen it.
            unscaled = int.from_bytes(raw, "big", signed=True) if raw else 0
            with localcontext() as ctx:
                ctx.prec = _DECIMAL_PREC
                return (
                    Decimal(unscaled).scaleb(-schema.get("scale", 0)),
                    pos + n,
                )
        return raw, pos + n
    if t == "enum":
        i, pos = _zigzag_decode(buf, pos)
        return schema["symbols"][i], pos
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode(f["type"], buf, pos, tz)
        return rec, pos
    if t == "array":
        out = []
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with byte-size prefix
                n = -n
                _, pos = _zigzag_decode(buf, pos)
            for _i in range(n):
                item, pos = _decode(schema["items"], buf, pos, tz)
                out.append(item)
    if t == "map":
        out = {}
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                n = -n
                _, pos = _zigzag_decode(buf, pos)
            for _i in range(n):
                k, pos = _decode("string", buf, pos)
                out[k], pos = _decode(schema["values"], buf, pos, tz)
    raise ValueError(f"unsupported avro type: {schema!r}")


def encode_record(schema: Any, record: dict, tz=None) -> bytes:
    """One record dict -> Avro binary body (no framing). ``tz``: the
    zone naive datetimes are wall time in (default UTC)."""
    out = io.BytesIO()
    _encode(_norm(schema), record, out, tz)
    return out.getvalue()


# ------------------------------------------------------- schema resolution
# Avro spec, Schema Resolution section (public): reader/writer field
# match by name; writer-only fields are skipped; reader-only fields take
# their default (or the null branch of a nullable union); numeric
# promotions int->long->float->double are allowed.

_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "string": {"string"},
    "bytes": {"bytes"},
    "boolean": {"boolean"},
    "double": {"double"},
    "null": {"null"},
}


def _base_type(schema: Any) -> str:
    schema = _norm(schema)
    if isinstance(schema, list):
        non_null = [s for s in schema if _norm(s) != "null"]
        return _base_type(non_null[0]) if non_null else "null"
    if isinstance(schema, dict):
        t = schema["type"]
        return t if isinstance(t, str) else _base_type(t)
    return schema


def _logical_of(schema: Any) -> str | None:
    schema = _norm(schema)
    if isinstance(schema, list):
        non_null = [s for s in schema if _norm(s) != "null"]
        return _logical_of(non_null[0]) if non_null else None
    if isinstance(schema, dict):
        return schema.get("logicalType")
    return None


def _promote(value: Any, writer: Any, reader: Any) -> Any:
    if value is None:
        return None
    # logicalType KIND disagreement is a resolution ERROR, not a
    # pass-through: a plain epoch long flowing into a timestamp-typed
    # reader field (or a date object into an int field) would land
    # silently wrong — or crash the whole Arrow batch instead of
    # marking one record bad. Same-kind differences (timestamp-millis
    # vs -micros, decimal scale changes) are fine: both sides decode to
    # the same Python type.
    kinds = {"decimal": "decimal", "date": "date",
             "timestamp-millis": "ts", "timestamp-micros": "ts"}
    wk = kinds.get(_logical_of(writer))
    rk = kinds.get(_logical_of(reader))
    if wk != rk:
        raise ValueError(
            f"logicalType mismatch in schema resolution: writer kind "
            f"{wk!r} vs reader kind {rk!r}"
        )
    if wk is not None:
        return value  # same logical kind: already the right Python type
    wt, rt = _base_type(writer), _base_type(reader)
    if wt == rt:
        return value
    if rt not in _PROMOTIONS.get(wt, ()):  # pragma: no cover - guarded upstream
        raise ValueError(f"cannot promote {wt} -> {rt}")
    return float(value) if rt in ("float", "double") else int(value)


def _reader_default(field: dict) -> Any:
    if "default" in field:
        return field["default"]
    t = _norm(field["type"])
    if isinstance(t, list) and any(_norm(b) == "null" for b in t):
        return None
    raise ValueError(
        f"reader field {field['name']!r} absent from writer schema and "
        "has no default (Avro schema-resolution error)"
    )


def _unwrap_nullable(schema: Any) -> Any:
    schema = _norm(schema)
    if isinstance(schema, list):
        return next((_norm(b) for b in schema if _norm(b) != "null"), "null")
    return schema


def _resolve_value(writer_t: Any, reader_t: Any, value: Any) -> Any:
    """Schema-resolve one VALUE: recurses through records, arrays and
    maps; primitives go through numeric promotion."""
    if value is None:
        return None
    wt, rt = _unwrap_nullable(writer_t), _unwrap_nullable(reader_t)
    w_kind, r_kind = _base_type(wt), _base_type(rt)
    if w_kind == "record" and r_kind == "record":
        return resolve_record(wt, rt, value)
    if w_kind == "array" and r_kind == "array":
        return [
            _resolve_value(wt["items"], rt["items"], item) for item in value
        ]
    if w_kind == "map" and r_kind == "map":
        items = value.items() if isinstance(value, dict) else value
        return {
            k: _resolve_value(wt["values"], rt["values"], v) for k, v in items
        }
    return _promote(value, wt, rt)


def resolve_record(
    writer_schema: Any, reader_schema: Any, record: dict
) -> dict:
    """Project a writer-decoded record onto the reader schema (Avro
    spec Schema Resolution: name match, reader defaults, numeric
    promotion; writer-only fields dropped). Resolution recurses through
    nested records AND records inside arrays/maps."""
    writer_schema, reader_schema = _norm(writer_schema), _norm(reader_schema)
    w_fields = {f["name"]: f for f in writer_schema["fields"]}
    out = {}
    for rf in reader_schema["fields"]:
        name = rf["name"]
        wf = w_fields.get(name)
        if wf is None:
            out[name] = _reader_default(rf)
            continue
        out[name] = _resolve_value(wf["type"], rf["type"], record.get(name))
    return out


def decode_record(schema: Any, payload: bytes, tz=None) -> dict:
    """Avro binary body -> record dict; raises on malformed/trailing
    bytes (the converter contract needs a loud decode failure).
    ``tz``: zone for naive timestamp wall times (default UTC)."""
    val, pos = _decode(_norm(schema), memoryview(payload), 0, tz)
    if pos != len(payload):
        raise ValueError(f"{len(payload) - pos} trailing bytes after record")
    return val


# ---------------------------------------------------------------- JVM probe

_JVM_AVRO: bool | None = None


def jvm_avro_available(spark) -> bool:
    """True when the spark-avro module is on the classpath (real Spark
    distributions ship it; the sandbox pip build does not)."""
    global _JVM_AVRO
    if _JVM_AVRO is None:
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.spark.sql.avro.AvroDataToCatalyst"
            )
            _JVM_AVRO = True
        except Exception:
            _JVM_AVRO = False
    return _JVM_AVRO


# ------------------------------------------------------------ column codecs

#: Confluent wire format: magic 0x00 + 4-byte big-endian schema id
_FRAME_LEN = 5


def _decode_column(
    raw: Column,
    schema: Any,
    spark_type: T.DataType,
    *,
    confluent_framing: bool,
    use_jvm: bool,
    writer_schemas: dict | None = None,
    schema_registry: Any | None = None,
    session_tz: str = "UTC",
) -> tuple[Column, Column]:
    """binary column -> (decoded struct column, bad flag column).

    With ``writer_schemas`` ({schema_id: avro schema}) or a
    ``schema_registry`` (:class:`~.schema_registry.SchemaRegistry` —
    id lookups run inside the decode workers, cached per id), each
    payload is decoded with the writer schema its Confluent frame
    names and resolved onto ``schema`` (the reader schema) per Avro
    schema-resolution rules — the evolving-topic contract."""
    schema = _norm(schema)
    if writer_schemas and schema_registry is not None:
        raise ValueError(
            "pass either writer_schemas (an id->schema snapshot) or "
            "schema_registry (a live lookup), not both"
        )
    if writer_schemas or schema_registry is not None:
        if not confluent_framing:
            raise ValueError(
                "writer-schema resolution requires "
                "confluent_framing=True (the frame's schema id selects "
                "the writer schema)"
            )
        if use_jvm:
            raise ValueError(
                "per-id writer-schema resolution runs on the Python "
                "codec path; pass use_jvm=False (the JVM from_avro "
                "expression takes a single static schema)"
            )
    body = raw
    frame_bad = F.lit(False)
    if confluent_framing:
        # >= _FRAME_LEN, not > : a record whose every field is null-typed
        # legally encodes to a ZERO-byte body, so the minimal framed
        # payload is exactly the 5 frame bytes
        frame_bad = raw.isNotNull() & (
            (F.length(raw) < _FRAME_LEN)
            | (F.substring(raw, 1, 1) != F.lit(b"\x00"))
        )
        if not writer_schemas and schema_registry is None:
            # binary substr is 1-based; Column.substr takes Column args
            # so the frame strip works for any source column
            body = F.when(
                ~frame_bad, raw.substr(F.lit(_FRAME_LEN + 1), F.length(raw))
            )
    if use_jvm:
        from pyspark.sql.avro.functions import from_avro

        decoded = from_avro(body, json.dumps(schema), {"mode": "PERMISSIVE"})
        bad = body.isNotNull() & decoded.isNull()
        return decoded, bad | frame_bad

    from pyspark.sql.functions import pandas_udf

    out_type = T.StructType(
        [
            T.StructField("rec", spark_type, nullable=True),
            T.StructField("bad", T.BooleanType(), nullable=False),
        ]
    )
    schema_json = json.dumps(schema) if not isinstance(schema, str) else schema
    writers_json = (
        {int(k): json.dumps(_norm(v)) for k, v in writer_schemas.items()}
        if writer_schemas
        else None
    )

    @pandas_udf(returnType=out_type)
    def dec(s: pd.Series) -> pd.DataFrame:
        from zoneinfo import ZoneInfo

        zone = ZoneInfo(session_tz)
        reader = _norm(schema_json)
        writers = (
            {k: _norm(v) for k, v in writers_json.items()}
            if writers_json
            else None
        )
        resolve_ids = writers is not None or schema_registry is not None
        cache: dict[int, dict] = {}

        def writer_for(sid: int) -> dict:
            """id -> writer schema: the snapshot dict, or the registry
            (one lookup per distinct id per worker — cached)."""
            if sid not in cache:
                if writers is not None:
                    if sid not in writers:
                        raise ValueError(f"unknown schema id {sid}")
                    cache[sid] = writers[sid]
                else:
                    try:
                        cache[sid] = _norm(schema_registry.get_by_id(sid))
                    except KeyError as e:
                        raise ValueError(f"unknown schema id {sid}") from e
            return cache[sid]

        recs, bads = [], []
        for payload in s:
            if payload is None:
                recs.append(None)
                bads.append(False)
                continue
            try:
                b = bytes(payload)
                if resolve_ids:
                    # frame validity is checked JVM-side; here we only
                    # need the id -> writer schema lookup
                    sid = int.from_bytes(b[1:_FRAME_LEN], "big")
                    writer = writer_for(sid)
                    rec = decode_record(writer, b[_FRAME_LEN:], tz=zone)
                    if writer != reader:
                        rec = resolve_record(writer, reader, rec)
                else:
                    rec = decode_record(reader, b, tz=zone)
                recs.append(rec)
                bads.append(False)
            except Exception:
                recs.append(None)
                bads.append(True)
        return pd.DataFrame({"rec": recs, "bad": bads})

    d = dec(body)
    return d.getField("rec"), d.getField("bad") | frame_bad


def envelope_from_avro(
    raw: DataFrame,
    *,
    value_schema: Any,
    key_schema: Any | None = None,
    key_col: str = "key",
    value_col: str = "value",
    confluent_framing: bool = False,
    use_jvm: bool | None = None,
    writer_schemas: dict | None = None,
    schema_registry: Any | None = None,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Raw Avro-bytes stream -> typed envelope.

    ``raw`` needs ``value`` (Avro binary; null = tombstone) and
    optionally ``key``/``topic``/``partition``/``timestamp``/
    ``headers`` — missing envelope slots get the JSON-boundary
    defaults. Schemas are Avro JSON (string or dict); no registry call
    happens here — resolve the writer schema upstream and pin it, the
    same way a Connect worker pins ``value.converter`` config.

    With ``confluent_framing=True`` the 5-byte registry frame is
    validated + stripped and the schema id survives as an
    ``avro_schema_id`` passthrough column.

    **Schema evolution**: ``writer_schemas`` ({schema_id: avro schema})
    decodes each VALUE payload with the writer schema its frame names
    and resolves it onto ``value_schema`` (the reader) per the Avro
    spec's schema-resolution rules — name match, reader defaults /
    nullable-null for added fields, writer-only fields dropped,
    int->long->float->double promotion. This is how a topic whose
    schema evolved mid-stream lands in ONE stable Spark type. Requires
    the Python codec path (a registryless snapshot of the registry's
    id->schema map; unknown ids follow the error contract).

    ``schema_registry`` is the LIVE alternative to the snapshot: any
    :class:`~.schema_registry.SchemaRegistry` (the Confluent-REST
    ``HttpSchemaRegistry``, the file-backed ``FileSchemaRegistry``, or
    your own). Lookups run inside the decode workers, cached per
    distinct id — the Connect consumer's client-side-cache shape.
    Mutually exclusive with ``writer_schemas``.

    Malformed payloads (bad frame, truncated varint, trailing bytes,
    unknown schema id) set the per-record error column with the
    converter ``SERIALIZATION_ERROR`` message — the engine batch-fail
    gate turns the first one into ``DataException``."""
    value_schema = _norm(value_schema)
    spark_value = avro_schema_to_spark(value_schema)
    if use_jvm is None:
        use_jvm = (
            jvm_avro_available(raw.sparkSession)
            and not writer_schemas
            and schema_registry is None
        )

    session_tz = raw.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    ) or "UTC"
    cols = dict.fromkeys(raw.columns)
    value_expr, value_bad = _decode_column(
        F.col(value_col),
        value_schema,
        spark_value,
        confluent_framing=confluent_framing,
        use_jvm=use_jvm,
        writer_schemas=writer_schemas,
        schema_registry=schema_registry,
        session_tz=session_tz,
    )
    if key_col in cols and key_schema is not None:
        # key and value converters frame independently but identically
        # (Connect's key.converter/value.converter are both
        # registry-backed when the topic is)
        key_schema = _norm(key_schema)
        key_expr, key_bad = _decode_column(
            F.col(key_col),
            key_schema,
            avro_schema_to_spark(key_schema),
            confluent_framing=confluent_framing,
            use_jvm=use_jvm,
            session_tz=session_tz,
        )
    elif key_col in cols:
        key_expr = F.col(key_col).cast("string")
        key_bad = F.lit(False)
    else:
        key_expr = F.lit(None).cast("string")
        key_bad = F.lit(False)

    extra = list(passthrough or [])
    env = raw.select(
        (F.col("topic") if "topic" in cols else F.lit("avro_topic")).alias(
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
        (value_bad | key_bad).alias("__avro_bad"),
        *(
            [
                F.when(
                    F.col(value_col).isNotNull(),
                    F.conv(F.hex(F.substring(F.col(value_col), 2, 4)), 16, 10)
                    .cast("long"),
                ).alias("avro_schema_id")
            ]
            if confluent_framing
            else []
        ),
        *[F.col(c) for c in extra if c in cols],
    )
    env = ensure_error_col(env)
    env = merge_error(
        env,
        F.col("__avro_bad"),
        F.lit(SERIALIZATION_ERROR + "invalid Avro payload"),
    )
    return env.drop("__avro_bad")


def envelope_to_avro(
    env: DataFrame,
    *,
    value_schema: Any,
    key_schema: Any | None = None,
    confluent_framing: bool = False,
    schema_id: int = 1,
    use_jvm: bool | None = None,
) -> DataFrame:
    """Typed envelope -> raw Avro-binary columns (serialize direction).
    Tombstones stay null. Scalar keys pass through as UTF-8 bytes when
    no ``key_schema`` is given."""
    value_schema = _norm(value_schema)
    if use_jvm is None:
        use_jvm = jvm_avro_available(env.sparkSession)
    session_tz = env.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    ) or "UTC"

    def enc_col(col: Column, schema: Any) -> Column:
        if use_jvm:
            from pyspark.sql.avro.functions import to_avro

            body = to_avro(col, json.dumps(schema))
        else:
            from pyspark.sql.functions import pandas_udf

            schema_json = json.dumps(schema)

            def _clean(v: Any) -> Any:
                # Arrow hands a struct column to a pandas UDF as a
                # DataFrame, losing None-vs-NaN for float fields; a
                # nullable Avro field must take the null branch for NaN
                # (a genuine NaN payload is not representable through
                # this fallback — the JVM path preserves it). Temporal
                # values arrive as pandas Timestamp/NaT — fold them to
                # stdlib datetimes for the codec's logical-type branch.
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
                # a struct column arrives as a DataFrame or (depending
                # on structHandlingMode) a Series of dicts — handle both
                from zoneinfo import ZoneInfo

                zone = ZoneInfo(session_tz)
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
                        else encode_record(sch, _clean(r), tz=zone)
                        for r in recs
                    ],
                    dtype=object,
                )

            body = enc(col)
        body = F.when(col.isNotNull(), body)
        if confluent_framing:
            frame = F.lit(b"\x00" + schema_id.to_bytes(4, "big"))
            body = F.when(col.isNotNull(), F.concat(frame, body))
        return body

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


def spark_to_avro_schema(dt: T.DataType, name: str = "record") -> dict:
    """Spark type -> nullable Avro schema (the serialize direction's
    default writer schema)."""

    def conv(t: T.DataType, nm: str) -> Any:
        if isinstance(t, T.StructType):
            return {
                "type": "record",
                "name": nm,
                "fields": [
                    {
                        "name": f.name,
                        "type": ["null", conv(f.dataType, nm + "_" + f.name)],
                    }
                    for f in t.fields
                ],
            }
        if isinstance(t, T.ArrayType):
            return {"type": "array", "items": ["null", conv(t.elementType, nm)]}
        if isinstance(t, T.MapType):
            return {"type": "map", "values": ["null", conv(t.valueType, nm)]}
        if isinstance(t, T.DecimalType):
            return {"type": "bytes", "logicalType": "decimal",
                    "precision": t.precision, "scale": t.scale}
        if isinstance(t, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
            return {"type": "long", "logicalType": "timestamp-micros"}
        m = {
            T.BooleanType: "boolean",
            T.IntegerType: "int",
            T.ShortType: "int",
            T.ByteType: "int",
            T.LongType: "long",
            T.FloatType: "float",
            T.DoubleType: "double",
            T.StringType: "string",
            T.BinaryType: "bytes",
        }
        for k, v in m.items():
            if isinstance(t, k):
                return v
        raise ValueError(f"no avro mapping for spark type {t}")

    return conv(dt, name)
