"""Property-based invariants (hypothesis) for the pure-Python protobuf
wire codec: encode/decode round-trip identity over arbitrary schemas +
records, decode-stability over unknown-field injection (the schema
evolution law), and the implicit-presence normalization law — no Spark
session needed."""

from __future__ import annotations

import io
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from transforms_for_apache_kafka_connect_spark.sources.protobuf_boundary import (
    _tag,
    _write_varint,
    decode_message,
    encode_message,
)

_RANGES = {
    "int32": (-(2**31), 2**31 - 1),
    "sint32": (-(2**31), 2**31 - 1),
    "sfixed32": (-(2**31), 2**31 - 1),
    "uint32": (0, 2**32 - 1),
    "fixed32": (0, 2**32 - 1),
    "int64": (-(2**63), 2**63 - 1),
    "sint64": (-(2**63), 2**63 - 1),
    "sfixed64": (-(2**63), 2**63 - 1),
    "uint64": (0, 2**63 - 1),  # above 2^63-1 wraps by design; see wrap law
    "fixed64": (-(2**63), 2**63 - 1),
}
_INTS = list(_RANGES)


def _scalar_value(t: str):
    if t in _RANGES:
        lo, hi = _RANGES[t]
        return st.integers(lo, hi)
    if t == "bool":
        return st.booleans()
    if t == "double":
        return st.floats(allow_nan=False, width=64)
    if t == "float":
        return st.floats(allow_nan=False, width=32)
    if t == "string":
        return st.text(max_size=20)
    return st.binary(max_size=20)  # bytes


_SCALARS = _INTS + ["bool", "double", "float", "string", "bytes"]


def _field_st(number: int, depth: int):
    scalar = st.sampled_from(_SCALARS)
    opts = [
        st.builds(
            lambda t, opt: {
                "name": f"f{number}",
                "number": number,
                "type": t,
                "optional": opt,
            },
            scalar,
            st.booleans(),
        ),
        st.builds(
            lambda t: {
                "name": f"f{number}",
                "number": number,
                "type": t,
                "repeated": True,
            },
            scalar,
        ),
        st.builds(
            lambda vt: {
                "name": f"f{number}",
                "number": number,
                "type": {"map": {"key": "string", "value": vt}},
            },
            st.sampled_from(["int64", "string", "double", "bool"]),
        ),
    ]
    if depth > 0:
        opts.append(
            st.builds(
                lambda sch: {
                    "name": f"f{number}",
                    "number": number,
                    "type": {"message": sch},
                },
                _schema_st(depth - 1),
            )
        )
    return st.one_of(opts)


def _schema_st(depth: int = 1):
    return st.builds(
        lambda fields: {"name": f"m{depth}", "fields": fields},
        st.lists(
            st.integers(1, 12), min_size=1, max_size=4, unique=True
        ).flatmap(
            lambda nums: st.tuples(
                *[_field_st(n, depth) for n in nums]
            ).map(list)
        ),
    )


def _record_st(schema: dict):
    parts = {}
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, dict) and "message" in t:
            v = st.one_of(st.none(), _record_st(t["message"]))
        elif isinstance(t, dict) and "map" in t:
            v = st.dictionaries(
                st.text(max_size=8), _scalar_value(t["map"]["value"]),
                max_size=4,
            )
        elif f.get("repeated"):
            v = st.lists(_scalar_value(t), max_size=4)
        else:
            v = st.one_of(st.none(), _scalar_value(t))
        parts[f["name"]] = v
    return st.fixed_dictionaries(parts)


def _normalize(schema: dict, rec: dict) -> dict:
    """What decode(encode(rec)) must return: implicit-presence scalars
    fold None/absent -> default AND default -> default; optional
    scalars keep None; floats go through IEEE-754 single precision for
    'float'; uint64/fixed64 wrap to two's complement."""
    out = {}
    for f in schema["fields"]:
        t = f["type"]
        name = f["name"]
        v = rec.get(name)
        if isinstance(t, dict) and "message" in t:
            out[name] = (
                None if v is None else _normalize(t["message"], v)
            )
        elif isinstance(t, dict) and "map" in t:
            out[name] = dict(v or {})
        elif f.get("repeated"):
            out[name] = [_coerce(t, x) for x in (v or [])]
        elif f.get("optional"):
            out[name] = None if v is None else _coerce(t, v)
        else:
            d = _default(t)
            out[name] = d if v is None else _coerce(t, v)
            if _coerce(t, out[name]) == d:
                out[name] = d
            else:
                out[name] = _coerce(t, out[name])
    return out


def _default(t: str):
    if t == "bool":
        return False
    if t == "string":
        return ""
    if t == "bytes":
        return b""
    if t in ("float", "double"):
        return 0.0
    return 0


def _coerce(t: str, v):
    import struct as _s

    if t == "float":
        return _s.unpack("<f", _s.pack("<f", v))[0]
    if t in ("uint64", "fixed64"):
        u = v & 0xFFFFFFFFFFFFFFFF
        return u - (1 << 64) if u >= 1 << 63 else u
    return v


@settings(max_examples=120, deadline=None)
@given(_schema_st(1).flatmap(lambda s: st.tuples(st.just(s), _record_st(s))))
def test_round_trip_identity(sr):
    schema, rec = sr
    wire = encode_message(schema, rec)
    assert decode_message(schema, wire) == _normalize(schema, rec)


@settings(max_examples=120, deadline=None)
@given(
    _schema_st(1).flatmap(lambda s: st.tuples(st.just(s), _record_st(s))),
)
def test_double_encode_is_stable(sr):
    # encode(decode(encode(x))) == encode(x): the codec is a
    # projection onto canonical wire form
    schema, rec = sr
    w1 = encode_message(schema, rec)
    w2 = encode_message(schema, decode_message(schema, w1))
    assert w1 == w2


@settings(max_examples=80, deadline=None)
@given(
    _schema_st(0).flatmap(lambda s: st.tuples(st.just(s), _record_st(s))),
    st.integers(13, 30),
    st.sampled_from(["varint", "i64", "i32", "len"]),
    st.binary(max_size=8),
)
def test_unknown_field_injection_is_invisible(sr, num, wire_kind, blob):
    # schema evolution law: appending any unknown field leaves the
    # decoded record unchanged (field numbers 13-30 are outside the
    # generated schemas' 1-12)
    schema, rec = sr
    wire = encode_message(schema, rec)
    extra = io.BytesIO()
    if wire_kind == "varint":
        _write_varint(_tag(num, 0), extra)
        _write_varint(12345, extra)
    elif wire_kind == "i64":
        _write_varint(_tag(num, 1), extra)
        extra.write(b"\x01" * 8)
    elif wire_kind == "i32":
        _write_varint(_tag(num, 5), extra)
        extra.write(b"\x02" * 4)
    else:
        _write_varint(_tag(num, 2), extra)
        _write_varint(len(blob), extra)
        extra.write(blob)
    assert decode_message(schema, wire + extra.getvalue()) == decode_message(
        schema, wire
    )


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=40))
def test_fuzz_never_hangs_or_leaks(blob):
    # arbitrary garbage either decodes or raises ValueError — never
    # another exception type, never an infinite loop
    schema = {
        "name": "m",
        "fields": [
            {"name": "a", "number": 1, "type": "int64"},
            {"name": "b", "number": 2, "type": "string"},
            {"name": "c", "number": 3, "type": "double", "repeated": True},
        ],
    }
    try:
        decode_message(schema, blob)
    except ValueError:
        pass
