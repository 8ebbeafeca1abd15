"""Property-based invariants (hypothesis) for the pure-Python Avro
binary codec and schema resolution: encode/decode round-trip identity
over arbitrary schemas+records, and resolution laws (identity on equal
schemas, default-filling, promotion) — no Spark session needed."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from transforms_for_apache_kafka_connect_spark.sources.avro_boundary import (
    decode_record,
    encode_record,
    resolve_record,
)

# ---------------------------------------------------------- schema strategy

_PRIMS = ["boolean", "int", "long", "float", "double", "string", "bytes"]


def _field_type(depth: int):
    prim = st.sampled_from(_PRIMS)
    nullable = prim.map(lambda t: ["null", t])
    opts = [prim, nullable]
    if depth > 0:
        inner = st.deferred(lambda: _field_type(depth - 1))
        opts.append(
            st.builds(lambda t: {"type": "array", "items": t}, inner)
        )
        opts.append(
            st.builds(lambda t: {"type": "map", "values": t}, inner)
        )
        opts.append(
            st.builds(
                lambda fields: {
                    "type": "record",
                    "name": f"r{depth}",
                    "fields": fields,
                },
                st.lists(
                    st.builds(
                        lambda n, t: {"name": f"f{n}", "type": t},
                        st.integers(0, 5),
                        inner,
                    ),
                    min_size=1,
                    max_size=3,
                    unique_by=lambda f: f["name"],
                ),
            )
        )
    return st.one_of(opts)


schemas = st.builds(
    lambda fields: {"type": "record", "name": "top", "fields": fields},
    st.lists(
        st.builds(
            lambda n, t: {"name": f"c{n}", "type": t},
            st.integers(0, 7),
            _field_type(2),
        ),
        min_size=1,
        max_size=5,
        unique_by=lambda f: f["name"],
    ),
)


def _value_for(t, draw):
    if isinstance(t, list):  # nullable
        if draw(st.booleans()):
            return None
        return _value_for(t[1] if t[0] == "null" else t[0], draw)
    if isinstance(t, dict):
        kind = t["type"]
        if kind == "record":
            return {
                f["name"]: _value_for(f["type"], draw) for f in t["fields"]
            }
        if kind == "array":
            return [
                _value_for(t["items"], draw)
                for _ in range(draw(st.integers(0, 3)))
            ]
        if kind == "map":
            return {
                draw(st.text(alphabet="abcdef", min_size=1, max_size=4)):
                    _value_for(t["values"], draw)
                for _ in range(draw(st.integers(0, 3)))
            }
        return _value_for(kind, draw)
    if t == "boolean":
        return draw(st.booleans())
    if t == "int":
        return draw(st.integers(-(2**31), 2**31 - 1))
    if t == "long":
        return draw(st.integers(-(2**63), 2**63 - 1))
    if t == "float":
        # float32-representable, finite (NaN != NaN breaks equality)
        import struct as _s

        v = draw(st.floats(allow_nan=False, allow_infinity=False,
                           width=32))
        return _s.unpack("<f", _s.pack("<f", v))[0]
    if t == "double":
        return draw(st.floats(allow_nan=False, allow_infinity=False))
    if t == "string":
        return draw(st.text(max_size=12))
    if t == "bytes":
        return draw(st.binary(max_size=12))
    raise AssertionError(t)


@st.composite
def schema_and_record(draw):
    schema = draw(schemas)
    record = {
        f["name"]: _value_for(f["type"], draw) for f in schema["fields"]
    }
    return schema, record


# ----------------------------------------------------------------- invariants

@settings(max_examples=200, deadline=None)
@given(schema_and_record())
def test_roundtrip_identity(sr):
    schema, record = sr
    assert decode_record(schema, encode_record(schema, record)) == record


@settings(max_examples=100, deadline=None)
@given(schema_and_record())
def test_resolution_identity_on_equal_schemas(sr):
    schema, record = sr
    assert resolve_record(schema, schema, record) == record


@settings(max_examples=100, deadline=None)
@given(schema_and_record(), st.text(alphabet="xyz", min_size=1, max_size=4))
def test_resolution_fills_added_nullable_field(sr, newname):
    schema, record = sr
    name = "zz_" + newname  # never collides with c0..c7
    reader = {
        "type": "record",
        "name": "top",
        "fields": schema["fields"]
        + [{"name": name, "type": ["null", "string"]}],
    }
    out = resolve_record(schema, reader, record)
    assert out[name] is None
    for f in schema["fields"]:
        assert out[f["name"]] == record[f["name"]]


@settings(max_examples=100, deadline=None)
@given(schema_and_record())
def test_resolution_drops_writer_only_fields(sr):
    schema, record = sr
    reader = {
        "type": "record",
        "name": "top",
        "fields": schema["fields"][:1],
    }
    out = resolve_record(schema, reader, record)
    assert set(out) == {schema["fields"][0]["name"]}


@settings(max_examples=200, deadline=None)
@given(st.integers(-(2**31), 2**31 - 1))
def test_int_to_double_promotion_through_decode_resolve(v):
    w = {"type": "record", "name": "t",
         "fields": [{"name": "x", "type": "int"}]}
    r = {"type": "record", "name": "t",
         "fields": [{"name": "x", "type": "double"}]}
    out = resolve_record(w, r, decode_record(w, encode_record(w, {"x": v})))
    assert isinstance(out["x"], float) and math.isclose(out["x"], float(v))
