"""SchemaRegistry seam (sources/schema_registry.py): the file-backed
default reproduces the snapshot-map behavior exactly, the HTTP client
speaks the public Confluent REST shape (validated against a local fake
server — no external network), lookups cache per id, and the
properties loader maps the standard converter key."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.record import ERROR_COL
from transforms_for_apache_kafka_connect_spark.sources import (
    FileSchemaRegistry,
    HttpSchemaRegistry,
    SchemaRegistry,
    encode_record,
    envelope_from_avro,
)

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
        {"name": "user_id", "type": "long"},
        {"name": "event_type", "type": ["null", "string"]},
        {"name": "amount", "type": ["null", "double"]},
        {"name": "region", "type": "string", "default": "emea"},
    ],
}


def _framed(sid: int, schema: dict, rec: dict) -> bytes:
    return b"\x00" + sid.to_bytes(4, "big") + encode_record(schema, rec)


def _evolving_raw(spark):
    rows = [
        (None, _framed(1, V1, {"user_id": 1, "event_type": "a",
                               "legacy_flag": True})),
        (None, _framed(2, V2, {"user_id": 3, "event_type": "b",
                               "amount": 1.5, "region": "apac"})),
        (None, _framed(9, V1, {"user_id": 4, "event_type": "c",
                               "legacy_flag": True})),
    ]
    return spark.createDataFrame(rows, "key binary, value binary")


class _FakeRegistryHandler(BaseHTTPRequestHandler):
    """The public Confluent REST shape: GET /schemas/ids/{id} ->
    {"schema": "<json-encoded avro schema string>"}; unknown -> 404."""

    schemas = {1: V1, 2: V2}
    hits: list[str] = []

    def do_GET(self):  # noqa: N802 - BaseHTTPRequestHandler contract
        type(self).hits.append(self.path)
        parts = self.path.strip("/").split("/")
        if len(parts) == 3 and parts[:2] == ["schemas", "ids"]:
            sid = int(parts[2])
            if sid in self.schemas:
                body = json.dumps(
                    {"schema": json.dumps(self.schemas[sid])}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
                return
        self.send_response(404)
        self.end_headers()

    def log_message(self, *a):  # silence test output
        pass


@pytest.fixture(scope="module")
def fake_registry_url():
    server = HTTPServer(("127.0.0.1", 0), _FakeRegistryHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_file_registry_forms_and_errors(tmp_path):
    r = FileSchemaRegistry(schemas_by_id={1: V1, "2": json.dumps(V2)})
    assert isinstance(r, SchemaRegistry)
    assert r.get_by_id(1) == V1 and r.get_by_id(2) == V2
    assert r.ids() == [1, 2]
    with pytest.raises(KeyError):
        r.get_by_id(9)
    p = tmp_path / "writers.json"
    p.write_text(json.dumps({"1": V1, "2": V2}))
    assert FileSchemaRegistry(path=str(p)).get_by_id(2) == V2
    with pytest.raises(ValueError, match="exactly one"):
        FileSchemaRegistry()
    with pytest.raises(ValueError, match="exactly one"):
        FileSchemaRegistry(schemas_by_id={1: V1}, path=str(p))


def _assert_evolving_contract(env):
    good = env.filter(F.col(ERROR_COL).isNull()).select(
        F.col("value.user_id").alias("uid"),
        F.col("value.amount").alias("amount"),
        F.col("value.region").alias("region"),
    ).collect()
    by_uid = {r.uid: r for r in good}
    assert set(by_uid) == {1, 3}
    assert by_uid[1].amount is None and by_uid[1].region == "emea"
    assert by_uid[3].amount == 1.5 and by_uid[3].region == "apac"
    assert env.filter(F.col(ERROR_COL).isNotNull()).count() == 1


def test_file_registry_evolving_topic_matches_snapshot_map(spark):
    """The registry seam with the file impl == the pre-seam
    writer_schemas snapshot behavior (same evolving-topic contract,
    same unknown-id error)."""
    env = envelope_from_avro(
        _evolving_raw(spark), value_schema=V2, confluent_framing=True,
        schema_registry=FileSchemaRegistry(schemas_by_id={1: V1, 2: V2}),
        use_jvm=False,
    )
    _assert_evolving_contract(env)


def test_http_registry_client_and_cache(fake_registry_url):
    _FakeRegistryHandler.hits.clear()
    r = HttpSchemaRegistry(fake_registry_url)
    assert r.get_by_id(1) == V1
    assert r.get_by_id(1) == V1  # served from cache
    assert len(_FakeRegistryHandler.hits) == 1
    assert r.get_by_id(2) == V2
    with pytest.raises(KeyError, match="unknown schema id 9"):
        r.get_by_id(9)
    # pickling ships config, not cached responses
    import pickle

    r2 = pickle.loads(pickle.dumps(r))
    assert r2._cache == {} and r2.url == r.url


def test_http_registry_end_to_end_decode(spark, fake_registry_url):
    """The full boundary with a LIVE registry: decode workers resolve
    writer schemas over HTTP (cached per id) and the evolving-topic
    contract holds — including 404 -> per-record error."""
    env = envelope_from_avro(
        _evolving_raw(spark), value_schema=V2, confluent_framing=True,
        schema_registry=HttpSchemaRegistry(fake_registry_url),
        use_jvm=False,
    )
    _assert_evolving_contract(env)


def test_registry_guardrails(spark):
    raw = spark.createDataFrame([(None, b"\x00")], "key binary, value binary")
    reg = FileSchemaRegistry(schemas_by_id={1: V1})
    with pytest.raises(ValueError, match="not both"):
        envelope_from_avro(
            raw, value_schema=V2, confluent_framing=True,
            writer_schemas={1: V1}, schema_registry=reg, use_jvm=False,
        )
    with pytest.raises(ValueError, match="confluent_framing"):
        envelope_from_avro(
            raw, value_schema=V2, confluent_framing=False,
            schema_registry=reg, use_jvm=False,
        )
    with pytest.raises(ValueError, match="Python codec path"):
        envelope_from_avro(
            raw, value_schema=V2, confluent_framing=True,
            schema_registry=reg, use_jvm=True,
        )


def test_properties_map_registry_url(tmp_path):
    from transforms_for_apache_kafka_connect_spark.plans.properties import (
        ConfigException,
        converters_from_properties,
    )

    schema_file = tmp_path / "v.avsc"
    schema_file.write_text(json.dumps(V2))
    base = {
        "value.converter": "io.confluent.connect.avro.AvroConverter",
        "value.converter.schema.file": str(schema_file),
    }
    out = converters_from_properties(
        {**base,
         "value.converter.schema.registry.url": "http://reg.example:8081"}
    )
    assert isinstance(out["schema_registry"], HttpSchemaRegistry)
    assert out["schema_registry"].url == "http://reg.example:8081"
    assert out["confluent_framing"] is True

    writers = tmp_path / "writers.json"
    writers.write_text(json.dumps({"1": V1}))
    with pytest.raises(ConfigException, match="not both"):
        converters_from_properties(
            {**base,
             "value.converter.writer.schemas.file": str(writers),
             "value.converter.schema.registry.url": "http://r:1"}
        )
    with pytest.raises(ConfigException, match="only applies to"):
        converters_from_properties(
            {"value.converter":
             "org.apache.kafka.connect.json.JsonConverter",
             "value.converter.schema": "user_id bigint",
             "value.converter.schema.registry.url": "http://r:1"}
        )
