"""Maxwell / Canal / AWS DMS envelope adapters (sources/cdc_envelopes).

Fixtures are literal wire documents shaped per the public docs
(maxwells-daemon.io dataformat page, Canal FlatMessage JSON, AWS DMS
Kinesis/Kafka target record format). Each adapter must normalize to
the engine's standard change envelope so the downstream engine —
chain, LWW, ledgered merge — consumes the stream unchanged; the e2e
test proves that by replaying a Maxwell stream into a LakeTable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.record import ERROR_COL
from transforms_for_apache_kafka_connect_spark.sources import (
    envelope_from_canal,
    envelope_from_dms,
    envelope_from_maxwell,
)
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    Replayer,
)

SCHEMA = "id bigint, name string, balance double"


def _raw(spark, docs):
    """docs: list of JSON strings (or None = tombstone record)."""
    return spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "offset long, value string"
    )


# ---------------------------------------------------------------- Maxwell

MAXWELL_DOCS = [
    '{"database":"shop","table":"users","type":"insert","ts":1609459200,'
    '"xid":140,"commit":true,'
    '"data":{"id":1,"name":"ann","balance":10.5}}',
    # update: old holds only the changed column's previous value
    '{"database":"shop","table":"users","type":"update","ts":1609459260,'
    '"xid":141,"data":{"id":1,"name":"ann","balance":12.0},'
    '"old":{"balance":10.5}}',
    # update where a column BECAME non-null: explicit null in old
    '{"database":"shop","table":"users","type":"update","ts":1609459320,'
    '"xid":142,"data":{"id":2,"name":"bob","balance":3.0},'
    '"old":{"name":null}}',
    '{"database":"shop","table":"users","type":"delete","ts":1609459380,'
    '"xid":143,"data":{"id":1,"name":"ann","balance":12.0}}',
    '{"database":"shop","table":"users","type":"bootstrap-insert",'
    '"ts":1609459000,"data":{"id":3,"name":"cat","balance":0.0}}',
]


def test_maxwell_ops_and_images(spark):
    env = envelope_from_maxwell(
        _raw(spark, MAXWELL_DOCS), data_schema=SCHEMA, key_fields=["id"]
    ).orderBy("value.lsn")
    rows = env.collect()
    assert [r["value"]["op"] for r in rows] == ["c", "u", "u", "d", "r"]
    assert [r["value"]["lsn"] for r in rows] == [0, 1, 2, 3, 4]
    # ts seconds -> ms
    assert rows[0]["value"]["ts_ms"] == 1609459200000
    # insert: before null, after = data
    assert rows[0]["value"]["before"] is None
    assert rows[0]["value"]["after"]["balance"] == 10.5
    # update: before = data overlaid with old
    assert rows[1]["value"]["before"]["balance"] == 10.5
    assert rows[1]["value"]["before"]["name"] == "ann"
    assert rows[1]["value"]["after"]["balance"] == 12.0
    # explicit null in old wins over the post-image value
    assert rows[2]["value"]["before"]["name"] is None
    assert rows[2]["value"]["after"]["name"] == "bob"
    # delete: before = data, after null; key from the before image
    assert rows[3]["value"]["after"] is None
    assert rows[3]["value"]["before"]["id"] == 1
    assert rows[3]["key"]["id"] == 1
    # bootstrap-insert is the snapshot-read analog
    assert rows[4]["value"]["op"] == "r"
    # topic defaults to database.table; metadata rides headers
    assert rows[0]["topic"] == "shop.users"
    assert rows[0]["headers"]["__maxwell_xid"] == "140"
    assert (
        env.filter(F.col(ERROR_COL).isNotNull()).count() == 0
    )


def test_maxwell_drops_bootstrap_markers_errors_unknown(spark):
    docs = [
        '{"database":"d","table":"t","type":"bootstrap-start","ts":1,"data":{}}',
        '{"database":"d","table":"t","type":"bootstrap-complete","ts":2,"data":{}}',
        '{"database":"d","table":"t","type":"table-create","ts":3}',
        "{not json",
        None,  # tombstone record
    ]
    env = envelope_from_maxwell(
        _raw(spark, docs), data_schema=SCHEMA, key_fields=["id"]
    )
    rows = env.orderBy("timestamp").collect()
    # the two bootstrap markers are gone entirely
    assert len(rows) == 3
    errs = {r[ERROR_COL] for r in rows if r[ERROR_COL]}
    assert any("table-create" in e for e in errs)
    assert any("serialization error" in e for e in errs)
    tomb = [r for r in rows if r[ERROR_COL] is None]
    assert len(tomb) == 1 and tomb[0]["value"] is None


def test_missing_type_or_metadata_errors_not_silent(spark):
    """Valid JSON with no type/operation key must land on the error
    channel, never pass as an op-NULL envelope (review finding: NULL
    propagation through `drop` made the unknown check dead)."""
    doc = '{"data":{"id":1,"name":"x","balance":1.0}}'
    mx = envelope_from_maxwell(
        _raw(spark, [doc]), data_schema=SCHEMA, key_fields=["id"]
    ).collect()
    assert len(mx) == 1 and "<missing type>" in mx[0][ERROR_COL]
    dm = envelope_from_dms(
        _raw(spark, [doc]), data_schema=SCHEMA, key_fields=["id"]
    ).collect()
    assert len(dm) == 1 and "<missing operation>" in dm[0][ERROR_COL]
    cn = envelope_from_canal(
        _raw(spark, ['{"data":[{"id":"1"}],"database":"d","table":"t"}']),
        data_schema=SCHEMA, key_fields=["id"],
    ).collect()
    assert len(cn) == 1 and "<missing type>" in cn[0][ERROR_COL]


def test_maxwell_requires_lsn_source(spark):
    df = spark.createDataFrame([("{}",)], "value string")
    with pytest.raises(ValueError, match="LWW ordering"):
        envelope_from_maxwell(df, data_schema=SCHEMA, key_fields=["id"])


# ------------------------------------------------------------------ Canal

CANAL_DOCS = [
    # one message, two inserted rows; every value a JSON string
    '{"data":[{"id":"1","name":"ann","balance":"10.5"},'
    '{"id":"2","name":"bob","balance":"3.25"}],'
    '"database":"shop","es":1609459200000,"id":3,"isDdl":false,'
    '"old":null,"pkNames":["id"],"table":"users","ts":1609459201000,'
    '"type":"INSERT"}',
    '{"data":[{"id":"1","name":"ann","balance":"12"}],'
    '"old":[{"balance":"10.5"}],'
    '"database":"shop","es":1609459260000,"id":4,"isDdl":false,'
    '"pkNames":["id"],"table":"users","ts":1609459261000,"type":"UPDATE"}',
    '{"data":[{"id":"2","name":"bob","balance":"3.25"}],'
    '"database":"shop","es":1609459320000,"id":5,"isDdl":false,'
    '"pkNames":["id"],"table":"users","ts":1609459321000,"type":"DELETE"}',
    # DDL messages are dropped
    '{"data":null,"database":"shop","es":1,"id":6,"isDdl":true,'
    '"sql":"ALTER TABLE users ADD c int","table":"users","ts":2,'
    '"type":"ALTER"}',
]


def test_canal_multirow_and_string_typing(spark):
    env = envelope_from_canal(
        _raw(spark, CANAL_DOCS), data_schema=SCHEMA, key_fields=["id"]
    ).orderBy("value.lsn", "key.id")
    rows = env.collect()
    assert len(rows) == 4  # 2 inserts + update + delete; DDL dropped
    assert [r["value"]["op"] for r in rows] == ["c", "c", "u", "d"]
    # one LSN per MESSAGE: both insert rows share it
    assert rows[0]["value"]["lsn"] == rows[1]["value"]["lsn"] == 0
    # Canal's all-strings convention cast to the declared types
    assert rows[0]["value"]["after"]["id"] == 1
    assert rows[1]["value"]["after"]["balance"] == 3.25
    # es (source time) preferred over ts (process time)
    assert rows[0]["value"]["ts_ms"] == 1609459200000
    # update before-image: old overlays data
    assert rows[2]["value"]["before"]["balance"] == 10.5
    assert rows[2]["value"]["after"]["balance"] == 12.0
    # delete: data IS the before image
    assert rows[3]["value"]["after"] is None
    assert rows[3]["value"]["before"]["name"] == "bob"
    assert rows[0]["topic"] == "shop.users"
    assert rows[0]["headers"]["__canal_batch_id"] == "3"
    assert env.filter(F.col(ERROR_COL).isNotNull()).count() == 0


def test_canal_unknown_type_and_malformed(spark):
    docs = [
        '{"data":[{"id":"1"}],"database":"d","table":"t","es":1,"ts":1,'
        '"id":1,"isDdl":false,"type":"MYSTERY"}',
        "[0,",
        None,
    ]
    env = envelope_from_canal(
        _raw(spark, docs), data_schema=SCHEMA, key_fields=["id"]
    )
    rows = env.collect()
    assert len(rows) == 3
    errs = [r[ERROR_COL] for r in rows if r[ERROR_COL]]
    assert len(errs) == 2
    assert any("MYSTERY" in e for e in errs)
    assert any("serialization error" in e for e in errs)
    assert [r for r in rows if r[ERROR_COL] is None][0]["value"] is None


# -------------------------------------------------------------------- DMS

DMS_DOCS = [
    '{"data":{"id":1,"name":"ann","balance":10.5},"metadata":{'
    '"timestamp":"2021-01-01T00:00:00.000000Z","record-type":"data",'
    '"operation":"load","partition-key-type":"schema-table",'
    '"schema-name":"shop","table-name":"users","transaction-id":998}}',
    '{"data":{"id":2,"name":"bob","balance":3.0},"metadata":{'
    '"timestamp":"2021-01-01T00:01:00.000000Z","record-type":"data",'
    '"operation":"insert","schema-name":"shop","table-name":"users",'
    '"transaction-id":999}}',
    '{"data":{"id":2,"name":"bob","balance":4.0},"metadata":{'
    '"timestamp":"2021-01-01T00:02:00.000000Z","record-type":"data",'
    '"operation":"update","schema-name":"shop","table-name":"users",'
    '"transaction-id":1000}}',
    '{"data":{"id":1,"name":"ann","balance":10.5},"metadata":{'
    '"timestamp":"2021-01-01T00:03:00.000000Z","record-type":"data",'
    '"operation":"delete","schema-name":"shop","table-name":"users",'
    '"transaction-id":1001}}',
    # control records (DDL / task events) are dropped
    '{"control":{},"metadata":{"timestamp":"2021-01-01T00:04:00Z",'
    '"record-type":"control","operation":"create-table",'
    '"schema-name":"shop","table-name":"users"}}',
]


def test_dms_ops_timestamps_and_control(spark):
    env = envelope_from_dms(
        _raw(spark, DMS_DOCS), data_schema=SCHEMA, key_fields=["id"]
    ).orderBy("value.lsn")
    rows = env.collect()
    assert len(rows) == 4  # control dropped
    assert [r["value"]["op"] for r in rows] == ["r", "c", "u", "d"]
    # ISO-8601 metadata.timestamp -> epoch ms
    assert rows[0]["value"]["ts_ms"] == 1609459200000
    assert rows[2]["value"]["ts_ms"] == 1609459320000
    # delete: data is the deleted row -> before image + key
    assert rows[3]["value"]["after"] is None
    assert rows[3]["value"]["before"]["id"] == 1
    assert rows[3]["key"]["id"] == 1
    # updates carry no before (DMS default: no before-image task setting)
    assert rows[2]["value"]["before"] is None
    assert rows[0]["topic"] == "shop.users"
    assert rows[1]["headers"]["__dms_txn"] == "999"
    assert env.filter(F.col(ERROR_COL).isNotNull()).count() == 0


# ------------------------------------------------------- end-to-end merge


def test_maxwell_stream_replays_into_lake_table(spark, tmp_path):
    """The whole point of normalization: a Maxwell topic replays
    through the unchanged engine (chain -> LWW -> ledgered merge) and
    lands the correct final state."""
    docs = list(MAXWELL_DOCS) + [
        # id=2 gets deleted in a later batch; id=3 updated
        '{"database":"shop","table":"users","type":"delete","ts":1609459500,'
        '"data":{"id":2,"name":"bob","balance":3.0}}',
        '{"database":"shop","table":"users","type":"update","ts":1609459560,'
        '"data":{"id":3,"name":"cat","balance":7.5},"old":{"balance":0.0}}',
    ]
    raw = _raw(spark, docs).withColumn("timestamp", F.col("offset"))
    env = envelope_from_maxwell(raw, data_schema=SCHEMA, key_fields=["id"])
    table = LakeTable(str(tmp_path / "users"), key_cols=["id"], n_buckets=4)
    rep = Replayer(table=table, chain=Chain([]), epoch="mx")
    rep.replay(env, batch_width=4, max_pos=len(docs))
    got = {
        r["id"]: (r["name"], r["balance"])
        for r in table.read(spark).collect()
    }
    # id=1 deleted (lsn 3), id=2 deleted (lsn 5), id=3 updated (lsn 6)
    assert got == {3: ("cat", 7.5)}


def test_adapter_plans_have_no_python(spark):
    for fn in (envelope_from_maxwell, envelope_from_canal, envelope_from_dms):
        env = fn(
            _raw(spark, ['{"data":{}}']),
            data_schema=SCHEMA,
            key_fields=["id"],
        )
        plan = env._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ----------------------------------------------- streaming + deployment


def test_maxwell_streaming_entry(spark, tmp_path):
    """raw_format='maxwell' through Replayer.stream: the adapter is a
    first-class converter boundary in the Structured Streaming path."""
    raw = _raw(spark, MAXWELL_DOCS)
    src = str(tmp_path / "raw")
    raw.coalesce(1).write.parquet(src)
    table = LakeTable(str(tmp_path / "t"), key_cols=["id"], n_buckets=4)
    rep = Replayer(table=table, chain=Chain([]), epoch="mxs")
    q = rep.stream(
        spark.readStream.schema(raw.schema).parquet(src),
        str(tmp_path / "ckpt"),
        available_now=True,
        raw_format="maxwell",
        value_schema=SCHEMA,
        key_fields=["id"],
    )
    q.awaitTermination(300)
    q.stop()
    got = {r["id"]: r["balance"] for r in table.read(spark).collect()}
    # MAXWELL_DOCS: id=1 deleted, id=2 updated to 3.0, id=3 bootstrap
    assert got == {2: 3.0, 3: 0.0}


def test_stream_entry_requires_key_fields_and_rejects_framing(spark):
    from transforms_for_apache_kafka_connect_spark.streaming.engine import (
        prepare_stream_events,
    )

    df = _raw(spark, ["{}"])
    with pytest.raises(ValueError, match="key_fields"):
        prepare_stream_events(df, raw_format="dms", value_schema=SCHEMA)
    with pytest.raises(ValueError, match="do not apply"):
        prepare_stream_events(
            df, raw_format="canal", value_schema=SCHEMA,
            key_fields=["id"], confluent_framing=True,
        )


def test_cli_streaming_cdc_envelope(spark, tmp_path):
    import json as _json
    import os
    import subprocess
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    raw = _raw(spark, MAXWELL_DOCS)
    raw.coalesce(1).write.parquet(str(tmp_path / "raw"))
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [
            sys.executable, "-m",
            "transforms_for_apache_kafka_connect_spark",
            "--events", str(tmp_path / "raw"),
            "--table", str(tmp_path / "table"),
            "--streaming",
            "--checkpoint", str(tmp_path / "ckpt"),
            "--cdc-envelope", "maxwell",
            "--key-cols", "id",
            "--value-schema", SCHEMA,
            "--buckets", "4",
            "--master", "local[4]",
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert _json.loads(out.stdout.strip().splitlines()[-1])["mode"] == \
        "streaming"
    table = LakeTable(str(tmp_path / "table"), key_cols=["id"], n_buckets=4)
    got = {r["id"]: r["balance"] for r in table.read(spark).collect()}
    assert got == {2: 3.0, 3: 0.0}


def test_properties_declare_cdc_envelope(tmp_path):
    from transforms_for_apache_kafka_connect_spark.errors import (
        ConfigException,
    )
    from transforms_for_apache_kafka_connect_spark.plans.properties import (
        converters_from_properties,
    )

    p = tmp_path / "c.properties"
    p.write_text(
        "source.cdc.envelope=canal\n"
        f"value.converter.schema={SCHEMA}\n"
        "source.cdc.key.fields=id\n"
    )
    conv = converters_from_properties(str(p))
    assert conv["raw_format"] == "canal"
    assert conv["value_schema"] == SCHEMA
    assert conv["key_fields"] == ["id"]

    bad = tmp_path / "bad.properties"
    bad.write_text(
        "source.cdc.envelope=maxwell\n"
        "value.converter=org.apache.kafka.connect.json.JsonConverter\n"
    )
    with pytest.raises(ConfigException, match="conflicts"):
        converters_from_properties(str(bad))
    unknown = tmp_path / "u.properties"
    unknown.write_text("source.cdc.envelope=goldengate\n")
    with pytest.raises(ConfigException, match="Unknown source.cdc"):
        converters_from_properties(str(unknown))


# ----------------------------------------------------- Maxwell serializer


def test_maxwell_round_trip_exact(spark):
    """envelope -> Maxwell wire -> envelope is the identity on every
    decoded field (op, lsn, ts_ms, before, after, key) for the full
    op mix including the changed-columns old diff."""
    env1 = envelope_from_maxwell(
        _raw(spark, MAXWELL_DOCS), data_schema=SCHEMA, key_fields=["id"]
    )
    from transforms_for_apache_kafka_connect_spark.sources import (
        envelope_to_maxwell,
    )

    wire = envelope_to_maxwell(env1, database="shop", table="users")
    env2 = envelope_from_maxwell(
        wire, data_schema=SCHEMA, key_fields=["id"]
    )
    cols = ["key", "value.op", "value.lsn", "value.ts_ms",
            "value.before", "value.after"]
    a = env1.select(*cols).orderBy("lsn")
    b = env2.select(*cols).orderBy("lsn")
    assert [r.asDict(True) for r in a.collect()] == [
        r.asDict(True) for r in b.collect()
    ]
    # no Python in the serializer plan
    plan = wire._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_maxwell_wire_replay_equals_direct_replay(spark, tmp_path):
    """Replaying the synthetic binlog THROUGH the Maxwell wire (engine
    as a Maxwell source feeding another engine) lands the same final
    table as replaying the envelope directly — deletes keep their key
    via the key-struct backfill even though the stream's before-images
    are null."""
    from transforms_for_apache_kafka_connect_spark.sources import (
        change_stream,
        envelope_to_maxwell,
    )

    n = 2_000
    events = change_stream(spark, n, n_repos=20, paths_per_repo=4)
    direct = LakeTable(str(tmp_path / "direct"), n_buckets=4)
    Replayer(table=direct, chain=Chain([]), epoch="d").replay(
        events, batch_width=n, max_pos=1_600_000_000_000 + n,
        start_pos=1_600_000_000_000,
    )
    wire = envelope_to_maxwell(
        events, database="engine", table="repositories"
    ).withColumn("timestamp", F.coalesce(F.col("timestamp"), F.lit(0)))
    back = envelope_from_maxwell(
        wire,
        data_schema="repo string, path string, commit string, "
                    "lang string, content string",
        key_fields=["repo", "path"],
        lsn=F.col("offset"),
    )
    via = LakeTable(str(tmp_path / "via"), n_buckets=4)
    # tombstone records lost their LSN position: slice on row count
    Replayer(table=via, chain=Chain([]), epoch="v").replay(
        back.withColumn("timestamp", F.coalesce(F.col("timestamp"), F.lit(0))),
        batch_width=10**13, max_pos=2 * 10**12, start_pos=0,
    )
    ta = direct.read(spark).orderBy("repo", "path")
    tb = via.read(spark).orderBy("repo", "path")
    assert [r.asDict() for r in ta.drop("_lsn").collect()] == [
        r.asDict() for r in tb.drop("_lsn").collect()
    ]


def test_canal_round_trip_exact(spark):
    """envelope -> Canal wire -> envelope is the identity on every
    decoded field (Canal's own fixture mix: multi-row insert, update
    with old diff, delete, all-string values)."""
    from transforms_for_apache_kafka_connect_spark.sources import (
        envelope_from_canal,
        envelope_to_canal,
    )

    env1 = envelope_from_canal(
        _raw(spark, [d for d in CANAL_DOCS if '"isDdl":true' not in d]),
        data_schema=SCHEMA, key_fields=["id"],
    )
    wire = envelope_to_canal(env1, database="shop", table="users")
    env2 = envelope_from_canal(
        wire, data_schema=SCHEMA, key_fields=["id"],
        lsn=F.col("offset"),
    )
    cols = ["key", "value.op", "value.ts_ms", "value.before", "value.after"]
    key = ["ts_ms", "op"]
    a = env1.select(*cols).orderBy(*key)
    b = env2.select(*cols).orderBy(*key)
    assert [r.asDict(True) for r in a.collect()] == [
        r.asDict(True) for r in b.collect()
    ]
    plan = wire._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_dms_round_trip_exact(spark):
    """envelope -> DMS wire -> envelope identity (load/insert/update/
    delete; millisecond ISO timestamps survive)."""
    from transforms_for_apache_kafka_connect_spark.sources import (
        envelope_from_dms,
        envelope_to_dms,
    )

    env1 = envelope_from_dms(
        _raw(spark, DMS_DOCS), data_schema=SCHEMA, key_fields=["id"]
    )
    wire = envelope_to_dms(env1, schema_name="shop", table="users")
    env2 = envelope_from_dms(
        wire, data_schema=SCHEMA, key_fields=["id"],
        lsn=F.col("offset"),
    )
    cols = ["key", "value.op", "value.ts_ms", "value.before", "value.after"]
    a = env1.select(*cols).orderBy("ts_ms")
    b = env2.select(*cols).orderBy("ts_ms")
    assert [r.asDict(True) for r in a.collect()] == [
        r.asDict(True) for r in b.collect()
    ]
    plan = wire._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
