"""Debezium compat: ExtractNewRecordState (envelope unwrap) and the
outbox EventRouter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.errors import (
    ConfigException,
    DataException,
)
from transforms_for_apache_kafka_connect_spark.operators import (
    EventRouter,
    ExtractNewRecordState,
)
from transforms_for_apache_kafka_connect_spark.record import enforce
from tests.helpers import make_records, struct_type

ROW = struct_type(pk=T.LongType(), name=T.StringType())
SRC = struct_type(lsn=T.LongType(), table=T.StringType())
ENVELOPE = T.StructType([
    T.StructField("before", ROW, True),
    T.StructField("after", ROW, True),
    T.StructField("source", SRC, True),
    T.StructField("op", T.StringType(), True),
    T.StructField("ts_ms", T.LongType(), True),
])


def _envelopes(spark):
    rows = [
        ((1,), (None, (1, "alice"), (10, "t1"), "c", 1000)),
        ((2,), ((2, "bob0"), (2, "bob1"), (11, "t1"), "u", 1001)),
        ((3,), ((3, "carol"), None, (12, "t1"), "d", 1002)),
        ((4,), (None, (4, "dave"), (13, "t1"), "r", 1003)),
        ((5,), None),  # plain tombstone after a delete
    ]
    return make_records(spark, rows, struct_type(pk=T.LongType()), ENVELOPE)


def test_unwrap_default_tombstone_mode(spark):
    # c/u/r -> after; d -> tombstone; pre-existing tombstones dropped
    out = enforce(ExtractNewRecordState().apply(_envelopes(spark)))
    assert out.count() == 4
    rows = {r["key"]["pk"]: r["value"] for r in out.collect()}
    assert rows[1].asDict() == {"pk": 1, "name": "alice"}
    assert rows[2].asDict() == {"pk": 2, "name": "bob1"}
    assert rows[3] is None  # delete became a tombstone
    assert rows[4].asDict() == {"pk": 4, "name": "dave"}


def test_unwrap_drop_mode_and_keep_tombstones(spark):
    st = ExtractNewRecordState(
        delete_handling_mode="drop", drop_tombstones=False
    )
    out = enforce(st.apply(_envelopes(spark)))
    rows = {r["key"]["pk"]: r["value"] for r in out.collect()}
    assert set(rows) == {1, 2, 4, 5}  # delete dropped, tombstone kept
    assert rows[5] is None


def test_unwrap_rewrite_mode(spark):
    st = ExtractNewRecordState(delete_handling_mode="rewrite")
    out = enforce(st.apply(_envelopes(spark)))
    rows = {r["key"]["pk"]: r["value"] for r in out.collect()}
    assert rows[3].asDict() == {"pk": 3, "name": "carol", "__deleted": "true"}
    assert rows[1]["__deleted"] == "false"


def test_unwrap_add_fields_and_headers(spark):
    st = ExtractNewRecordState(
        add_fields="op,ts_ms,source.lsn", add_headers=["source.table"]
    )
    out = enforce(st.apply(_envelopes(spark)))
    r1 = {r["key"]["pk"]: r for r in out.collect()}[1]
    v = r1["value"].asDict()
    assert v["__op"] == "c" and v["__ts_ms"] == 1000 and v["__source_lsn"] == 10
    assert r1["headers"] == {"__source_table": "t1"}


def test_unwrap_route_by_field_and_errors(spark):
    st = ExtractNewRecordState(route_by_field="name")
    out = enforce(st.apply(_envelopes(spark)))
    topics = {r["key"]["pk"]: r["topic"] for r in out.collect()}
    assert topics[1] == "alice"
    assert topics[3] == "original_topic"  # tombstone keeps its topic

    with pytest.raises(ConfigException, match="one of"):
        ExtractNewRecordState(delete_handling_mode="zap")
    with pytest.raises(DataException, match="envelope"):
        ExtractNewRecordState().apply(
            make_records(spark, [(None, ("x",))], T.StringType(),
                         struct_type(a=T.StringType()))
        )
    with pytest.raises(DataException, match="not a valid field name"):
        enforce(ExtractNewRecordState(add_fields="nope").apply(
            _envelopes(spark)
        ))


def _outbox(spark):
    v = struct_type(
        id=T.LongType(), aggregatetype=T.StringType(),
        aggregateid=T.StringType(), payload=T.StringType(),
        created_ms=T.LongType(),
    )
    rows = [
        (None, (1, "order", "o-1", '{"total": 9}', 5000)),
        (None, (2, "customer", "c-7", '{"name": "x"}', 6000)),
        (None, (3, "order", "o-2", None, 7000)),
    ]
    return make_records(spark, rows, T.StringType(), v)


def test_event_router_defaults(spark):
    out = enforce(EventRouter().apply(_outbox(spark)))
    rows = sorted(
        [(r["topic"], r["key"]["id"], r["value"]) for r in out.collect()]
    )
    assert rows == [
        ("outbox.event.customer", "c-7", '{"name": "x"}'),
        ("outbox.event.order", "o-1", '{"total": 9}'),
        ("outbox.event.order", "o-2", None),
    ]


def test_event_router_custom_pattern_timestamp_tombstone(spark):
    st = EventRouter(
        route_topic_replacement="evt.${routedByValue}.v1",
        table_field_event_timestamp="created_ms",
        route_tombstone_on_empty_payload=True,
    )
    out = enforce(st.apply(_outbox(spark)))
    rows = {r["key"]["id"]: r for r in out.collect()}
    assert rows["o-1"]["topic"] == "evt.order.v1"
    assert rows["o-1"]["timestamp"] == 5000
    assert rows["o-2"]["value"] is None  # empty payload -> tombstone

    with pytest.raises(DataException, match="Unknown field: zz"):
        EventRouter(route_by_field="zz").apply(_outbox(spark))


def test_debezium_outbox_end_to_end_chain(spark):
    """The canonical pipeline: Debezium envelope over the outbox table
    -> unwrap -> route. One fused Catalyst plan via Chain."""
    outbox_row = struct_type(
        id=T.LongType(), aggregatetype=T.StringType(),
        aggregateid=T.StringType(), payload=T.StringType(),
    )
    env_t = T.StructType([
        T.StructField("before", outbox_row, True),
        T.StructField("after", outbox_row, True),
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
    ])
    rows = [
        ((1,), (None, (1, "order", "o-1", '{"n":1}'), "c", 1)),
        ((2,), (None, (2, "ship", "s-9", '{"n":2}'), "c", 2)),
    ]
    df = make_records(spark, rows, struct_type(pk=T.LongType()), env_t)
    chain = Chain([
        {"type": "extract_new_record_state"},
        {"type": "event_router"},
    ])
    out = chain.run(df)
    got = sorted((r["topic"], r["key"]["id"], r["value"]) for r in out.collect())
    assert got == [
        ("outbox.event.order", "o-1", '{"n":1}'),
        ("outbox.event.ship", "s-9", '{"n":2}'),
    ]
