"""Property-based check (hypothesis): the LWW-pushdown rewrite (the
engine's one planner rule — filters before winner selection, mutators
after) produces the IDENTICAL final table as the straightforward
chain-then-dedupe plan, for arbitrary event streams.

This is exactly the commutation argument engine.py relies on: row
filters commute with per-key winner selection, and mutators never
change (key, lsn)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.streaming import LakeTable, Replayer

OPS = ["c", "u", "r", "d"]

event = st.tuples(
    st.integers(0, 3),            # key id
    st.integers(0, 5),            # lsn (may collide across keys, fine)
    st.sampled_from(OPS),
    st.booleans(),                # tombstone record
)


def _mk_df(spark, rows):
    data = []
    for i, (k, lsn, op, tomb) in enumerate(rows):
        # unique per-key lsn: collisions collapse to one deterministic row
        value = None if tomb else (
            op, lsn, lsn, None,
            None if op == "d" else (f"r{k}", f"p{k}", f"c{lsn}", "py",
                                    f"content-{k}-{lsn}-{op}"),
        )
        data.append(("t", 0, (f"r{k}", f"p{k}"), value, 1000 + i, None))
    return spark.createDataFrame(
        data,
        "topic string, partition int, key struct<repo:string,path:string>, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,"
        "before:struct<repo:string,path:string,commit:string,lang:string,content:string>,"
        "after:struct<repo:string,path:string,commit:string,lang:string,content:string>>, "
        "timestamp long, headers map<string,string>",
    )


CHAIN_SPEC = [
    {"type": "tombstone_handler", "behavior": "drop_silent"},
    {"type": "filter_by_field_value", "field.name": "op",
     "field.value": "r", "field.value.matches": False},
    {"type": "concat_fields", "field.names": ["op", "lsn"],
     "output.field.name": "op_lsn", "delimiter": ":"},
]


def _final_state(spark, df, tmp, pushdown: bool):
    table = LakeTable(str(tmp), n_buckets=4)
    rep = Replayer(
        table=table, chain=Chain(CHAIN_SPEC), epoch="p",
        lww_pushdown=pushdown,
    )
    rep.apply_batch(df, 0)
    try:
        rows = table.read(spark).collect()
    except ValueError:  # zero surviving rows -> table never got a schema
        return []
    return sorted(
        (r["repo"], r["path"], r["content"], r["op_lsn"], r["_lsn"])
        for r in rows
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(event, min_size=0, max_size=16))
def test_pushdown_equals_plain_plan(spark, rows, tmp_path_factory):
    df = _mk_df(spark, rows)
    a = _final_state(spark, df, tmp_path_factory.mktemp("pd"), True)
    b = _final_state(spark, df, tmp_path_factory.mktemp("nopd"), False)
    assert a == b
