"""Property-based check (hypothesis): for ANY event stream, lww_dedupe
picks exactly the per-key maximum of (lsn, ts_ms, op_rank) among live
records — the invariant the whole merge correctness rests on.

Payload is a pure function of (key, lsn, ts, op) so ordering ties are
byte-identical rows and the aggregate's arbitrary tie pick is
indistinguishable from the oracle's.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.streaming import lww_dedupe

OPS = ["c", "u", "r", "d"]
OP_RANK = {"d": 3, "u": 2, "c": 1, "r": 0}

event = st.tuples(
    st.integers(0, 4),            # key id
    st.integers(0, 6),            # lsn
    st.integers(0, 2),            # ts
    st.sampled_from(OPS),         # op
    st.booleans(),                # tombstone record
)


def _mk_df(spark, rows):
    data = []
    for k, lsn, ts, op, tomb in rows:
        value = None if tomb else (op, lsn, ts, f"c-{k}-{lsn}-{ts}-{op}")
        data.append(("t", 0, (f"k{k}",), value, lsn, None))
    return spark.createDataFrame(
        data,
        "topic string, partition int, key struct<id:string>, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,content:string>, "
        "timestamp long, headers map<string,string>",
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(event, min_size=0, max_size=30))
def test_lww_dedupe_matches_python_oracle(spark, rows):
    df = _mk_df(spark, rows)
    got = {
        r["key"]["id"]: (r["value"]["lsn"], r["value"]["ts_ms"], r["value"]["op"])
        for r in lww_dedupe(df).collect()
    }
    oracle: dict[str, tuple] = {}
    for k, lsn, ts, op, tomb in rows:
        if tomb:
            continue  # tombstone records carry no value -> ignored
        key = f"k{k}"
        cand = (lsn, ts, OP_RANK[op], op)
        if key not in oracle or cand[:3] > oracle[key][:3]:
            oracle[key] = cand
    assert got == {k: (v[0], v[1], v[3]) for k, v in oracle.items()}
