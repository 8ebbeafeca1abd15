"""Property-based check (hypothesis): the JsonConverter boundary is a
lossless round trip for ANY envelope content — arbitrary unicode
strings (control chars, quotes, backslashes, surrogate-free emoji),
arbitrary numeric values, nulls and tombstones all survive
envelope -> to_json -> from_json -> envelope byte-identically, and no
row is ever marked as a serialization error."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.record import ERROR_COL, enforce
from transforms_for_apache_kafka_connect_spark.sources import (
    envelope_from_json,
    envelope_to_json,
)

# surrogates excluded: they are not encodable to UTF-8, which the
# engine pins end to end (SURVEY.md §2.2.1)
text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)

record = st.tuples(
    st.integers(0, 5),                      # key id
    st.one_of(st.none(), text),             # content (None -> null field)
    st.integers(-(2**31), 2**31 - 1),       # n
    st.booleans(),                          # tombstone
)


def _mk_env(spark, rows):
    data = []
    for k, content, n, tomb in rows:
        value = None if tomb else (content, n)
        data.append(("t", 0, (f"k{k}",), value, 123, None))
    return spark.createDataFrame(
        data,
        "topic string, partition int, key struct<id:string>, "
        "value struct<content:string,n:int>, "
        "timestamp long, headers map<string,string>",
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(record, min_size=0, max_size=15))
def test_json_boundary_roundtrip_lossless(spark, rows):
    env = _mk_env(spark, rows)
    raw = envelope_to_json(env, as_binary=True)
    back = envelope_from_json(
        raw,
        key_schema=env.schema["key"].dataType,
        value_schema=env.schema["value"].dataType,
    )
    assert back.filter(F.col(ERROR_COL).isNotNull()).count() == 0
    back = enforce(back)
    a = env.drop("headers")
    b = back.select(*a.columns)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
