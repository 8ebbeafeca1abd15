"""FilterByFieldName (presence filter, north_star) and ReplaceField
(stock Kafka SMT compat: exclude/include/renames)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.errors import ConfigException
from transforms_for_apache_kafka_connect_spark.operators import (
    FilterByFieldName,
    ReplaceField,
)
from transforms_for_apache_kafka_connect_spark.record import ERROR_COL, enforce
from tests.helpers import STR_MAP, make_records, struct_type


V = struct_type(a=T.StringType(), b=T.LongType())


def _struct_records(spark):
    return make_records(
        spark,
        [
            (None, ("x", 1)),     # a present
            (None, (None, 2)),    # a null -> "missing"
            (None, None),         # tombstone
        ],
        T.StringType(),
        V,
    )


def _map_records(spark):
    return make_records(
        spark,
        [
            (None, {"a": "x", "b": "1"}),
            (None, {"b": "2"}),      # a absent
            (None, None),            # tombstone
        ],
        T.StringType(),
        STR_MAP,
    )


# ------------------------------------------------- FilterByFieldName

def test_fbn_struct_presence(spark):
    out = enforce(
        FilterByFieldName(field_name="a").apply(_struct_records(spark))
    ).collect()
    # keeps: row with a present + tombstone (null value passes)
    assert len(out) == 2
    assert sum(1 for r in out if r["value"] is None) == 1


def test_fbn_struct_negated(spark):
    out = enforce(
        FilterByFieldName(field_name="a", field_name_matches=False).apply(
            _struct_records(spark)
        )
    ).collect()
    # keeps: null-a row + tombstone
    assert len(out) == 2
    assert all(r["value"] is None or r["value"]["a"] is None for r in out)


def test_fbn_map_presence(spark):
    out = enforce(
        FilterByFieldName(field_name="a").apply(_map_records(spark))
    ).collect()
    assert len(out) == 2  # {"a": "x"} row + tombstone


def test_fbn_unknown_field_drops_all_but_tombstones(spark):
    out = enforce(
        FilterByFieldName(field_name="nope").apply(_struct_records(spark))
    ).collect()
    assert len(out) == 1 and out[0]["value"] is None


def test_fbn_config():
    with pytest.raises(ConfigException, match="Missing required"):
        FilterByFieldName()
    with pytest.raises(ConfigException, match="non-empty"):
        FilterByFieldName(field_name="")


# ----------------------------------------------------- ReplaceField

def test_replace_field_struct_exclude_include_rename(spark):
    v = struct_type(a=T.StringType(), b=T.LongType(), c=T.StringType())
    df = make_records(spark, [(None, ("x", 1, "z"))], T.StringType(), v)
    st = ReplaceField(exclude=["b"], renames="a:alpha")
    out = enforce(st.apply(df)).first()["value"].asDict()
    assert out == {"alpha": "x", "c": "z"}

    st2 = ReplaceField(include=["c", "a"])
    out2 = enforce(st2.apply(df)).first()["value"].asDict()
    assert out2 == {"a": "x", "c": "z"}  # original field order preserved


def test_replace_field_struct_tombstone_passthrough(spark):
    df = make_records(spark, [(None, None)], T.StringType(), V)
    out = enforce(ReplaceField(exclude=["a"]).apply(df)).first()
    assert out["value"] is None


def test_replace_field_map(spark):
    df = _map_records(spark)
    st = ReplaceField(exclude=["b"], renames={"a": "alpha"})
    rows = enforce(st.apply(df)).collect()
    maps = [r["value"] for r in rows]
    assert {"alpha": "x"} in maps and {} in maps and None in maps


def test_replace_field_bad_rename():
    with pytest.raises(ConfigException, match="rename mapping"):
        ReplaceField(renames="nocolon")


def test_replace_field_in_chain_fuses(spark):
    df = _struct_records(spark)
    chain = Chain([
        {"type": "replace_field", "exclude": ["b"], "renames": "a:alpha"},
        {"type": "filter_by_field_name", "field.name": "alpha"},
    ])
    out = chain.run(df).collect()
    assert len(out) == 2  # alpha-present row + tombstone
    plan = chain.apply(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
