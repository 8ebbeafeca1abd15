"""Stock SMT compat part 3: ExtractField, MaskField, TimestampRouter,
HeaderFrom, Filter, and the Connect predicate framework
(TopicNameMatches / HasHeaderKey / RecordIsTombstone + per-stage
predicate/negate guarding)."""

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
    ExtractField,
    Filter,
    Guarded,
    HasHeaderKey,
    HeaderFrom,
    MaskField,
    RecordIsTombstone,
    TimestampRouter,
    TopicNameMatches,
)
from transforms_for_apache_kafka_connect_spark.record import enforce
from tests.helpers import STR_MAP, make_records, struct_type

V = struct_type(id=T.LongType(), name=T.StringType(), score=T.DoubleType())


def _recs(spark, rows=None):
    rows = rows if rows is not None else [
        (None, (1, "alice", 1.5)),
        (None, (2, "bob", None)),
        (None, None),  # tombstone
    ]
    return make_records(spark, rows, T.StringType(), V)


# --- ExtractField -----------------------------------------------------

def test_extract_field_struct(spark):
    out = enforce(ExtractField(field="name").apply(_recs(spark)))
    assert out.schema["value"].dataType == T.StringType()
    vals = [r["value"] for r in out.orderBy("value").collect()]
    assert vals == [None, "alice", "bob"]  # tombstone stays null


def test_extract_field_unknown_and_config(spark):
    with pytest.raises(DataException, match="Unknown field: nope"):
        ExtractField(field="nope").apply(_recs(spark))
    with pytest.raises(ConfigException, match="Missing required"):
        ExtractField()


def test_extract_field_map(spark):
    df = make_records(
        spark, [(None, {"a": "1"}), (None, {"b": "2"})], T.StringType(), STR_MAP
    )
    out = enforce(ExtractField(field="a").apply(df))
    assert sorted(
        [r["value"] for r in out.collect()], key=lambda x: (x is None, x)
    ) == ["1", None]


# --- MaskField --------------------------------------------------------

def test_mask_field_zero_values(spark):
    out = enforce(
        MaskField(fields=["name", "score"]).apply(_recs(spark))
    ).orderBy(F.asc_nulls_last("value.id")).collect()
    assert out[0]["value"].asDict() == {"id": 1, "name": "", "score": 0.0}
    # null field value stays null, tombstone stays null
    assert out[1]["value"].asDict() == {"id": 2, "name": "", "score": None}
    assert out[2]["value"] is None


def test_mask_field_replacement_and_errors(spark):
    out = enforce(
        MaskField(fields=["name"], replacement="xxx").apply(_recs(spark))
    ).orderBy(F.asc_nulls_last("value.id")).first()
    assert out["value"]["name"] == "xxx"
    with pytest.raises(DataException, match="Unknown field"):
        MaskField(fields=["zzz"]).apply(_recs(spark))
    with pytest.raises(ConfigException, match="Missing required"):
        MaskField()
    with pytest.raises(ConfigException, match="non-empty"):
        MaskField(fields="")


def test_mask_field_map_regime(spark):
    df = make_records(
        spark, [(None, {"a": "1", "b": "2"})], T.StringType(), STR_MAP
    )
    out = enforce(MaskField(fields=["a"]).apply(df)).first()
    assert out["value"] == {"a": "", "b": "2"}


# --- TimestampRouter --------------------------------------------------

def test_timestamp_router_default_format(spark):
    # fixture timestamp = 123 ms after epoch -> 19700101 (UTC session tz)
    out = enforce(TimestampRouter().apply(_recs(spark))).first()
    assert out["topic"] == "original_topic-19700101"


def test_timestamp_router_custom_format(spark):
    st = TimestampRouter(
        topic_format="lake.${timestamp}.${topic}", timestamp_format="yyyy-MM"
    )
    out = enforce(st.apply(_recs(spark))).first()
    assert out["topic"] == "lake.1970-01.original_topic"


def test_timestamp_router_null_timestamp_errors(spark):
    df = _recs(spark).withColumn(
        "timestamp", F.lit(None).cast("long")
    )
    with pytest.raises(DataException, match="null record timestamp"):
        enforce(TimestampRouter().apply(df))


# --- HeaderFrom -------------------------------------------------------

def test_header_from_copy_and_move(spark):
    copy = HeaderFrom(
        fields=["name", "id"], headers=["h.name", "h.id"], operation="copy"
    )
    out = enforce(copy.apply(_recs(spark))).orderBy(F.asc_nulls_last("value.id")).collect()
    assert out[0]["headers"] == {"h.name": "alice", "h.id": "1"}
    assert out[0]["value"]["name"] == "alice"  # copy keeps the field
    assert out[2]["headers"] is None  # tombstone untouched

    move = HeaderFrom(fields=["name"], headers=["n"], operation="move")
    m = enforce(move.apply(_recs(spark))).orderBy(F.asc_nulls_last("value.id")).collect()
    assert m[0]["headers"] == {"n": "alice"}
    assert "name" not in m[0]["value"].asDict()
    assert m[2]["value"] is None


def test_header_from_config_parity(spark):
    with pytest.raises(ConfigException, match="same number of elements"):
        HeaderFrom(fields=["a", "b"], headers=["x"], operation="copy")
    with pytest.raises(ConfigException, match="one of: move, copy"):
        HeaderFrom(fields=["a"], headers=["x"], operation="rename")
    with pytest.raises(DataException, match="Field does not exist: zz"):
        HeaderFrom(fields=["zz"], headers=["x"], operation="copy").apply(
            _recs(spark)
        )


# --- Filter + predicates ---------------------------------------------

def test_filter_drops_everything(spark):
    assert enforce(Filter().apply(_recs(spark))).count() == 0


def test_filter_with_tombstone_predicate(spark):
    chain = Chain([
        {"type": "filter", "predicate": {"type": "record_is_tombstone"}},
    ])
    out = chain.run(_recs(spark))
    assert out.count() == 2
    assert out.filter(F.col("value").isNull()).count() == 0


def test_filter_negated_predicate_keeps_only_tombstones(spark):
    chain = Chain([
        {"type": "filter",
         "predicate": {"type": "record_is_tombstone"}, "negate": True},
    ])
    out = chain.run(_recs(spark))
    assert out.count() == 1 and out.first()["value"] is None


def test_topic_name_matches_is_full_match(spark):
    df = _recs(spark)  # topic = original_topic
    # find-style substring must NOT match (stock uses Pattern.matches)
    guarded = Guarded(Filter(), TopicNameMatches(pattern="original"))
    assert enforce(guarded.apply(df)).count() == 3
    guarded_full = Guarded(Filter(), TopicNameMatches(pattern="original_.*"))
    assert enforce(guarded_full.apply(df)).count() == 0
    with pytest.raises(ConfigException, match="Missing required"):
        TopicNameMatches()
    with pytest.raises(ConfigException, match="non-empty"):
        TopicNameMatches(pattern="")


def test_has_header_key(spark):
    df = enforce(
        Chain([
            {"type": "insert_header", "header": "route", "value.literal": "x"},
        ]).apply(_recs(spark))
    )
    # drop rows that have the header (all of them), then none of them
    assert enforce(
        Guarded(Filter(), HasHeaderKey(name="route")).apply(df)
    ).count() == 0
    assert enforce(
        Guarded(Filter(), HasHeaderKey(name="other")).apply(df)
    ).count() == 3


def test_guarded_mutator_merges_columns(spark):
    # mask only records whose topic matches; others keep their value
    df = _recs(spark)
    routed = df.withColumn(
        "topic",
        F.when(F.col("value.id") == 1, F.lit("pii_topic")).otherwise(
            F.col("topic")
        ),
    )
    chain = Chain([
        {"type": "mask_field", "fields": ["name"],
         "predicate": {"type": "topic_name_matches", "pattern": "pii_.*"}},
    ])
    out = chain.run(routed).orderBy(F.asc_nulls_last("value.id")).collect()
    assert out[0]["value"]["name"] == ""       # masked (predicate matched)
    assert out[1]["value"]["name"] == "bob"    # untouched
    assert out[2]["value"] is None             # tombstone untouched


def test_guarded_schema_widening_stage(spark):
    # a guarded ConcatFields widens the struct; unmatched rows carry null
    df = _recs(spark).filter(F.col("value").isNotNull())
    routed = df.withColumn(
        "topic",
        F.when(F.col("value.id") == 1, F.lit("wide")).otherwise(F.col("topic")),
    )
    chain = Chain([
        {"type": "concat_fields", "field.names": ["id", "name"],
         "output.field.name": "id_name", "delimiter": "-",
         "predicate": {"type": "topic_name_matches", "pattern": "wide"}},
    ])
    out = chain.run(routed).orderBy(F.asc_nulls_last("value.id")).collect()
    assert out[0]["value"]["id_name"] == "1-alice"
    assert out[1]["value"]["id_name"] is None


def test_guarded_added_column_stage(spark):
    # set_schema_metadata under a predicate: name set only on matches
    df = _recs(spark).filter(F.col("value").isNotNull())
    routed = df.withColumn(
        "topic",
        F.when(F.col("value.id") == 1, F.lit("t1")).otherwise(F.col("topic")),
    )
    chain = Chain([
        {"type": "set_schema_metadata", "schema.name": "com.acme.V1",
         "predicate": {"type": "topic_name_matches", "pattern": "t1"}},
    ])
    out = chain.run(routed).orderBy(F.asc_nulls_last("value.id")).collect()
    assert out[0]["value_schema_name"] == "com.acme.V1"
    assert out[1]["value_schema_name"] is None


def test_unknown_predicate_type():
    with pytest.raises(ConfigException, match="Unknown predicate type"):
        Chain([{"type": "filter", "predicate": {"type": "bogus"}}])


def test_tombstone_predicate_with_make_tombstone_chain(spark):
    # the canonical Connect recipe: route deletes, then tombstone them
    df = _recs(spark)
    chain = Chain([
        {"type": "filter", "predicate": {"type": "record_is_tombstone"}},
        {"type": "make_tombstone",
         "predicate": {"type": "topic_name_matches", "pattern": "orig.*"}},
    ])
    out = chain.run(df)
    assert out.count() == 2
    assert out.filter(F.col("value").isNotNull()).count() == 0
