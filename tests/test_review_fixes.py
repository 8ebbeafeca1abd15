"""Regression tests for the session's code-review findings: guarded
row-dropping mutators, narrowing merges, commit-crash recovery,
clustering convergence, EventRouter timestamp units, null-op envelopes.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.errors import (
    ConfigException,
    DataException,
)
from transforms_for_apache_kafka_connect_spark.functions import (
    connected_components,
)
from transforms_for_apache_kafka_connect_spark.operators import (
    EventRouter,
    ExtractNewRecordState,
    Guarded,
    ReplaceField,
    TopicNameMatches,
)
from transforms_for_apache_kafka_connect_spark.record import enforce
from transforms_for_apache_kafka_connect_spark.streaming import LakeTable, Replayer
from tests.helpers import make_records, struct_type


def test_guarded_row_dropping_mutator_refused(spark):
    # ExtractNewRecordState can drop rows (tombstones/deletes) — the
    # when-merge cannot restore them, so guarding it must fail loudly
    with pytest.raises(ConfigException, match="can drop rows"):
        Guarded(
            ExtractNewRecordState(), TopicNameMatches(pattern="db1\\..*")
        ).apply(
            make_records(
                spark, [(None, None)], T.StringType(),
                struct_type(op=T.StringType(),
                            after=struct_type(a=T.StringType())),
            )
        )


def test_guarded_narrowing_stage_refused(spark):
    # ReplaceField(exclude=...) narrows the struct: non-matching rows
    # would silently lose the field — refuse at plan time
    df = make_records(
        spark, [(None, ("x", "y"))], T.StringType(),
        struct_type(a=T.StringType(), b=T.StringType()),
    )
    with pytest.raises(ConfigException, match="narrows the struct"):
        Guarded(
            ReplaceField(exclude=["b"]), TopicNameMatches(pattern="nope")
        ).apply(df)


def test_guarded_type_replacing_stage_refused(spark):
    from transforms_for_apache_kafka_connect_spark.operators import ExtractField

    df = make_records(
        spark, [(None, ("x",))], T.StringType(), struct_type(a=T.StringType())
    )
    with pytest.raises(ConfigException, match="replaces column type"):
        Guarded(
            ExtractField(field="a"), TopicNameMatches(pattern="nope")
        ).apply(df)


def _env(spark, rows):
    return spark.createDataFrame(
        rows,
        "topic string, partition int, key struct<repo:string,path:string>, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,"
        "after:struct<content:string>>, "
        "timestamp long, headers map<string,string>",
    )


def test_swap_recovers_from_crash_between_manifest_and_current(spark, tmp_path):
    # a writer that died after creating manifest-vN but before the
    # CURRENT repoint must not wedge the table. Under the OCC protocol
    # (tests/test_occ.py) the durable claim IS the commit: readers roll
    # the head forward over the crash window immediately — no replay of
    # the batch is even needed, it ledger-skips.
    table = LakeTable(str(tmp_path / "t"), key_cols=["repo", "path"],
                      n_buckets=4)
    rep = Replayer(table=table, chain=Chain([]), epoch="e", unique_lsn=True)
    rep.apply_batch(
        _env(spark, [("t", 0, ("r", "a"), ("c", 1, 1, ("v1",)), 1, None)]), 0
    )
    # simulate the crash: next version's manifest exists with the ledger
    # tail the retry would compute, CURRENT still points at version 1
    m = table.manifest()
    orphan = dict(m)
    orphan["version"] = 2
    orphan["committed"] = m["committed"] + [["e", 1]]
    with open(table._manifest_path(2), "w") as f:
        json.dump(orphan, f)
    assert table.manifest()["version"] == 2  # the claim is the commit
    assert table.committed("e", 1)

    r = rep.apply_batch(
        _env(spark, [("t", 0, ("r", "b"), ("c", 2, 2, ("v2",)), 2, None)]), 1
    )
    assert r["skipped"] is True  # replay of the crashed batch: ledger no-op
    assert table.manifest()["version"] >= 2
    assert table.committed("e", 1)
    # and a DIFFERENT batch racing for the same version still conflicts
    from transforms_for_apache_kafka_connect_spark.errors import (
        CommitConflictException,
    )

    stale = dict(table.manifest())
    stale["version"] = stale["version"]  # same version as live -> taken
    with pytest.raises(CommitConflictException):
        table._swap({**stale, "committed": stale["committed"] + [["zz", 9]],
                     "version": stale["version"]})


def test_connected_components_raises_on_non_convergence(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a bigint, id_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


def test_event_router_timestamp_typed_column_gives_millis(spark):
    import datetime

    ts = datetime.datetime(2024, 5, 1, 12, 0, 0,
                           tzinfo=datetime.timezone.utc)
    v = T.StructType([
        T.StructField("aggregatetype", T.StringType()),
        T.StructField("aggregateid", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
    ])
    df = make_records(
        spark, [(None, ("order", "o-1", "{}", ts))], T.StringType(), v
    )
    out = enforce(
        EventRouter(table_field_event_timestamp="created_at").apply(df)
    ).first()
    assert out["timestamp"] == 1714564800000  # epoch MILLIS, not seconds


def test_unwrap_null_op_is_record_error(spark):
    env_t = T.StructType([
        T.StructField("before", struct_type(a=T.StringType()), True),
        T.StructField("after", struct_type(a=T.StringType()), True),
        T.StructField("op", T.StringType(), True),
    ])
    df = make_records(spark, [(None, (None, ("x",), None))],
                      T.StringType(), env_t)
    with pytest.raises(DataException, match="null 'op'"):
        enforce(ExtractNewRecordState(delete_handling_mode="drop").apply(df))
