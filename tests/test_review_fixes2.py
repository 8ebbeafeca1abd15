"""Regression pins for the round-2 self-review findings (changelog
edge cases, maintenance catch-up, NULL groups, CLI error contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
from transforms_for_apache_kafka_connect_spark.sources.changestream import (
    change_stream,
    repositories_snapshot,
)
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    MaintainedAggregate,
    Replayer,
)
from transforms_for_apache_kafka_connect_spark.streaming.engine import (
    BOOTSTRAP_BATCH_ID,
)
from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
    batch_changes,
    incremental_agg_update,
)

BASE_TS = 1_600_000_000_000

ROW_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("_lsn", T.LongType()),
    T.StructField("__is_delete", T.BooleanType()),
])


def test_bootstrap_skip_path_catches_up_maintenance(spark, tmp_path):
    """Crash window: bootstrap committed, aggregate fold lost. The
    skipped bootstrap replay must still fold the snapshot batch."""
    table = LakeTable(str(tmp_path / "t"), n_buckets=4,
                      merge_strategy="broadcast", changelog=True)
    events = change_stream(spark, 600, n_repos=8, paths_per_repo=3)
    snap = repositories_snapshot(spark, events)
    # phase 1: bootstrap WITHOUT maintenance (the "crash")
    Replayer(table=table, chain=Chain([]), epoch="e").bootstrap(
        snap, snapshot_lsn=599
    )
    agg = LakeTable(str(tmp_path / "agg"), key_cols=["lang"], n_buckets=2,
                    merge_strategy="broadcast")
    rep = Replayer(
        table=table, chain=Chain([]), epoch="e",
        maintain=[MaintainedAggregate(table=agg, group_cols=["lang"])],
    )
    r = rep.bootstrap(snap, snapshot_lsn=599)
    assert r == {"skipped": True, "batch_id": BOOTSTRAP_BATCH_ID}
    got = {x["lang"]: x["n_rows"] for x in agg.read(spark).collect()}
    want = {x["lang"]: x["n"] for x in table.read(spark).groupBy("lang")
            .agg(F.count("*").alias("n")).collect()}
    assert got == want and len(got) > 0


def test_absent_key_delete_only_batch_does_not_wedge(spark, tmp_path):
    """A batch whose net change set is empty (only deletes of absent
    keys) must not wedge maintained aggregates or batch_changes."""
    table = LakeTable(str(tmp_path / "t"), n_buckets=2,
                      merge_strategy="broadcast", changelog=True)
    agg = LakeTable(str(tmp_path / "agg"), key_cols=["lang"], n_buckets=2,
                    merge_strategy="broadcast")
    rep = Replayer(
        table=table, chain=Chain([]), epoch="e", unique_lsn=True,
        maintain=[MaintainedAggregate(table=agg, group_cols=["lang"])],
    )
    live = spark.createDataFrame(
        [("r0", "p0", "py", 1, False)], ROW_SCHEMA)
    table.merge(live, epoch="seed", batch_id=0)

    # batch deleting only ABSENT keys: net-empty change set
    ghost = spark.createDataFrame(
        [("rX", "pX", None, 10, True), ("rY", "pY", None, 11, True)],
        ROW_SCHEMA)
    table.merge(ghost, epoch="e", batch_id=0)
    assert table.committed("e", 0)
    assert table.has_changes("seed", 0)
    # whether the writer emitted 0-row part files or none, the read
    # side must see zero changes without crashing
    assert batch_changes(table, spark, epoch="e", batch_id=0).count() == 0

    # force the pathological shape (directory with NO parquet files —
    # what an empty-partition-coalescing writer can leave) and assert
    # the guards hold
    import glob
    import os

    chg_dir = os.path.join(table.root, "_changes", "epoch=e", "batch_id=0")
    for f in glob.glob(os.path.join(chg_dir, "*.parquet")):
        os.remove(f)
    assert not table.has_changes("e", 0)
    assert batch_changes(table, spark, epoch="e", batch_id=0).count() == 0
    # and folding it is a no-op that still ledgers
    incremental_agg_update(agg, batch_changes(
        table, spark, epoch="e", batch_id=0),
        group_cols=["lang"], epoch="e", batch_id=0)


def test_null_group_values_are_excluded_not_corrupting(spark, tmp_path):
    table = LakeTable(str(tmp_path / "t"), n_buckets=2,
                      merge_strategy="broadcast", changelog=True)
    agg = LakeTable(str(tmp_path / "agg"), key_cols=["lang"], n_buckets=2,
                    merge_strategy="broadcast")
    b0 = spark.createDataFrame(
        [("r0", "p0", "py", 1, False), ("r0", "p1", None, 2, False)],
        ROW_SCHEMA)
    table.merge(b0, epoch="e", batch_id=0)
    incremental_agg_update(agg, batch_changes(
        table, spark, epoch="e", batch_id=0),
        group_cols=["lang"], epoch="e", batch_id=0)
    # NULL-lang rows excluded; non-null groups exact
    assert {r["lang"]: r["n_rows"] for r in agg.read(spark).collect()} \
        == {"py": 1}
    # update the NULL-group row (retraction also excluded, no crash)
    b1 = spark.createDataFrame(
        [("r0", "p1", None, 10, False)], ROW_SCHEMA)
    table.merge(b1, epoch="e", batch_id=1)
    incremental_agg_update(agg, batch_changes(
        table, spark, epoch="e", batch_id=1),
        group_cols=["lang"], epoch="e", batch_id=1)
    assert {r["lang"]: r["n_rows"] for r in agg.read(spark).collect()} \
        == {"py": 1}


def test_incremental_agg_touches_only_delta_groups(spark, tmp_path):
    """No full-aggregate rewrite: a batch touching one group merges an
    update set confined to that group's bucket."""
    table = LakeTable(str(tmp_path / "t"), n_buckets=2,
                      merge_strategy="broadcast", changelog=True)
    agg = LakeTable(str(tmp_path / "agg"), key_cols=["lang"], n_buckets=8,
                    merge_strategy="broadcast")
    b0 = spark.createDataFrame(
        [("r0", f"p{i}", lang, i, False)
         for i, lang in enumerate(["py", "rs", "go", "js", "c"])],
        ROW_SCHEMA)
    table.merge(b0, epoch="e", batch_id=0)
    incremental_agg_update(agg, batch_changes(
        table, spark, epoch="e", batch_id=0),
        group_cols=["lang"], epoch="e", batch_id=0)

    b1 = spark.createDataFrame(
        [("r1", "pX", "py", 100, False)], ROW_SCHEMA)
    table.merge(b1, epoch="e", batch_id=1)
    r = incremental_agg_update(agg, batch_changes(
        table, spark, epoch="e", batch_id=1),
        group_cols=["lang"], epoch="e", batch_id=1)
    touched = r.get("touched_buckets")
    assert touched != "all" and len(touched) == 1
    assert {x["lang"]: x["n_rows"] for x in agg.read(spark).collect()} \
        == {"py": 2, "rs": 1, "go": 1, "js": 1, "c": 1}


def test_read_changelog_empty_after_full_expiry(spark, tmp_path):
    table = LakeTable(str(tmp_path / "t"), n_buckets=2,
                      merge_strategy="broadcast", changelog=True)
    table.merge(spark.createDataFrame(
        [("r0", "p0", "py", 1, False)], ROW_SCHEMA), epoch="e", batch_id=0)
    assert table.read_changelog(spark).count() > 0
    table.vacuum(changelog_keep_batches=0, orphan_grace_seconds=0)
    df = table.read_changelog(spark)
    assert df.count() == 0
    assert "_change_type" in df.columns  # stable schema, no crash


def test_null_lsn_rows_pass_the_bootstrap_fence(spark, tmp_path):
    """A data row with a NULL lsn reaches the error contract instead of
    silently vanishing at the fence."""
    from transforms_for_apache_kafka_connect_spark.errors import DataException

    env_schema = T.StructType([
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("key", T.StructType(
            [T.StructField("repo", T.StringType()),
             T.StructField("path", T.StringType())])),
        T.StructField("value", T.StructType([
            T.StructField("op", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("after", T.StructType(
                [T.StructField("content", T.StringType())])),
        ])),
        T.StructField("timestamp", T.LongType()),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
    ])
    table = LakeTable(str(tmp_path / "t"), n_buckets=2)
    rep = Replayer(table=table, chain=Chain([
        {"type": "tombstone_handler", "behavior": "fail"},
    ]), epoch="e")
    rep.bootstrap(
        spark.createDataFrame([("r0", "p0", "seed")],
                              ["repo", "path", "content"]),
        snapshot_lsn=10,
    )
    # a tombstone RECORD (value NULL) after bootstrap must still FAIL
    # the batch under behavior=fail — the fence cannot swallow it
    bad = spark.createDataFrame(
        [("t", 0, ("r1", "p1"), None, 11, None)], env_schema)
    with pytest.raises(DataException):
        rep.apply_batch(bad, 0)
    # and a null-LSN data row is not silently dropped either: with an
    # empty chain it flows to the merge (visible, not vanished)
    rep2 = Replayer(table=table, chain=Chain([]), epoch="e2")
    nulllsn = spark.createDataFrame(
        [("t", 0, ("r2", "p2"), ("c", None, 5, ("x",)), 12, None)],
        env_schema)
    rep2.apply_batch(nulllsn, 0)
    assert table.read(spark).filter("repo = 'r2'").count() == 1


def test_cli_bootstrap_nonempty_table_exits_2(spark, tmp_path, capsys):
    from transforms_for_apache_kafka_connect_spark.cli import main

    events = change_stream(spark, 300, n_repos=5, paths_per_repo=3)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    snap = repositories_snapshot(spark, events)
    snap.write.mode("overwrite").parquet(str(tmp_path / "snap"))
    root = str(tmp_path / "table")
    assert main(["--table", root, "--buckets", "4", "--batches", "1",
                 "--events", str(tmp_path / "events")]) == 0
    capsys.readouterr()
    assert main(["--table", root, "--buckets", "4",
                 "--bootstrap", str(tmp_path / "snap"),
                 "--snapshot-lsn", "299"]) == 2
    assert "empty table" in capsys.readouterr().err
