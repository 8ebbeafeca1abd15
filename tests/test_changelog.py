"""Row-level change capture (Delta CDF analog: ``changelog=True``) and
incremental view maintenance on top of it.

Reference parity note: the reference engine has no changelog — this is
engine-level capability the lake sink needs so downstream consumers
can keep derived state consistent without rescanning the table
(SURVEY.md §2.3 'what the reference lacks').
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
from transforms_for_apache_kafka_connect_spark.sources.changestream import (
    change_stream,
    repositories_snapshot,
)
from transforms_for_apache_kafka_connect_spark.streaming.engine import Replayer
from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
    batch_changes,
    incremental_agg_update,
)
from transforms_for_apache_kafka_connect_spark.streaming.sink import LakeTable

BASE_TS = 1_600_000_000_000


def _replay(spark, tmp_path, *, strategy, n=2_000, batches=2, **table_kw):
    table = LakeTable(
        str(tmp_path / f"t_{strategy}"), n_buckets=8,
        merge_strategy=strategy, changelog=True, **table_kw,
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e")
    events = change_stream(spark, n, n_repos=12, paths_per_repo=4)
    rep.replay(events, batch_width=-(-n // batches),
               start_pos=BASE_TS, max_pos=BASE_TS + n)
    return table, events


@pytest.mark.parametrize("strategy", ["shuffle", "broadcast", "append"])
def test_changelog_replays_to_final_state(spark, tmp_path, strategy):
    """Folding the changelog forward (insert/update_postimage rows,
    minus deletes) reproduces the final table state exactly — the
    changelog is a complete, ordered record of what each batch did."""
    table, events = _replay(spark, tmp_path, strategy=strategy, batches=3)
    chg = table.read_changelog(spark)
    assert set(r["_change_type"] for r in
               chg.select("_change_type").distinct().collect()) <= {
        "insert", "update_preimage", "update_postimage", "delete"}

    # per key: the LAST change (max batch_id) with a post-image wins;
    # keys whose last change is a delete are gone
    last = (
        chg.filter(F.col("_change_type") != "update_preimage")
        .groupBy("repo", "path")
        .agg(F.max_by(
            F.struct("_change_type", "content"), F.col("batch_id")
        ).alias("w"))
        .filter(F.col("w._change_type") != "delete")
        .select("repo", "path", "w.content")
    )
    want = {(r["repo"], r["path"]): r["content"]
            for r in table.read(spark).select("repo", "path", "content").collect()}
    got = {(r["repo"], r["path"]): r["content"] for r in last.collect()}
    assert got == want and len(got) > 0


@pytest.mark.parametrize("strategy", ["shuffle", "broadcast", "append"])
def test_changelog_classification(spark, tmp_path, strategy):
    """insert vs update (pre+post pair) vs delete (with pre-image);
    a delete of an absent key emits nothing."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("_lsn", T.LongType()),
        T.StructField("__is_delete", T.BooleanType()),
    ])
    table = LakeTable(str(tmp_path / "t"), n_buckets=4,
                      merge_strategy=strategy, changelog=True)
    b0 = spark.createDataFrame(
        [("r0", "p0", "v1", 1, False), ("r0", "p1", "keep", 2, False)],
        schema,
    )
    table.merge(b0, epoch="e", batch_id=0)
    b1 = spark.createDataFrame(
        [
            ("r0", "p0", "v2", 10, False),     # update
            ("r0", "p1", None, 11, True),      # delete (pre-image exists)
            ("r0", "p2", "new", 12, False),    # insert
            ("r9", "p9", None, 13, True),      # delete of absent key
        ],
        schema,
    )
    table.merge(b1, epoch="e", batch_id=1)

    chg0 = {(r["_change_type"], r["repo"], r["path"]): r["content"]
            for r in batch_changes(table, spark, epoch="e", batch_id=0).collect()}
    assert chg0 == {
        ("insert", "r0", "p0"): "v1",
        ("insert", "r0", "p1"): "keep",
    }
    chg1 = {(r["_change_type"], r["repo"], r["path"]): r["content"]
            for r in batch_changes(table, spark, epoch="e", batch_id=1).collect()}
    assert chg1 == {
        ("update_preimage", "r0", "p0"): "v1",
        ("update_postimage", "r0", "p0"): "v2",
        ("delete", "r0", "p1"): "keep",
        ("insert", "r0", "p2"): "new",
        # no entry for the absent-key delete: no net change
    }


def test_changelog_hides_uncommitted_and_vacuum_reclaims(spark, tmp_path):
    """A changelog dir whose batch never reached the ledger (aborted
    error-contract merge, crash before swap) is invisible to
    read_changelog and reclaimed by vacuum."""
    table, _ = _replay(spark, tmp_path, strategy="broadcast")
    n_committed = batch_changes(
        table, spark, epoch="e", batch_id=0
    ).count()
    assert n_committed > 0

    # fabricate an orphan (what a crash between changelog write and
    # manifest swap leaves behind)
    orphan = os.path.join(table.root, "_changes", "epoch=e", "batch_id=99")
    os.makedirs(orphan, exist_ok=True)
    spark.createDataFrame([("x",)], ["junk"]).write.mode(
        "overwrite"
    ).parquet(orphan)

    chg = table.read_changelog(spark)
    assert chg.filter(F.col("batch_id") == 99).count() == 0
    r = table.vacuum(orphan_grace_seconds=0)
    assert r["orphan_changelog_dirs"] == 1
    assert not os.path.exists(orphan)
    # committed entries survive vacuum
    assert batch_changes(
        table, spark, epoch="e", batch_id=0
    ).count() == n_committed


def test_changelog_requires_flag(spark, tmp_path):
    table = LakeTable(str(tmp_path / "t"), n_buckets=4)
    with pytest.raises(ValueError, match="changelog=True"):
        table.read_changelog(spark)


@pytest.mark.parametrize("strategy", ["broadcast", "append"])
def test_incremental_agg_matches_recompute(spark, tmp_path, strategy):
    """Maintaining COUNT(*) + SUM per group from the changelog batch by
    batch equals recomputing the aggregate over the final table."""
    n, batches = 3_000, 3
    table, events = _replay(
        spark, tmp_path, strategy=strategy, n=n, batches=batches,
    )
    agg = LakeTable(
        str(tmp_path / f"agg_{strategy}"), key_cols=["lang"], n_buckets=4,
        merge_strategy="broadcast",
    )
    for b in range(batches):
        incremental_agg_update(
            agg,
            batch_changes(table, spark, epoch="e", batch_id=b),
            group_cols=["lang"],
            sum_cols=["_lsn"],
            epoch="e",
            batch_id=b,
        )
    got = {
        r["lang"]: (r["n_rows"], round(r["sum__lsn"], 4))
        for r in agg.read(spark).collect()
    }
    want = {
        r["lang"]: (r["n"], round(r["s"], 4))
        for r in table.read(spark)
        .groupBy("lang")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("_lsn").cast("double")).alias("s"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_incremental_agg_is_exactly_once(spark, tmp_path):
    """Re-applying a batch's changelog is a ledger no-op on the agg
    table — the crash/replay contract extends to derived state."""
    table, _ = _replay(spark, tmp_path, strategy="broadcast", batches=2)
    agg = LakeTable(str(tmp_path / "agg"), key_cols=["lang"], n_buckets=4,
                    merge_strategy="broadcast")
    for b in (0, 1):
        incremental_agg_update(
            agg, batch_changes(table, spark, epoch="e", batch_id=b),
            group_cols=["lang"], epoch="e", batch_id=b,
        )
    before = {r["lang"]: r["n_rows"] for r in agg.read(spark).collect()}
    r = incremental_agg_update(
        agg, batch_changes(table, spark, epoch="e", batch_id=1),
        group_cols=["lang"], epoch="e", batch_id=1,
    )
    assert r["skipped"]
    after = {r["lang"]: r["n_rows"] for r in agg.read(spark).collect()}
    assert after == before


def test_group_vanishes_when_count_reaches_zero(spark, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("_lsn", T.LongType()),
        T.StructField("__is_delete", T.BooleanType()),
    ])
    table = LakeTable(str(tmp_path / "t"), n_buckets=2, changelog=True,
                      merge_strategy="broadcast")
    agg = LakeTable(str(tmp_path / "agg"), key_cols=["lang"], n_buckets=2,
                    merge_strategy="broadcast")
    table.merge(spark.createDataFrame(
        [("r0", "p0", "py", 1, False), ("r0", "p1", "rs", 2, False)],
        schema), epoch="e", batch_id=0)
    incremental_agg_update(
        agg, batch_changes(table, spark, epoch="e", batch_id=0),
        group_cols=["lang"], epoch="e", batch_id=0)
    assert {r["lang"] for r in agg.read(spark).collect()} == {"py", "rs"}

    table.merge(spark.createDataFrame(
        [("r0", "p1", "rs", 10, True)], schema), epoch="e", batch_id=1)
    incremental_agg_update(
        agg, batch_changes(table, spark, epoch="e", batch_id=1),
        group_cols=["lang"], epoch="e", batch_id=1)
    assert {r["lang"] for r in agg.read(spark).collect()} == {"py"}


# ------------------------------------------- Replayer-attached aggregates


def test_replayer_maintained_aggregate(spark, tmp_path):
    """maintain=[...]: the Replayer folds every batch's changelog into
    the attached aggregate right after the merge — end state equals a
    recompute, with zero manual loops."""
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        MaintainedAggregate,
    )

    n = 2_000
    table = LakeTable(str(tmp_path / "t"), n_buckets=8,
                      merge_strategy="broadcast", changelog=True)
    agg = LakeTable(str(tmp_path / "agg"), key_cols=["lang"], n_buckets=4,
                    merge_strategy="broadcast")
    rep = Replayer(
        table=table, chain=Chain([]), epoch="e",
        maintain=[MaintainedAggregate(
            table=agg, group_cols=["lang"], sum_cols=["_lsn"],
        )],
    )
    events = change_stream(spark, n, n_repos=10, paths_per_repo=4)
    rep.replay(events, batch_width=-(-n // 3),
               start_pos=BASE_TS, max_pos=BASE_TS + n)
    got = {r["lang"]: (r["n_rows"], round(r["sum__lsn"], 4))
           for r in agg.read(spark).collect()}
    want = {r["lang"]: (r["n"], round(r["s"], 4))
            for r in table.read(spark).groupBy("lang").agg(
                F.count("*").alias("n"),
                F.sum(F.col("_lsn").cast("double")).alias("s")).collect()}
    assert got == want and len(got) > 0


def test_maintenance_catches_up_on_ledger_skipped_batch(spark, tmp_path):
    """Crash window: source batch committed, aggregate update lost.
    Replaying the batch skips the source merge via its ledger but STILL
    folds the changelog into the aggregate — the composition is
    exactly-once in both directions."""
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        MaintainedAggregate,
    )

    n = 1_000
    table = LakeTable(str(tmp_path / "t"), n_buckets=4,
                      merge_strategy="broadcast", changelog=True)
    # phase 1: replay WITHOUT maintenance (simulates the crash having
    # lost the aggregate update after the source commit)
    rep0 = Replayer(table=table, chain=Chain([]), epoch="e")
    events = change_stream(spark, n, n_repos=8, paths_per_repo=3)
    rep0.replay(events, batch_width=n,
                start_pos=BASE_TS, max_pos=BASE_TS + n)

    agg = LakeTable(str(tmp_path / "agg"), key_cols=["lang"], n_buckets=4,
                    merge_strategy="broadcast")
    rep = Replayer(
        table=table, chain=Chain([]), epoch="e",
        maintain=[MaintainedAggregate(table=agg, group_cols=["lang"])],
    )
    results = rep.replay(events, batch_width=n,
                         start_pos=BASE_TS, max_pos=BASE_TS + n)
    assert all(r["skipped"] for r in results)
    got = {r["lang"]: r["n_rows"] for r in agg.read(spark).collect()}
    want = {r["lang"]: r["n"] for r in table.read(spark).groupBy("lang")
            .agg(F.count("*").alias("n")).collect()}
    assert got == want and len(got) > 0

    # replaying AGAIN changes nothing (agg ledger dedupes)
    rep.replay(events, batch_width=n,
               start_pos=BASE_TS, max_pos=BASE_TS + n)
    assert {r["lang"]: r["n_rows"]
            for r in agg.read(spark).collect()} == want


def test_maintain_requires_changelog_table(tmp_path):
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        MaintainedAggregate,
    )

    table = LakeTable(str(tmp_path / "t"), n_buckets=2)
    agg = LakeTable(str(tmp_path / "agg"), key_cols=["lang"], n_buckets=2)
    with pytest.raises(ValueError, match="changelog=True"):
        Replayer(table=table, chain=Chain([]),
                 maintain=[MaintainedAggregate(table=agg,
                                               group_cols=["lang"])])


def test_cli_changelog_flag(spark, tmp_path, capsys):
    from transforms_for_apache_kafka_connect_spark.cli import main

    events = change_stream(spark, 800, n_repos=8, paths_per_repo=3)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    root = str(tmp_path / "table")
    assert main(["--table", root, "--buckets", "4", "--batches", "2",
                 "--changelog", "--events", str(tmp_path / "events")]) == 0
    capsys.readouterr()
    table = LakeTable(root, n_buckets=4)
    chg = table.read_changelog(spark)
    assert chg.count() > 0
    assert set(r["batch_id"] for r in
               chg.select("batch_id").distinct().collect()) == {0, 1}


def test_vacuum_changelog_retention(spark, tmp_path):
    """changelog_keep_batches=N expires committed changelog entries
    beyond the last N batches per epoch; None keeps all."""
    table, _ = _replay(spark, tmp_path, strategy="broadcast", n=1_200,
                       batches=3)
    assert all(table.has_changes("e", b) for b in (0, 1, 2))
    r = table.vacuum(orphan_grace_seconds=0)  # default: keep all committed entries
    assert r["orphan_changelog_dirs"] == 0
    r = table.vacuum(changelog_keep_batches=1, orphan_grace_seconds=0)
    assert r["orphan_changelog_dirs"] == 2
    assert not table.has_changes("e", 0)
    assert not table.has_changes("e", 1)
    assert table.has_changes("e", 2)
    # reads keep working over the retained window
    assert batch_changes(table, spark, epoch="e", batch_id=2).count() > 0


def test_streaming_maintained_aggregate(spark, tmp_path):
    """The stream path (foreachBatch -> apply_batch) maintains attached
    aggregates per micro-batch too — one code path, both entries."""
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        MaintainedAggregate,
    )

    n = 1_600
    events = change_stream(spark, n, n_repos=10, paths_per_repo=4)
    src = str(tmp_path / "incoming")
    events.filter(F.col("timestamp") < BASE_TS + n // 2).write.parquet(
        src + "/f1.parquet")
    events.filter(F.col("timestamp") >= BASE_TS + n // 2).write.parquet(
        src + "/f2.parquet")

    table = LakeTable(str(tmp_path / "t"), n_buckets=4,
                      merge_strategy="broadcast", changelog=True)
    agg = LakeTable(str(tmp_path / "agg"), key_cols=["lang"], n_buckets=2,
                    merge_strategy="broadcast")
    rep = Replayer(
        table=table, chain=Chain([]), epoch="s1",
        maintain=[MaintainedAggregate(table=agg, group_cols=["lang"])],
    )
    q = rep.stream(
        spark.readStream.schema(events.schema).parquet(src + "/*"),
        str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(120)

    got = {r["lang"]: r["n_rows"] for r in agg.read(spark).collect()}
    want = {r["lang"]: r["n"] for r in table.read(spark).groupBy("lang")
            .agg(F.count("*").alias("n")).collect()}
    assert got == want and len(got) > 0


def test_routed_tables_capture_changelogs(spark, tmp_path):
    """table_opts flow to every routed table: with changelog=True each
    per-topic table captures its own changes."""
    from transforms_for_apache_kafka_connect_spark.streaming import (
        TopicTableRouter,
    )

    events = change_stream(spark, 1_000, n_repos=9, paths_per_repo=3)
    # key-stable routing: shard by repo hash
    shard = F.concat(
        F.lit("s"), F.pmod(F.xxhash64("key.repo"), F.lit(2)).cast("string")
    )
    events = events.withColumn(
        "topic", F.when(F.col("value").isNotNull(), shard)
        .otherwise(F.col("topic"))
    )
    router = TopicTableRouter(
        root=str(tmp_path / "router"), chain=Chain([]), epoch="e",
        table_opts={"n_buckets": 4, "merge_strategy": "broadcast",
                    "changelog": True},
    )
    router.apply_batch(events, 0)
    n_total = 0
    for topic in ("s0", "s1"):
        t = router.table_for(topic)
        n = t.read_changelog(spark).count()
        assert n > 0
        n_total += n
    assert n_total > 0


# ------------------------------------------------- second-hop CDC


@pytest.mark.parametrize("dst_strategy", ["shuffle", "broadcast", "append"])
def test_apply_changes_replicates_table(spark, tmp_path, dst_strategy):
    """bronze -> silver: applying each batch's changelog to a second
    table reproduces the source state — including delete resolution on
    a merge-on-read destination (the _change_lsn contract)."""
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        apply_changes_to_table,
    )

    n, batches = 2_400, 3
    src, _ = _replay(spark, tmp_path, strategy="broadcast",
                     n=n, batches=batches)
    dst = LakeTable(str(tmp_path / f"dst_{dst_strategy}"), n_buckets=4,
                    merge_strategy=dst_strategy)
    for b in range(batches):
        apply_changes_to_table(
            dst, batch_changes(src, spark, epoch="e", batch_id=b),
            epoch="e", batch_id=b,
        )
    cols = ["repo", "path", "content"]
    got = {tuple(r[c] for c in cols)
           for r in dst.read(spark).select(*cols).collect()}
    want = {tuple(r[c] for c in cols)
            for r in src.read(spark).select(*cols).collect()}
    assert got == want and len(got) > 0

    # re-applying a batch is a no-op on the destination ledger
    r = apply_changes_to_table(
        dst, batch_changes(src, spark, epoch="e", batch_id=0),
        epoch="e", batch_id=0,
    )
    assert r["skipped"]


def test_changelog_records_change_lsn(spark, tmp_path):
    """Every entry carries the LSN of the event that produced it:
    post-images their own, pre-images/deletes the displacing event's."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("_lsn", T.LongType()),
        T.StructField("__is_delete", T.BooleanType()),
    ])
    table = LakeTable(str(tmp_path / "t"), n_buckets=2, changelog=True,
                      merge_strategy="broadcast")
    table.merge(spark.createDataFrame(
        [("r0", "p0", "v1", 1, False), ("r0", "p1", "x", 2, False)],
        schema), epoch="e", batch_id=0)
    table.merge(spark.createDataFrame(
        [("r0", "p0", "v2", 10, False), ("r0", "p1", None, 11, True)],
        schema), epoch="e", batch_id=1)
    rows = {(r["_change_type"], r["repo"], r["path"]): (r["_lsn"], r["_change_lsn"])
            for r in batch_changes(table, spark, epoch="e", batch_id=1).collect()}
    assert rows[("update_preimage", "r0", "p0")] == (1, 10)
    assert rows[("update_postimage", "r0", "p0")] == (10, 10)
    assert rows[("delete", "r0", "p1")] == (2, 11)
