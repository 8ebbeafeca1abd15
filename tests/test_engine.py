"""Engine-level tests (SURVEY.md §5.2 / §7.7): change-stream generator
determinism, LWW dedupe, merge with tombstone deletes, exactly-once
idempotence, resume, schema evolution, and sha256(content) parity vs an
independent oracle replay."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.sources import (
    change_stream,
    repositories_snapshot,
)
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    Replayer,
    lww_dedupe,
)

N = 10_000
BASE_TS = 1_600_000_000_000


@pytest.fixture(scope="module")
def events(spark):
    return change_stream(spark, N, n_repos=100, paths_per_repo=10).cache()


def test_generator_deterministic(spark, events):
    again = change_stream(spark, N, n_repos=100, paths_per_repo=10)
    a = events.drop("headers")  # MAP columns unsupported in set ops
    b = again.drop("headers")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert events.count() == N


def test_generator_shape(spark, events):
    ops = {r["op"] for r in events.select("value.op").distinct().collect() if r["op"]}
    assert ops == {"c", "u", "r", "d"}
    n_tomb = events.filter(F.col("value").isNull()).count()
    assert 0 < n_tomb < N * 0.03  # ~1% tombstones
    # zipf skew: top repo should own far more than 1/100 of events
    top = (
        events.groupBy("key.repo").count().orderBy(F.desc("count")).first()["count"]
    )
    assert top > N / 100 * 5


def test_lww_dedupe_one_row_per_key_max_lsn(spark, events):
    deduped = lww_dedupe(events)
    assert deduped.groupBy("key").count().filter("count > 1").count() == 0
    # surviving lsn == max lsn per key among non-null values
    expected = (
        events.filter(F.col("value").isNotNull())
        .groupBy("key")
        .agg(F.max("value.lsn").alias("lsn"))
    )
    got = deduped.select("key", F.col("value.lsn").alias("lsn"))
    assert got.exceptAll(expected).count() == 0


def _mk_replayer(spark, tmp_path, chain=None):
    table = LakeTable(str(tmp_path / "repositories"), n_buckets=16)
    return Replayer(table=table, chain=chain or Chain([]), epoch="e1")


def test_replay_parity_with_oracle(spark, events, tmp_path):
    rep = _mk_replayer(spark, tmp_path)
    results = rep.replay(
        events, batch_width=2_000, max_pos=BASE_TS + N, start_pos=BASE_TS
    )
    assert len(results) == 5
    assert all(not r.get("skipped") for r in results)

    final = rep.table.read(spark)
    oracle = repositories_snapshot(spark, events)
    # per-row sha256(content) parity, full outer — zero mismatches
    cmp = final.select(
        "repo", "path", F.sha2("content", 256).alias("h")
    ).join(
        oracle.select("repo", "path", F.sha2("content", 256).alias("h2")),
        ["repo", "path"],
        "full_outer",
    )
    assert cmp.filter("h IS NULL OR h2 IS NULL OR h != h2").count() == 0
    assert final.count() == oracle.count()


def test_replay_idempotent_and_resumable(spark, events, tmp_path):
    rep = _mk_replayer(spark, tmp_path)
    rep.replay(events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS)
    v1 = rep.table.manifest()["version"]
    state1 = rep.table.read(spark).orderBy("repo", "path").collect()

    # re-apply an already-committed batch -> no-op
    batch0 = events.filter(
        (F.col("timestamp") >= BASE_TS) & (F.col("timestamp") < BASE_TS + 2_500)
    )
    r = rep.apply_batch(batch0, 0)
    assert r["skipped"]

    # fresh Replayer over the same table (simulated restart) -> all skipped
    rep2 = _mk_replayer(spark, tmp_path)
    results = rep2.replay(
        events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS
    )
    assert all(r["skipped"] for r in results)
    assert rep2.table.manifest()["version"] == v1
    assert rep2.table.read(spark).orderBy("repo", "path").collect() == state1


def test_partial_replay_then_resume(spark, events, tmp_path):
    rep = _mk_replayer(spark, tmp_path)
    # crash after 2 of 4 batches
    rep.replay(events, batch_width=2_500, max_pos=BASE_TS + 5_000, start_pos=BASE_TS)
    # resume runs ALL batches; first two are skipped by the ledger
    rep2 = _mk_replayer(spark, tmp_path)
    results = rep2.replay(
        events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS
    )
    assert [r.get("skipped", False) for r in results] == [True, True, False, False]
    oracle = repositories_snapshot(spark, events)
    assert rep2.table.read(spark).count() == oracle.count()


def test_chain_in_replay_and_schema_evolution(spark, events, tmp_path):
    chain = Chain(
        [
            # drop tombstones FIRST: ConcatFields errors on null values
            # exactly like the reference (ConcatFields.java:60-62)
            {"type": "tombstone_handler", "behavior": "drop_warn"},
            # drop Debezium snapshot reads; routing metric semantics
            {"type": "filter_by_field_value", "field.name": "op",
             "field.value": "r", "field.value.matches": False},
            {"type": "concat_fields", "field.names": ["op", "lsn"],
             "output.field.name": "op_lsn", "delimiter": ":"},
        ]
    )
    rep = _mk_replayer(spark, tmp_path, chain=chain)
    rep.replay(events, batch_width=5_000, max_pos=BASE_TS + N, start_pos=BASE_TS)
    final = rep.table.read(spark)
    # SMT-added column propagated to the table schema
    assert "op_lsn" in final.columns
    assert final.filter(F.col("op_lsn").rlike("^[cud]:")).count() > 0
    # oracle: replay of the FILTERED stream (op='r' dropped pre-merge)
    oracle = repositories_snapshot(
        spark, events.filter(F.col("value").isNull() | (F.col("value.op") != "r"))
    )
    assert final.count() == oracle.count()
    cmp = final.select("repo", "path", "content").join(
        oracle.select("repo", "path", F.col("content").alias("c2")),
        ["repo", "path"],
        "full_outer",
    )
    assert cmp.filter("content IS NULL OR c2 IS NULL OR content != c2").count() == 0


def test_unique_lsn_fast_path_matches_oracle(spark, events, tmp_path):
    # unique_lsn=True swaps the struct winner-ordering for the bare lsn
    # (HashAggregate instead of SortAggregate); state must be identical —
    # including under duplicate delivery, which the final LWW still collapses
    dup = events.unionByName(events)
    table = LakeTable(str(tmp_path / "t"), n_buckets=16)
    # mutator stage present -> the LWW-pushdown winner join (the branch
    # unique_lsn accelerates) is actually taken
    chain = Chain([
        {"type": "tombstone_handler", "behavior": "drop_silent"},
        {"type": "concat_fields", "field.names": ["op", "lsn"],
         "output.field.name": "op_lsn", "delimiter": ":"},
    ])
    rep = Replayer(table=table, chain=chain, epoch="e1", unique_lsn=True)
    rep.replay(dup, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS)
    oracle = repositories_snapshot(spark, events)
    final = table.read(spark)
    assert final.count() == oracle.count()
    cmp = final.select("repo", "path", "content").join(
        oracle.select("repo", "path", F.col("content").alias("c2")),
        ["repo", "path"],
        "full_outer",
    )
    assert cmp.filter("content IS NULL OR c2 IS NULL OR content != c2").count() == 0


def test_duplicate_delivery_is_idempotent(spark, events, tmp_path):
    # at-least-once redelivery (Kafka contract): every envelope row
    # delivered TWICE, byte-identical (same key, lsn, ts_ms, op). The
    # LWW tie-break is a total order, so the merge input stays one row
    # per key and the final state equals the exactly-once oracle.
    dup = events.unionByName(events)
    rep = _mk_replayer(spark, tmp_path)
    rep.replay(dup, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS)
    oracle = repositories_snapshot(spark, events)
    final = rep.table.read(spark)
    assert final.count() == oracle.count()
    cmp = final.select("repo", "path", "content").join(
        oracle.select("repo", "path", F.col("content").alias("c2")),
        ["repo", "path"],
        "full_outer",
    )
    assert cmp.filter("content IS NULL OR c2 IS NULL OR content != c2").count() == 0


def test_schema_evolution_survives_resume(spark, events, tmp_path):
    # SURVEY §7 hard part (c): a chain-added column must appear once in
    # the evolved schema, and resuming a partially-complete replay (with
    # the column already added) must neither re-add nor corrupt it
    chain = Chain(
        [
            {"type": "tombstone_handler", "behavior": "drop_warn"},
            {"type": "concat_fields", "field.names": ["op", "lsn"],
             "output.field.name": "op_lsn", "delimiter": ":"},
        ]
    )
    rep = _mk_replayer(spark, tmp_path, chain=chain)
    # crash after half the batches — op_lsn already in the table schema
    rep.replay(events, batch_width=2_500, max_pos=BASE_TS + 5_000, start_pos=BASE_TS)
    assert "op_lsn" in rep.table.read(spark).columns

    rep2 = _mk_replayer(spark, tmp_path, chain=chain)
    results = rep2.replay(
        events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS
    )
    assert [r.get("skipped", False) for r in results] == [True, True, False, False]
    final = rep2.table.read(spark)
    assert final.columns.count("op_lsn") == 1
    # every surviving row has the column populated consistently
    assert final.filter(F.col("op_lsn").rlike("^[cudr]:[0-9]+$")).count() == final.count()
    oracle = repositories_snapshot(spark, events)
    assert final.count() == oracle.count()


def test_delete_removes_rows(spark, tmp_path):
    # tiny targeted stream: key deleted by the last event must be absent
    ev = change_stream(spark, 3_000, n_repos=10, paths_per_repo=3)
    rep = _mk_replayer(spark, tmp_path)
    rep.replay(ev, batch_width=1_000, max_pos=BASE_TS + 3_000, start_pos=BASE_TS)
    last_op = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("key")
        .agg(F.max_by(F.col("value.op"), F.col("value.lsn")).alias("op"))
    )
    deleted = last_op.filter("op = 'd'").select("key.repo", "key.path")
    final = rep.table.read(spark)
    hit = final.join(deleted, ["repo", "path"], "inner").count()
    assert deleted.count() > 0 and hit == 0


def test_engine_batch_abort_on_error_keeps_table_uncommitted(spark, events, tmp_path):
    # fail-mode tombstone handler: the batch must NOT commit, and a
    # replay with a fixed chain must succeed from scratch
    from transforms_for_apache_kafka_connect_spark.errors import DataException

    bad = Chain([{"type": "tombstone_handler", "behavior": "fail"}])
    table = LakeTable(str(tmp_path / "t"), n_buckets=8)
    rep = Replayer(table=table, chain=bad, epoch="e1")
    with pytest.raises(DataException, match="Tombstone record encountered"):
        rep.replay(events, batch_width=N, max_pos=BASE_TS + N, start_pos=BASE_TS)
    assert table.manifest()["committed"] == []  # nothing committed

    good = Chain([{"type": "tombstone_handler", "behavior": "drop_warn"}])
    rep2 = Replayer(table=table, chain=good, epoch="e1")
    results = rep2.replay(
        events, batch_width=N, max_pos=BASE_TS + N, start_pos=BASE_TS
    )
    assert not results[0]["skipped"]
    assert table.read(spark).count() == repositories_snapshot(spark, events).count()


def test_compaction_preserves_state_and_ledger(spark, events, tmp_path):
    # broadcast merge appends ~1 upsert file per bucket per batch (the
    # shuffle strategy rewrites whole buckets) -> that's the path that
    # accretes files and needs compaction
    table = LakeTable(
        str(tmp_path / "repositories"), n_buckets=16,
        discovery=False, merge_strategy="broadcast",
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e1")
    rep.replay(events, batch_width=1_000, max_pos=BASE_TS + N, start_pos=BASE_TS)
    before = table.read(spark).orderBy("repo", "path").collect()
    m0 = table.manifest()
    n_files_before = sum(len(fs) for fs in m0["buckets"].values())

    r = table.compact(spark, max_files_per_bucket=1)
    assert r["compacted_buckets"]  # something was over threshold
    m1 = table.manifest()
    n_files_after = sum(len(fs) for fs in m1["buckets"].values())
    assert n_files_after < n_files_before
    # contents identical, ledger untouched, replay still skips everything
    assert table.read(spark).orderBy("repo", "path").collect() == before
    assert m1["committed"] == m0["committed"]
    rep2 = _mk_replayer(spark, tmp_path)
    results = rep2.replay(
        events, batch_width=1_000, max_pos=BASE_TS + N, start_pos=BASE_TS
    )
    assert all(x["skipped"] for x in results)


def test_orphan_files_from_crashed_write_are_invisible(spark, events, tmp_path):
    # a merge that crashed AFTER writing data files but BEFORE the
    # manifest swap leaves orphans; readers must never see them and a
    # replay of the batch must converge to the same state
    import shutil

    rep = _mk_replayer(spark, tmp_path)
    rep.replay(events, batch_width=N, max_pos=BASE_TS + N, start_pos=BASE_TS)
    table = rep.table
    before = table.read(spark).orderBy("repo", "path").collect()
    # simulate the crash artifact: a stray data dir full of copied files
    data_root = os.path.join(table.root, "data")
    src = os.path.join(data_root, sorted(os.listdir(data_root))[0])
    shutil.copytree(src, os.path.join(data_root, "v99999999-b7-crashed"))
    assert table.read(spark).orderBy("repo", "path").collect() == before
    # ledger unaffected: replay still skips all committed batches
    rep2 = _mk_replayer(spark, tmp_path)
    assert all(
        r["skipped"]
        for r in rep2.replay(
            events, batch_width=N, max_pos=BASE_TS + N, start_pos=BASE_TS
        )
    )


def test_salted_replay_matches_oracle(spark, events, tmp_path):
    # north_rule: salted repartitioning on skewed repos — the two-phase
    # salted dedupe must produce the identical final table
    table = LakeTable(str(tmp_path / "t"), n_buckets=16)
    rep = Replayer(table=table, chain=Chain([]), epoch="e1", dedupe_salt=8)
    rep.replay(events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS)
    oracle = repositories_snapshot(spark, events)
    final = table.read(spark)
    assert final.count() == oracle.count()
    cmp = final.select("repo", "path", "content").join(
        oracle.select("repo", "path", F.col("content").alias("c2")),
        ["repo", "path"],
        "full_outer",
    )
    assert cmp.filter("content IS NULL OR c2 IS NULL OR content != c2").count() == 0


def test_empty_batch_commits_and_preserves_state(spark, events, tmp_path):
    # a batch with zero events (LSN gap in the tail) must still commit
    # to the ledger (so resume skips it) and leave the table unchanged
    rep = _mk_replayer(spark, tmp_path)
    rep.replay(events, batch_width=N, max_pos=BASE_TS + N, start_pos=BASE_TS)
    before = rep.table.read(spark).orderBy("repo", "path").collect()
    empty = events.filter(F.lit(False))
    r = rep.apply_batch(empty, 99)
    assert not r["skipped"]
    assert rep.table.committed("e1", 99)
    assert rep.table.read(spark).orderBy("repo", "path").collect() == before
    # replaying the empty batch again is a ledger no-op
    assert rep.apply_batch(empty, 99)["skipped"]


def test_sparse_broadcast_merge_matches_oracle(spark, events, tmp_path):
    # discovery=True + broadcast: prune to touched buckets AND stream
    # survivors with zero exchange — the 100 TB default combination
    table = LakeTable(
        str(tmp_path / "t"), n_buckets=32,
        discovery=True, merge_strategy="broadcast",
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e1")
    results = rep.replay(
        events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS
    )
    assert all(isinstance(r.get("touched_buckets"), list) for r in results)
    oracle = repositories_snapshot(spark, events)
    final = table.read(spark)
    assert final.count() == oracle.count()
    cmp = final.select("repo", "path", "content").join(
        oracle.select("repo", "path", F.col("content").alias("c2")),
        ["repo", "path"],
        "full_outer",
    )
    assert cmp.filter("content IS NULL OR c2 IS NULL OR content != c2").count() == 0


def test_merge_on_read_replay_matches_oracle(spark, events, tmp_path):
    # append (MoR) strategy: batches only append deltas; reads resolve
    # LWW by _lsn; final state must equal the COW/oracle result,
    # including deletes (marker rows)
    table = LakeTable(
        str(tmp_path / "t"), n_buckets=16,
        discovery=False, merge_strategy="append",
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e1")
    rep.replay(events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS)
    assert table.manifest()["mor"]
    oracle = repositories_snapshot(spark, events)
    final = table.read(spark)
    assert final.count() == oracle.count()
    cmp = final.select("repo", "path", "content").join(
        oracle.select("repo", "path", F.col("content").alias("c2")),
        ["repo", "path"],
        "full_outer",
    )
    assert cmp.filter("content IS NULL OR c2 IS NULL OR content != c2").count() == 0

    before = final.orderBy("repo", "path").collect()
    # compaction folds the per-batch deltas; contents unchanged
    r = table.compact(spark, max_files_per_bucket=1)
    assert r["compacted_buckets"]
    assert table.read(spark).orderBy("repo", "path").collect() == before
    # ledger intact: resumed replay skips everything
    rep2 = Replayer(table=table, chain=Chain([]), epoch="e1")
    assert all(
        x["skipped"]
        for x in rep2.replay(
            events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS
        )
    )


def test_full_compaction_graduates_mor_to_plain_reads(spark, events, tmp_path):
    # compact(all_buckets=True) folds every delta, clears the mor flag
    # and drops the _deleted marker from the schema — subsequent reads
    # skip the per-key LWW aggregate entirely
    table = LakeTable(
        str(tmp_path / "t"), n_buckets=8,
        discovery=False, merge_strategy="append",
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e1")
    rep.replay(events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS)
    assert table.manifest()["mor"]
    before = table.read(spark).orderBy("repo", "path").collect()

    r = table.compact(spark, all_buckets=True)
    m = table.manifest()
    assert r["compacted_buckets"] and not m["mor"]
    assert "_deleted" not in {f["name"] for f in m["schema"]["fields"]}
    after = table.read(spark)
    plan = after._jdf.queryExecution().executedPlan().toString()
    assert "max_by" not in plan  # plain scan, no resolution aggregate
    assert after.orderBy("repo", "path").collect() == before
    # ledger survives: resumed replay is a full skip
    rep2 = Replayer(table=table, chain=Chain([]), epoch="e1")
    assert all(
        x["skipped"]
        for x in rep2.replay(
            events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS
        )
    )


def test_mor_then_cow_keeps_resolution(spark, events, tmp_path):
    # a persistent table root can see different --merge-strategy flags
    # across invocations: append (MoR) commits first, then a COW merge.
    # The COW commit only rewrites its touched buckets — untouched
    # buckets still hold unresolved delta files (duplicate key versions
    # + _deleted markers), so the manifest must keep the mor flag (and
    # a superset schema incl. _deleted) or reads skip _resolve_mor and
    # resurface deleted rows.
    root = str(tmp_path / "t")
    mid = BASE_TS + N // 2
    t1 = LakeTable(root, n_buckets=16, discovery=False, merge_strategy="append")
    Replayer(table=t1, chain=Chain([]), epoch="e1").replay(
        events, batch_width=2_500, max_pos=mid, start_pos=BASE_TS
    )
    assert t1.manifest()["mor"]
    t2 = LakeTable(root, n_buckets=16, discovery=True, merge_strategy="shuffle")
    Replayer(table=t2, chain=Chain([]), epoch="e2").replay(
        events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=mid
    )
    m = t2.manifest()
    assert m.get("mor"), "COW commit dropped the mor flag"
    assert "_deleted" in {f["name"] for f in m["schema"]["fields"]}
    oracle = repositories_snapshot(spark, events)
    final = t2.read(spark)
    assert final.count() == oracle.count()
    cmp = final.select("repo", "path", "content").join(
        oracle.select("repo", "path", F.col("content").alias("c2")),
        ["repo", "path"],
        "full_outer",
    )
    assert cmp.filter("content IS NULL OR c2 IS NULL OR content != c2").count() == 0


def test_periodic_compaction_in_replay(spark, events, tmp_path):
    table = LakeTable(
        str(tmp_path / "t"), n_buckets=16,
        discovery=False, merge_strategy="broadcast",
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e1",
                   compact_every=4, compact_max_files_per_bucket=1)
    rep.replay(events, batch_width=1_000, max_pos=BASE_TS + N, start_pos=BASE_TS)
    n_files = sum(len(fs) for fs in table.manifest()["buckets"].values())
    # 10 batches without compaction would leave >10 files/bucket tails;
    # compaction every 4 keeps the live set near 1-2 per bucket
    assert n_files <= 3 * 16
    oracle = repositories_snapshot(spark, events)
    assert table.read(spark).count() == oracle.count()


def test_full_compaction_of_fully_deleted_bucket(spark, tmp_path):
    # regression (r2 review): a MoR bucket whose resolution yields ZERO
    # rows (every key deleted) must leave the manifest on full
    # compaction — otherwise its unresolved base+marker rows resurface
    # once the mor flag is cleared
    def env(rows):
        return spark.createDataFrame(
            rows,
            "topic string, partition int, key struct<repo:string,path:string>, "
            "value struct<op:string,lsn:bigint,ts_ms:bigint,"
            "after:struct<content:string>>, "
            "timestamp long, headers map<string,string>",
        )

    table = LakeTable(
        str(tmp_path / "t"), n_buckets=4,
        discovery=False, merge_strategy="append",
    )
    rep = Replayer(table=table, chain=Chain([]), epoch="e1", unique_lsn=True)
    rep.apply_batch(
        env([
            ("t", 0, ("r", "a"), ("c", 1, 1, ("v1",)), 1, None),
            ("t", 0, ("r", "b"), ("c", 2, 2, ("v2",)), 2, None),
        ]),
        0,
    )
    rep.apply_batch(
        env([
            ("t", 0, ("r", "a"), ("d", 3, 3, None), 3, None),
            ("t", 0, ("r", "b"), ("d", 4, 4, None), 4, None),
        ]),
        1,
    )
    assert table.read(spark).count() == 0
    r = table.compact(spark, all_buckets=True)
    assert not table.manifest()["mor"]
    assert table.read(spark).count() == 0, "deleted rows resurrected"


def test_read_changes_since_table_creation(spark, events, tmp_path):
    # since_version=0 (the virtual empty manifest) returns everything
    table = LakeTable(
        str(tmp_path / "t"), n_buckets=8,
        discovery=False, merge_strategy="append",
    )
    Replayer(table=table, chain=Chain([]), epoch="e1").replay(
        events, batch_width=5_000, max_pos=BASE_TS + N, start_pos=BASE_TS
    )
    changes = table.read_changes(spark, since_version=0)
    live = events.filter(F.col("value").isNotNull())
    n_keys = live.select("key").distinct().count()
    assert changes.count() == n_keys


def test_lineage_dataframe(spark, events, tmp_path):
    table = LakeTable(str(tmp_path / "t"), n_buckets=8, discovery=True)
    rep = Replayer(table=table, chain=Chain([]), epoch="e1")
    rep.replay(events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS)
    lin = table.lineage(spark)
    assert {"epoch", "batch_id", "bucket", "n_updates", "min_lsn", "max_lsn"} <= set(
        lin.columns
    )
    rows = lin.collect()
    assert rows and all(r["epoch"] == "e1" for r in rows)
    assert lin.select("batch_id").distinct().count() == 4
    # per-bucket counts sum to the per-batch post-LWW update counts
    assert all(r["n_updates"] > 0 for r in rows)
    assert all(
        r["min_lsn"] is not None and r["min_lsn"] <= r["max_lsn"] for r in rows
    )


def test_read_changes_mor_changefeed(spark, events, tmp_path):
    # MoR incremental read: the delta rows committed after a version,
    # LWW-resolved in the window, deletes flagged — Delta-CDF analog
    table = LakeTable(
        str(tmp_path / "t"), n_buckets=8,
        discovery=False, merge_strategy="append",
    )
    mid = BASE_TS + N // 2
    Replayer(table=table, chain=Chain([]), epoch="e1").replay(
        events, batch_width=2_500, max_pos=mid, start_pos=BASE_TS
    )
    v_mid = table.manifest()["version"]
    Replayer(table=table, chain=Chain([]), epoch="e2").replay(
        events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=mid
    )
    changes = table.read_changes(spark, since_version=v_mid)

    second = events.filter(
        (F.col("timestamp") >= mid) & F.col("value").isNotNull()
    )
    expected = (
        second.groupBy("key")
        .agg(F.max_by(F.struct("value.op", "value.lsn"), F.col("value.lsn")).alias("w"))
        .select(
            F.col("key.repo").alias("repo"),
            F.col("key.path").alias("path"),
            (F.col("w.op") == "d").alias("del_expected"),
        )
    )
    cmp = changes.select("repo", "path", "_deleted").join(
        expected, ["repo", "path"], "full_outer"
    )
    assert cmp.filter(
        "_deleted IS NULL OR del_expected IS NULL OR _deleted != del_expected"
    ).count() == 0

    # COW commits in the window are rejected (no row-level change log)
    cow = LakeTable(str(tmp_path / "t"), n_buckets=8, merge_strategy="shuffle")
    Replayer(table=cow, chain=Chain([]), epoch="e3").apply_batch(
        events.filter(F.col("timestamp") < BASE_TS + 100), 0
    )
    with pytest.raises(ValueError, match="merge-on-read"):
        table.read_changes(spark, since_version=v_mid)
    with pytest.raises(ValueError, match="not before"):
        table.read_changes(spark, since_version=table.manifest()["version"])


def test_time_travel_read(spark, events, tmp_path):
    # every commit's manifest is retained (until vacuumed): read(version=)
    # reproduces the exact table state after any earlier batch
    table = LakeTable(str(tmp_path / "t"), n_buckets=8)
    rep = Replayer(table=table, chain=Chain([]), epoch="e1")
    mid = BASE_TS + N // 2
    rep.replay(events, batch_width=2_500, max_pos=mid, start_pos=BASE_TS)
    v_mid = table.manifest()["version"]
    state_mid = table.read(spark).orderBy("repo", "path").collect()
    rep2 = Replayer(table=table, chain=Chain([]), epoch="e2")
    rep2.replay(events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=mid)
    assert table.manifest()["version"] > v_mid
    # historical snapshot identical to the live state captured then
    assert table.read(spark, version=v_mid).orderBy(
        "repo", "path"
    ).collect() == state_mid
    # and the current state reflects the full replay
    oracle = repositories_snapshot(spark, events)
    assert table.read(spark).count() == oracle.count()
    # vacuum with retention 1 expires the old snapshot
    table.vacuum(keep_versions=1, orphan_grace_seconds=0)
    with pytest.raises(FileNotFoundError):
        table.manifest(version=v_mid)


def test_dlq_mode_quarantines_and_commits(spark, events, tmp_path):
    # errors.tolerance=all analog: with a fail-mode TombstoneHandler the
    # batch normally aborts; in dlq mode the tombstones are quarantined
    # (JSON envelope + exact reference message) and everything else
    # merges — final state equals the oracle, and replay is idempotent
    # for both table and DLQ
    chain = Chain([
        {"type": "tombstone_handler", "behavior": "fail"},
        # mutator stage so the LWW-pushdown branch (pre-stage errors on
        # rows the winner machinery would drop) is exercised
        {"type": "concat_fields", "field.names": ["op", "lsn"],
         "output.field.name": "op_lsn", "delimiter": ":"},
    ])
    table = LakeTable(str(tmp_path / "t"), n_buckets=8)
    dlq_dir = str(tmp_path / "dlq")
    rep = Replayer(table=table, chain=chain, epoch="e1",
                   error_mode="dlq", dlq_dir=dlq_dir)
    results = rep.replay(
        events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS
    )
    assert all(not r.get("skipped") for r in results)
    n_tomb = events.filter(F.col("value").isNull()).count()
    assert n_tomb > 0
    assert sum(r.get("n_dlq", 0) for r in results) == n_tomb

    dlq = spark.read.parquet(dlq_dir)
    assert dlq.count() == n_tomb
    assert dlq.filter(
        F.col("error").startswith("Tombstone record encountered")
    ).count() == n_tomb
    assert {"key_json", "value_json", "topic", "timestamp"} <= set(dlq.columns)

    oracle = repositories_snapshot(spark, events)
    final = table.read(spark)
    assert final.count() == oracle.count()
    cmp = final.select("repo", "path", "content").join(
        oracle.select("repo", "path", F.col("content").alias("c2")),
        ["repo", "path"],
        "full_outer",
    )
    assert cmp.filter("content IS NULL OR c2 IS NULL OR content != c2").count() == 0

    # replay: ledger skips, DLQ unchanged (overwrite-idempotent dirs)
    rep2 = Replayer(table=table, chain=chain, epoch="e1",
                    error_mode="dlq", dlq_dir=dlq_dir)
    assert all(
        r["skipped"]
        for r in rep2.replay(
            events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS
        )
    )
    assert spark.read.parquet(dlq_dir).count() == n_tomb


def test_dlq_config_validation(tmp_path):
    with pytest.raises(ValueError, match="error_mode"):
        Replayer(table=LakeTable(str(tmp_path / "x")), error_mode="explode")
    with pytest.raises(ValueError, match="dlq_dir"):
        Replayer(table=LakeTable(str(tmp_path / "y")), error_mode="dlq")


def test_bucket_config_adopted_from_manifest(spark, events, tmp_path):
    # opening an existing table with a different n_buckets must adopt
    # the stored layout — a mismatched bucket expr would make discovery
    # prune the WRONG target files and duplicate keys on merge
    root = str(tmp_path / "t")
    t1 = LakeTable(root, n_buckets=16, discovery=True)
    mid = BASE_TS + N // 2
    Replayer(table=t1, chain=Chain([]), epoch="e1").replay(
        events, batch_width=2_500, max_pos=mid, start_pos=BASE_TS
    )
    # "wrong" constructor args: adopted from the manifest instead
    t2 = LakeTable(root, n_buckets=64, discovery=True)
    assert t2.n_buckets == 16
    Replayer(table=t2, chain=Chain([]), epoch="e2").replay(
        events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=mid
    )
    oracle = repositories_snapshot(spark, events)
    final = t2.read(spark)
    assert final.count() == oracle.count()
    assert final.groupBy("repo", "path").count().filter("count > 1").count() == 0


def test_rescale_changes_bucketing_preserves_state(spark, events, tmp_path):
    root = str(tmp_path / "t")
    table = LakeTable(root, n_buckets=4, discovery=True)
    mid = BASE_TS + N // 2
    Replayer(table=table, chain=Chain([]), epoch="e1").replay(
        events, batch_width=2_500, max_pos=mid, start_pos=BASE_TS
    )
    before = table.read(spark).orderBy("repo", "path").collect()
    r = table.rescale(spark, 32)
    assert r["n_buckets"] == 32 and table.n_buckets == 32
    assert table.manifest()["n_buckets"] == 32
    assert table.read(spark).orderBy("repo", "path").collect() == before
    # merges after the rescale use the new layout and stay correct
    Replayer(table=table, chain=Chain([]), epoch="e2").replay(
        events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=mid
    )
    oracle = repositories_snapshot(spark, events)
    assert table.read(spark).count() == oracle.count()
    # a fresh handle adopts the new count
    assert LakeTable(root, n_buckets=4).n_buckets == 32


def test_vacuum_removes_orphans_keeps_live(spark, events, tmp_path):
    table = LakeTable(str(tmp_path / "t"), n_buckets=8)
    rep = Replayer(table=table, chain=Chain([]), epoch="e1")
    rep.replay(events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS)
    before = table.read(spark).orderBy("repo", "path").collect()

    # simulate a crashed merge: an orphaned version directory with files
    orphan_dir = tmp_path / "t" / "data" / "v99999999-b9"
    orphan_dir.mkdir(parents=True)
    (orphan_dir / "part-junk.parquet").write_bytes(b"not really parquet")

    dry = table.vacuum(keep_versions=1, dry_run=True, orphan_grace_seconds=0)
    assert dry["deleted_files"] >= 1 and (orphan_dir / "part-junk.parquet").exists()

    # keep_versions=1: only files the CURRENT manifest references survive
    r = table.vacuum(keep_versions=1, orphan_grace_seconds=0)
    assert r["deleted_files"] == dry["deleted_files"]
    assert not orphan_dir.exists()  # orphan dir fully removed
    # COW replay rewrote buckets every batch: replaced files are gone too
    import glob as _glob

    live = {
        os.path.realpath(table._abs(p))
        for fs in table.manifest()["buckets"].values()
        for p in fs
    }
    on_disk = {
        os.path.realpath(p)
        for p in _glob.glob(str(tmp_path / "t" / "data" / "**" / "*.parquet"),
                            recursive=True)
    }
    assert on_disk == live
    # table contents and ledger untouched
    assert table.read(spark).orderBy("repo", "path").collect() == before
    rep2 = Replayer(table=table, chain=Chain([]), epoch="e1")
    assert all(
        x["skipped"]
        for x in rep2.replay(
            events, batch_width=2_500, max_pos=BASE_TS + N, start_pos=BASE_TS
        )
    )
    # manifests beyond retention were expired
    assert r["expired_manifests"] >= 1


def test_transform_metrics_in_result(spark, events, tmp_path):
    chain = Chain(
        [
            {"type": "tombstone_handler", "behavior": "drop_silent",
             "observe_name": "tombstones"},
            {"type": "filter_by_field_value", "field.name": "op",
             "field.value": "r", "field.value.matches": False,
             "observe_name": "snapshot_reads"},
        ]
    )
    table = LakeTable(str(tmp_path / "t"), n_buckets=8)
    rep = Replayer(table=table, chain=chain, epoch="m1")
    [result] = rep.replay(
        events, batch_width=N, max_pos=BASE_TS + N, start_pos=BASE_TS
    )
    m = result["transform_metrics"]
    n_tomb = events.filter(F.col("value").isNull()).count()
    n_reads = events.filter(F.col("value.op") == "r").count()
    assert m["tombstones"]["dropped"] == n_tomb
    assert m["snapshot_reads"]["dropped"] == n_reads


def test_route_and_mutate_metrics_in_result(spark, events, tmp_path):
    # north_star: "transform-level drop/route/mutate metrics" — all three
    # kinds ride the one batch action via observe()
    chain = Chain(
        [
            {"type": "tombstone_handler", "behavior": "drop_silent",
             "observe_name": "tomb"},
            {"type": "hash", "field.name": "after.content",
             "function": "sha256", "skip.missing.or.null": True,
             "observe_name": "content_hash"},
        ]
    )
    table = LakeTable(str(tmp_path / "t"), n_buckets=8)
    rep = Replayer(table=table, chain=chain, epoch="m2", lww_pushdown=False)
    [result] = rep.replay(
        events, batch_width=N, max_pos=BASE_TS + N, start_pos=BASE_TS
    )
    m = result["transform_metrics"]
    n_with_after = events.filter(F.col("value.after").isNotNull()).count()
    assert m["content_hash"]["mutated"] == n_with_after
    assert m["tomb"]["dropped"] == events.filter(F.col("value").isNull()).count()


def test_all_errored_batch_cannot_commit(spark, tmp_path):
    """A batch whose EVERY record is errored (fail-mode tombstones)
    must fail, not commit as 'verifiably empty' — errored rows are
    dropped before the update set, so n_updates == 0 and a pruned
    metrics node do NOT imply no errors (regression: the empty-batch
    swallow path used to assume they did)."""
    import pytest as _pytest

    from transforms_for_apache_kafka_connect_spark.errors import DataException

    schema = (
        "topic string, partition int, key struct<repo:string,path:string>, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,"
        "after:struct<content:string>>, "
        "timestamp long, headers map<string,string>"
    )
    batch = spark.createDataFrame(
        [("t", 0, ("r0", "p0"), None, 1, None)], schema
    )
    table = LakeTable(str(tmp_path / "t"), n_buckets=2)
    rep = Replayer(
        table=table,
        chain=Chain([{"type": "tombstone_handler", "behavior": "fail"}]),
        epoch="e",
    )
    with _pytest.raises(DataException, match="Tombstone record"):
        rep.apply_batch(batch, 0)
    assert not table.committed("e", 0)

    # DLQ mode: the same all-errored batch quarantines instead
    dlq = str(tmp_path / "dlq")
    rep2 = Replayer(
        table=LakeTable(str(tmp_path / "t2"), n_buckets=2),
        chain=Chain([{"type": "tombstone_handler", "behavior": "fail"}]),
        epoch="e",
        error_mode="dlq",
        dlq_dir=dlq,
    )
    r = rep2.apply_batch(batch, 0)
    assert r.get("n_dlq") == 1
    assert spark.read.parquet(dlq).count() == 1

    # a TRULY empty batch still commits as a benign ledger-only entry
    empty = spark.createDataFrame([], schema)
    r3 = rep.apply_batch(empty, 1)
    assert r3["skipped"] is False and table.committed("e", 1)
