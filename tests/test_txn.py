"""Cross-table transactional delivery (streaming/txn.py).

A binlog transaction spans several tables; Kafka Connect delivers each
topic independently (the reference has no cross-topic atomicity — see
SURVEY §2.3), so a joining reader can observe a torn transaction.
``TransactionalRouter`` stages every topic with write-audit-publish,
writes ONE atomic decision record, then rolls the publishes forward —
these tests drive every crash point of that protocol.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.errors import DataException
from transforms_for_apache_kafka_connect_spark.streaming import (
    Expectation,
    TransactionalRouter,
)


def _cdc_env(spark, rows):
    return spark.createDataFrame(
        rows,
        "topic string, partition int, key struct<repo:string,path:string>, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,"
        "after:struct<content:string>,tenant:string>, "
        "timestamp long, headers map<string,string>",
    )


def _tenant_rows():
    return [
        ("src", 0, ("r0", "p0"), ("c", 1, 1, ("a-old",), "acme"), 1, None),
        ("src", 0, ("r0", "p0"), ("u", 5, 5, ("a-new",), "acme"), 5, None),
        ("src", 0, ("r0", "p1"), ("c", 2, 2, ("a-gone",), "acme"), 2, None),
        ("src", 0, ("r0", "p1"), ("d", 6, 6, None, "acme"), 6, None),
        ("src", 0, ("r0", "p1"), ("c", 3, 3, ("g-live",), "globex"), 3, None),
    ]


_CHAIN = [{"type": "extract_topic", "field.name": "tenant"}]


def _router(tmp_path, **kw):
    opts = dict(
        root=str(tmp_path / "tables"),
        chain=Chain(_CHAIN),
        epoch="e1",
        table_opts={"n_buckets": 4},
        replayer_opts={"unique_lsn": True},
    )
    opts.update(kw)
    return TransactionalRouter(**opts)


def _read_set(router, spark, topic):
    return {
        (r["path"], r["content"])
        for r in router.table_for(topic).read(spark).collect()
    }


def test_txn_commits_all_topics_and_is_exactly_once(spark, tmp_path):
    router = _router(tmp_path)
    r = router.apply_batch(_cdc_env(spark, _tenant_rows()), 0)
    assert r["topics"] == ["acme", "globex"]
    assert _read_set(router, spark, "acme") == {("p0", "a-new")}
    assert _read_set(router, spark, "globex") == {("p1", "g-live")}
    # snapshot pins BOTH topics at their post-transaction versions
    snap = router.snapshot()
    assert set(snap) == {"acme", "globex"}
    assert {
        (row["path"], row["content"])
        for row in router.read_consistent(spark, "acme").collect()
    } == {("p0", "a-new")}
    # decision record reached "done"
    d = json.load(open(router._decision_path(0)))
    assert d["status"] == "done" and d["versions"] == snap
    # exactly-once: replaying the batch is a no-op
    r2 = router.apply_batch(_cdc_env(spark, _tenant_rows()), 0)
    assert r2["skipped"] is True
    assert router.snapshot() == snap


def test_txn_abort_publishes_no_topic(spark, tmp_path):
    """A failure in ANY topic aborts the WHOLE transaction: the earlier
    topic was already staged, but without the decision record nothing
    becomes visible (presumed abort) — unlike TopicTableRouter's
    per-topic isolation."""
    router = _router(
        tmp_path,
        replayer_opts={
            "unique_lsn": True,
            "expectations": [
                Expectation("content_present", "content IS NOT NULL", "fail")
            ],
        },
    )
    rows = [
        # acme is clean; globex (sorted second) violates the expectation
        ("src", 0, ("r0", "p0"), ("c", 1, 1, ("a",), "acme"), 1, None),
        ("src", 0, ("r0", "p9"), ("c", 2, 2, (None,), "globex"), 2, None),
    ]
    with pytest.raises(DataException, match="content_present"):
        router.apply_batch(_cdc_env(spark, rows), 0)
    # no decision record, no visible data anywhere
    assert not os.path.exists(router._decision_path(0))
    assert router.table_for("acme").manifest()["committed"] == []
    assert router.table_for("globex").manifest()["committed"] == []
    assert router.snapshot() == {}
    # acme's staged manifest is an orphan awaiting vacuum, not a commit
    staged = [
        f for f in os.listdir(
            os.path.join(router.table_for("acme").root, "_manifest")
        )
        if "staged" in f or not f.startswith("v")
    ]
    assert staged  # something was staged then abandoned
    # the fixed batch replays from scratch and commits both topics
    fixed = [
        ("src", 0, ("r0", "p0"), ("c", 1, 1, ("a",), "acme"), 1, None),
        ("src", 0, ("r0", "p9"), ("c", 2, 2, ("g",), "globex"), 2, None),
    ]
    r = router.apply_batch(_cdc_env(spark, fixed), 0)
    assert r["topics"] == ["acme", "globex"]
    assert _read_set(router, spark, "globex") == {("p9", "g")}


def test_txn_crash_after_decision_rolls_forward(spark, tmp_path, monkeypatch):
    """Crash AFTER the decision record but before any publish: the
    transaction is committed — recover() (or a replay) must roll it
    forward, never abort it."""
    router = _router(tmp_path)

    boom = RuntimeError("crash before publish")

    def crash(self, decision):
        raise boom

    monkeypatch.setattr(TransactionalRouter, "_roll_forward", crash)
    with pytest.raises(RuntimeError, match="crash before publish"):
        router.apply_batch(_cdc_env(spark, _tenant_rows()), 0)
    monkeypatch.undo()

    # decision exists at the commit point; nothing visible yet
    d = json.load(open(router._decision_path(0)))
    assert d["status"] == "commit" and set(d["tokens"]) == {"acme", "globex"}
    assert router.table_for("acme").manifest()["committed"] == []
    assert router.snapshot() == {}

    out = router.recover()
    assert set(out["rolled_forward"]) == {0}
    assert _read_set(router, spark, "acme") == {("p0", "a-new")}
    assert _read_set(router, spark, "globex") == {("p1", "g-live")}
    assert set(router.snapshot()) == {"acme", "globex"}
    assert json.load(open(router._decision_path(0)))["status"] == "done"


def test_txn_crash_mid_publish_adopts_published_topic(
    spark, tmp_path, monkeypatch
):
    """Crash BETWEEN two publishes: acme live, globex still staged,
    decision not "done". The replay of the same batch must adopt acme's
    already-published commit (its staged manifest is gone) and publish
    globex — idempotent roll-forward."""
    from transforms_for_apache_kafka_connect_spark.streaming.sink import (
        LakeTable,
    )

    router = _router(tmp_path)
    real_publish = LakeTable.publish
    calls = {"n": 0}

    def publish_once_then_crash(self, token):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("crash mid-publish")
        return real_publish(self, token)

    monkeypatch.setattr(LakeTable, "publish", publish_once_then_crash)
    with pytest.raises(RuntimeError, match="crash mid-publish"):
        router.apply_batch(_cdc_env(spark, _tenant_rows()), 0)
    monkeypatch.undo()

    # torn on the read-committed surface: acme live, globex not
    assert _read_set(router, spark, "acme") == {("p0", "a-new")}
    assert router.table_for("globex").manifest()["committed"] == []
    # ...but the SNAPSHOT surface shows no torn state: pointer never
    # advanced, so read_consistent refuses both (no completed txn yet)
    assert router.snapshot() == {}
    with pytest.raises(KeyError):
        router.read_consistent(spark, "acme")

    # replaying the batch finishes the roll-forward
    r = router.apply_batch(_cdc_env(spark, _tenant_rows()), 0)
    assert r["skipped"] is True
    assert _read_set(router, spark, "globex") == {("p1", "g-live")}
    snap = router.snapshot()
    assert set(snap) == {"acme", "globex"}
    # acme was adopted at the version its pre-crash publish created
    live = {
        (row["path"], row["content"])
        for row in router.read_consistent(spark, "acme").collect()
    }
    assert live == {("p0", "a-new")}


def test_txn_snapshot_carries_untouched_topics_forward(spark, tmp_path):
    router = _router(tmp_path)
    router.apply_batch(_cdc_env(spark, _tenant_rows()), 0)
    snap0 = router.snapshot()
    # batch 1 touches only acme
    rows = [("src", 0, ("r0", "p7"), ("c", 9, 9, ("a2",), "acme"), 9, None)]
    router.apply_batch(_cdc_env(spark, rows), 1)
    snap1 = router.snapshot()
    assert snap1["globex"] == snap0["globex"]  # pinned, carried forward
    assert snap1["acme"] > snap0["acme"]
    # consistent read of globex at the carried-forward version works
    assert {
        (row["path"], row["content"])
        for row in router.read_consistent(spark, "globex").collect()
    } == {("p1", "g-live")}


def test_txn_replay_positions_and_cross_batch_lww(spark, tmp_path):
    router = _router(tmp_path)
    env = _cdc_env(spark, _tenant_rows())
    results = router.replay(env, batch_width=3, max_pos=7, start_pos=1)
    assert [r["batch_id"] for r in results] == [0, 1]
    assert _read_set(router, spark, "acme") == {("p0", "a-new")}
    assert _read_set(router, spark, "globex") == {("p1", "g-live")}
    # replaying the whole range again is a no-op on every batch
    again = router.replay(env, batch_width=3, max_pos=7, start_pos=1)
    assert all(r["skipped"] for r in again)


def test_txn_null_topic_aborts(spark, tmp_path):
    router = TransactionalRouter(
        root=str(tmp_path / "tables"), chain=None, epoch="e1",
        table_opts={"n_buckets": 2},
    )
    rows = [(None, 0, ("r0", "p0"), ("c", 1, 1, ("x",), "acme"), 1, None)]
    with pytest.raises(DataException, match="NULL topic"):
        router.apply_batch(_cdc_env(spark, rows), 0)
    assert not os.path.exists(router._decision_path(0))


def test_txn_dlq_mode_requires_dir(tmp_path):
    with pytest.raises(ValueError, match="dlq_dir"):
        TransactionalRouter(
            root=str(tmp_path / "t"),
            replayer_opts={"error_mode": "dlq"},
        )


def test_vacuum_pins_staged_commit_files_by_default(spark, tmp_path):
    """A staged (WAP) commit's data files must survive vacuum — a
    transaction participant awaiting roll-forward is in-flight, not
    garbage. drop_staged=True explicitly abandons it."""
    from transforms_for_apache_kafka_connect_spark.streaming import (
        LakeTable,
        Replayer,
    )

    table = LakeTable(str(tmp_path / "t"), n_buckets=2)
    rows = [("src", 0, ("r0", "p0"), ("c", 1, 1, ("x",), "acme"), 1, None)]
    rep = Replayer(table=table, chain=Chain([]), epoch="e", publish=False)
    token = rep.apply_batch(_cdc_env(spark, rows), 0)["staged"]

    out = table.vacuum(keep_versions=1, orphan_grace_seconds=0)
    assert out["staged_manifests"] == 1
    # only write markers may go; every staged parquet survives
    import glob as _glob

    assert _glob.glob(os.path.join(table.root, "data", "**", "*.parquet"),
                      recursive=True)
    # the staged commit is still publishable and reads intact
    table.publish(token)
    assert table.read(spark).count() == 1

    # a second staged commit, abandoned via drop_staged
    token2 = rep.apply_batch(_cdc_env(spark, [
        ("src", 0, ("r0", "p9"), ("c", 2, 2, ("y",), "acme"), 2, None)
    ]), 1)["staged"]
    out2 = table.vacuum(keep_versions=1, drop_staged=True, orphan_grace_seconds=0)
    assert out2["staged_dropped"] is True and out2["deleted_files"] >= 1
    assert not os.path.exists(
        os.path.join(table.root, "_manifest", f"{token2}.json")
    )
    # the live table is untouched
    assert table.read(spark).count() == 1


def test_txn_vacuum_recovers_then_reclaims(spark, tmp_path, monkeypatch):
    """Coordinator vacuum: a decided-but-unpublished transaction is
    rolled forward (its data survives), an undecided staged leftover
    is reclaimed."""
    router = _router(tmp_path)

    # txn 0: crash after the decision record, before any publish
    monkeypatch.setattr(
        TransactionalRouter, "_roll_forward",
        lambda self, d: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError):
        router.apply_batch(_cdc_env(spark, _tenant_rows()), 0)
    monkeypatch.undo()

    # an undecided (presumed-abort) staged leftover on acme
    from transforms_for_apache_kafka_connect_spark.streaming import Replayer

    orphan = Replayer(
        table=router.table_for("acme"), chain=Chain([]), epoch="dead",
        publish=False,
    )
    rows = [("acme", 0, ("r0", "zz"), ("c", 9, 9, ("orphan",), "acme"), 9, None)]
    orphan.apply_batch(_cdc_env(spark, rows), 0)

    out = router.vacuum(keep_versions=2, orphan_grace_seconds=0)
    # the decided transaction was rolled forward, not lost
    assert set(out["rolled_forward"]) == {0}
    assert _read_set(router, spark, "acme") == {("p0", "a-new")}
    assert _read_set(router, spark, "globex") == {("p1", "g-live")}
    # no staged manifest remains anywhere
    for t in ("acme", "globex"):
        staged = [
            f for f in os.listdir(
                os.path.join(router.table_for(t).root, "_manifest")
            )
            if f.startswith("staged-")
        ]
        assert staged == []


def test_txn_streaming_batches_are_transactions(spark, tmp_path):
    """File-source stream through the coordinator: per-micro-batch
    atomic cross-table commits; checkpoint restart is a no-op."""
    rows = _tenant_rows()
    src = str(tmp_path / "incoming")
    env = _cdc_env(spark, rows)
    env.filter(F.col("timestamp") <= 3).write.parquet(src + "/f1.parquet")
    env.filter(F.col("timestamp") > 3).write.parquet(src + "/f2.parquet")

    router = _router(tmp_path, epoch="s1")
    stream_df = spark.readStream.schema(env.schema).parquet(src + "/*")
    q = router.stream(stream_df, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)

    assert _read_set(router, spark, "acme") == {("p0", "a-new")}
    assert _read_set(router, spark, "globex") == {("p1", "g-live")}
    snap = router.snapshot()

    # restart from the same checkpoint: no new data, snapshot unchanged
    q2 = router.stream(stream_df, str(tmp_path / "ckpt"), available_now=True)
    q2.awaitTermination(120)
    assert router.snapshot() == snap


def test_txn_staged_replayer_rejects_maintained_aggregates(tmp_path):
    """publish=False merges can't fold maintained aggregates — the
    changelog only exists once the batch is live (engine.py guard)."""
    from transforms_for_apache_kafka_connect_spark.streaming import (
        LakeTable,
        Replayer,
    )

    table = LakeTable(str(tmp_path / "t"), n_buckets=2, changelog=True)
    with pytest.raises(ValueError, match="publish=False"):
        Replayer(
            table=table, chain=Chain([]), epoch="e", publish=False,
            maintain=[object()],
        )


def test_vacuum_pins_staged_changelog_batches(spark, tmp_path):
    """Review regression: a staged batch's (epoch, batch_id) lives only
    in the STAGED manifest's ledger until publish — vacuum must not
    reclaim its _changes dir, or the batch silently reads as
    change-free after publish."""
    from transforms_for_apache_kafka_connect_spark.streaming import (
        LakeTable,
        Replayer,
    )
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        batch_changes,
    )

    table = LakeTable(str(tmp_path / "t"), n_buckets=2, changelog=True)
    rows = [("src", 0, ("r0", "p0"), ("c", 1, 1, ("x",), "acme"), 1, None)]
    rep = Replayer(table=table, chain=Chain([]), epoch="e", publish=False)
    token = rep.apply_batch(_cdc_env(spark, rows), 0)["staged"]
    table.vacuum(keep_versions=1, orphan_grace_seconds=0)
    table.publish(token)
    assert table.has_changes("e", 0)
    assert batch_changes(table, spark, epoch="e", batch_id=0).count() == 1


def test_txn_vacuum_pins_snapshot_versions(spark, tmp_path):
    """Review regression: _txn/LAST versions are a live read surface —
    maintenance commits + vacuum must not expire the manifest
    read_consistent time-travels to."""
    router = _router(tmp_path)
    router.apply_batch(_cdc_env(spark, _tenant_rows()), 0)
    snap_before = router.snapshot()
    # out-of-band maintenance on acme advances its version twice
    t = router.table_for("acme")
    t.compact(spark, all_buckets=True)
    t.rescale(spark, 4)
    out = router.vacuum(keep_versions=1, orphan_grace_seconds=0)
    assert router.snapshot() == snap_before
    assert router.read_consistent(spark, "acme").count() == 1
    assert router.read_consistent(spark, "globex").count() == 1
