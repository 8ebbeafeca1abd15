"""LakeCatalog laws: SQL temp views over lake tables (snapshot
semantics, refresh, tag/version pinning, router-root discovery, the
Replayer on_commit hook) — the ``spark.sql`` consumer surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.errors import ConfigException
from transforms_for_apache_kafka_connect_spark.sources import change_stream
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeCatalog,
    LakeTable,
    Replayer,
)

N = 4_000


def _rows(df, cols=("repo", "path", "commit")):
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


@pytest.fixture()
def catalog(spark):
    cat = LakeCatalog(spark)
    yield cat
    for name in cat.names():
        cat.unregister(name)


def _build(spark, tmp_path, name="t1", first_half_only=False, **opts):
    table = LakeTable(root=str(tmp_path / name), n_buckets=8, **opts)
    rep = Replayer(table=table, chain=Chain([]), epoch="e1", unique_lsn=True)
    events = change_stream(spark, N, n_repos=40, paths_per_repo=6)
    hi = N // 2 if first_half_only else N
    rep.replay(
        events, batch_width=N // 2, max_pos=hi,
        slice_col="value.lsn",
    )
    return table, rep, events


def test_view_matches_read(spark, tmp_path, catalog):
    table, _, _ = _build(spark, tmp_path)
    catalog.register("repos", table)
    via_sql = spark.sql("SELECT repo, path, commit FROM repos")
    assert _rows(via_sql) == _rows(table.read(spark))
    # real SQL over the view: aggregation matches the DataFrame path
    agg = spark.sql(
        "SELECT lang, count(*) AS n FROM repos GROUP BY lang ORDER BY lang"
    ).collect()
    want = (
        table.read(spark).groupBy("lang").agg(F.count("*").alias("n"))
        .orderBy("lang").collect()
    )
    assert [tuple(r) for r in agg] == [tuple(r) for r in want]


def test_snapshot_isolation_then_refresh(spark, tmp_path, catalog):
    table, rep, events = _build(spark, tmp_path, first_half_only=True)
    catalog.register("repos", table)
    before = _rows(spark.table("repos"))
    # later commits must not leak into the registered view... (the
    # full-range replay ledger-skips the committed first half)
    rep.replay(
        events, batch_width=N // 2, max_pos=N, slice_col="value.lsn",
    )
    assert _rows(spark.table("repos")) == before
    # ...until an explicit refresh re-resolves to CURRENT
    catalog.refresh("repos")
    assert _rows(spark.table("repos")) == _rows(table.read(spark))
    assert _rows(spark.table("repos")) != before


def test_tag_and_version_pins(spark, tmp_path, catalog):
    table, rep, events = _build(spark, tmp_path, first_half_only=True)
    v_half = table.manifest()["version"]
    table.tag("audit", v_half)
    catalog.register("repos_audit", table, tag="audit")
    catalog.register("repos_v", table, version=v_half)
    frozen = _rows(spark.table("repos_audit"))
    assert frozen == _rows(spark.table("repos_v"))
    rep.replay(
        events, batch_width=N // 2, max_pos=N, slice_col="value.lsn",
    )
    catalog.refresh_all()
    # version pin is immutable; the tag still points at v_half
    assert _rows(spark.table("repos_v")) == frozen
    assert _rows(spark.table("repos_audit")) == frozen
    # re-point the tag -> the tag view FOLLOWS on refresh
    table.tag("audit", table.manifest()["version"])
    catalog.refresh("repos_audit")
    assert _rows(spark.table("repos_audit")) == _rows(table.read(spark))
    assert _rows(spark.table("repos_v")) == frozen


def test_mor_view_resolves_lww(spark, tmp_path, catalog):
    cow, _, _ = _build(spark, tmp_path, name="cow")
    mor, _, _ = _build(spark, tmp_path, name="mor", merge_strategy="append")
    catalog.register("cow_v", cow)
    catalog.register("mor_v", mor)
    assert _rows(spark.table("mor_v")) == _rows(spark.table("cow_v"))
    # and SQL can join the two registered views
    n = spark.sql(
        "SELECT count(*) AS n FROM cow_v c JOIN mor_v m "
        "ON c.repo = m.repo AND c.path = m.path WHERE c.commit = m.commit"
    ).first()["n"]
    assert n == spark.table("cow_v").count()


def test_register_root_discovers_tables(spark, tmp_path, catalog):
    root = tmp_path / "lake"
    root.mkdir()
    _build(spark, root, name="orders.v1")
    _build(spark, root, name="customer-dim")
    (root / "not_a_table").mkdir()  # no CURRENT pointer -> ignored
    names = catalog.register_root(str(root), prefix="lake_")
    assert names == ["lake_customer_dim", "lake_orders_v1"]
    assert spark.table("lake_orders_v1").count() > 0
    # sanitization collisions are refused, not silently shadowed
    _build(spark, root, name="orders_v1")
    with pytest.raises(ConfigException, match="sanitize"):
        catalog.register_root(str(root), prefix="lake_")


def test_on_commit_hook_tracks_ingest(spark, tmp_path, catalog):
    table = LakeTable(root=str(tmp_path / "t"), n_buckets=8)
    catalog.register("live", table)
    rep = Replayer(
        table=table, chain=Chain([]), epoch="e1", unique_lsn=True,
        on_commit=[catalog],
    )
    events = change_stream(spark, N, n_repos=40, paths_per_repo=6)
    rep.replay(events, batch_width=N // 2, max_pos=N, slice_col="value.lsn")
    # no manual refresh: the hook re-registered after each commit
    assert _rows(spark.table("live")) == _rows(table.read(spark))
    # replay (ledger skips) fires hooks too and is a harmless no-op
    rep.replay(events, batch_width=N // 2, max_pos=N, slice_col="value.lsn")
    assert _rows(spark.table("live")) == _rows(table.read(spark))


def test_staged_merges_never_fire_hooks(spark, tmp_path):
    calls = []
    table = LakeTable(root=str(tmp_path / "t"), n_buckets=8)
    rep = Replayer(
        table=table, chain=Chain([]), epoch="e1", unique_lsn=True,
        publish=False, on_commit=[calls.append],
    )
    events = change_stream(spark, N // 4, n_repos=20, paths_per_repo=4)
    rep.replay(
        events, batch_width=N // 4, max_pos=N // 4, slice_col="value.lsn"
    )
    assert calls == []  # staged state is not live -> no hook


def test_bad_names_and_unknown_views_refused(spark, tmp_path, catalog):
    table, _, _ = _build(spark, tmp_path)
    with pytest.raises(ConfigException, match="identifier"):
        catalog.register("bad-name", table)
    with pytest.raises(ConfigException, match="no registered view"):
        catalog.refresh("nope")


def test_where_baked_into_view(spark, tmp_path, catalog):
    table, _, _ = _build(spark, tmp_path)
    catalog.register("py_only", table, where=[("lang", "==", "py")])
    got = spark.table("py_only")
    assert got.count() == table.read(spark).filter(F.col("lang") == "py").count()
    assert {r["lang"] for r in got.select("lang").distinct().collect()} == {"py"}


def test_register_changes_sql_changelog(spark, tmp_path, catalog):
    table = LakeTable(root=str(tmp_path / "t"), n_buckets=8, changelog=True)
    rep = Replayer(table=table, chain=Chain([]), epoch="e1", unique_lsn=True)
    events = change_stream(spark, N, n_repos=40, paths_per_repo=6)
    rep.replay(events, batch_width=N // 2, max_pos=N // 2, slice_col="value.lsn")
    catalog.register_changes("repo_changes", table)
    kinds = {
        r["_change_type"]
        for r in spark.sql(
            "SELECT DISTINCT _change_type FROM repo_changes"
        ).collect()
    }
    assert "insert" in kinds
    n_before = spark.table("repo_changes").count()
    # SQL watermark tailing: committed batches only, batch_id filters
    assert spark.sql(
        "SELECT count(*) n FROM repo_changes WHERE batch_id >= 0"
    ).first()["n"] == n_before
    rep.replay(events, batch_width=N // 2, max_pos=N, slice_col="value.lsn")
    assert spark.table("repo_changes").count() == n_before  # snapshot
    catalog.refresh("repo_changes")
    assert spark.table("repo_changes").count() > n_before


def test_register_snapshot_consistent_joins(spark, tmp_path, catalog):
    from transforms_for_apache_kafka_connect_spark.streaming import (
        TransactionalRouter,
    )

    rows = [
        ("src", 0, ("r0", "p0"), ("c", 1, 1, ("a0",), "acme"), 1, None),
        ("src", 0, ("r1", "p0"), ("c", 2, 2, ("g0",), "globex"), 2, None),
    ]
    env = spark.createDataFrame(
        rows,
        "topic string, partition int, key struct<repo:string,path:string>, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,"
        "after:struct<content:string>,tenant:string>, "
        "timestamp long, headers map<string,string>",
    )
    router = TransactionalRouter(
        root=str(tmp_path / "tables"),
        chain=Chain([{"type": "extract_topic", "field.name": "tenant"}]),
        epoch="e1",
        table_opts={"n_buckets": 4},
        replayer_opts={"unique_lsn": True},
    )
    router.apply_batch(env, 0)
    names = catalog.register_snapshot(router, prefix="snap_")
    assert names == ["snap_acme", "snap_globex"]
    n = spark.sql(
        "SELECT count(*) n FROM snap_acme a CROSS JOIN snap_globex g"
    ).first()["n"]
    assert n == 1
    # a later transaction is invisible until refresh (snapshot isolation
    # for the SQL user), then appears across ALL views in one refresh
    env2 = spark.createDataFrame(
        [("src", 0, ("r0", "p1"), ("c", 3, 3, ("a1",), "acme"), 3, None),
         ("src", 0, ("r1", "p1"), ("c", 4, 4, ("g1",), "globex"), 4, None)],
        env.schema,
    )
    router.apply_batch(env2, 1)
    assert spark.table("snap_acme").count() == 1
    assert spark.table("snap_globex").count() == 1
    catalog.refresh_all()
    assert spark.table("snap_acme").count() == 2
    assert spark.table("snap_globex").count() == 2


def test_router_on_commit_keeps_views_current(spark, tmp_path, catalog):
    from transforms_for_apache_kafka_connect_spark.streaming import (
        TopicTableRouter,
    )

    def env(rows):
        return spark.createDataFrame(
            rows,
            "topic string, partition int, key struct<repo:string,path:string>, "
            "value struct<op:string,lsn:bigint,ts_ms:bigint,"
            "after:struct<content:string>,tenant:string>, "
            "timestamp long, headers map<string,string>",
        )

    router = TopicTableRouter(
        root=str(tmp_path / "tables"),
        chain=Chain([{"type": "extract_topic", "field.name": "tenant"}]),
        epoch="e1",
        table_opts={"n_buckets": 4},
        replayer_opts={"unique_lsn": True},
        on_commit=[catalog],
    )
    router.apply_batch(env(
        [("s", 0, ("r0", "p0"), ("c", 1, 1, ("a0",), "acme"), 1, None)]
    ), 0)
    catalog.register_root(str(tmp_path / "tables"))
    assert spark.table("acme").count() == 1
    router.apply_batch(env(
        [("s", 0, ("r0", "p1"), ("c", 2, 2, ("a1",), "acme"), 2, None)]
    ), 1)
    # no manual refresh: the router hook re-resolved the views
    assert spark.table("acme").count() == 2


def test_txn_on_commit_advances_snapshot_views(spark, tmp_path, catalog):
    from transforms_for_apache_kafka_connect_spark.streaming import (
        TransactionalRouter,
    )

    schema = (
        "topic string, partition int, key struct<repo:string,path:string>, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,"
        "after:struct<content:string>,tenant:string>, "
        "timestamp long, headers map<string,string>"
    )
    router = TransactionalRouter(
        root=str(tmp_path / "tables"),
        chain=Chain([{"type": "extract_topic", "field.name": "tenant"}]),
        epoch="e1",
        table_opts={"n_buckets": 4},
        replayer_opts={"unique_lsn": True},
        on_commit=[catalog],
    )
    router.apply_batch(spark.createDataFrame(
        [("s", 0, ("r0", "p0"), ("c", 1, 1, ("a0",), "acme"), 1, None),
         ("s", 0, ("r1", "p0"), ("c", 2, 2, ("g0",), "globex"), 2, None)],
        schema,
    ), 0)
    catalog.register_snapshot(router, prefix="live_")
    router.apply_batch(spark.createDataFrame(
        [("s", 0, ("r0", "p1"), ("c", 3, 3, ("a1",), "acme"), 3, None),
         ("s", 0, ("r1", "p1"), ("c", 4, 4, ("g1",), "globex"), 4, None)],
        schema,
    ), 1)
    assert spark.table("live_acme").count() == 2
    assert spark.table("live_globex").count() == 2


def test_refresh_all_pins_one_snapshot_per_router(spark, tmp_path, catalog):
    """A transaction landing mid-refresh must not pin sibling snapshot
    views at different transactions (torn-join prevention extends to
    the refresh cycle itself)."""
    from transforms_for_apache_kafka_connect_spark.streaming import (
        TransactionalRouter,
    )

    schema = (
        "topic string, partition int, key struct<repo:string,path:string>, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,"
        "after:struct<content:string>,tenant:string>, "
        "timestamp long, headers map<string,string>"
    )
    router = TransactionalRouter(
        root=str(tmp_path / "tables"),
        chain=Chain([{"type": "extract_topic", "field.name": "tenant"}]),
        epoch="e1", table_opts={"n_buckets": 4},
        replayer_opts={"unique_lsn": True},
    )
    router.apply_batch(spark.createDataFrame(
        [("s", 0, ("r0", "p0"), ("c", 1, 1, ("a0",), "acme"), 1, None),
         ("s", 0, ("r1", "p0"), ("c", 2, 2, ("g0",), "globex"), 2, None)],
        schema,
    ), 0)
    catalog.register_snapshot(router, prefix="pin_")
    router.apply_batch(spark.createDataFrame(
        [("s", 0, ("r0", "p1"), ("c", 3, 3, ("a1",), "acme"), 3, None),
         ("s", 0, ("r1", "p1"), ("c", 4, 4, ("g1",), "globex"), 4, None)],
        schema,
    ), 1)

    # simulate a txn landing mid-cycle: snapshot() advances between
    # the two views' refreshes unless refresh_all pinned one snapshot
    snaps = [router.snapshot(), None]
    router.apply_batch(spark.createDataFrame(
        [("s", 0, ("r0", "p2"), ("c", 5, 5, ("a2",), "acme"), 5, None),
         ("s", 0, ("r1", "p2"), ("c", 6, 6, ("g2",), "globex"), 6, None)],
        schema,
    ), 2)
    orig = type(router).snapshot
    calls = {"n": 0}

    def racing_snapshot(self):
        calls["n"] += 1
        # first call of the cycle sees txn 1, later calls see txn 2
        return snaps[0] if calls["n"] == 1 else orig(self)

    import types as _types

    router.snapshot = _types.MethodType(racing_snapshot, router)
    catalog.refresh_all()
    assert calls["n"] == 1, "refresh_all must resolve snapshot() once"
    assert spark.table("pin_acme").count() == spark.table("pin_globex").count() == 2


def test_changelog_view_survives_changelog_vacuum(spark, tmp_path, catalog):
    table = LakeTable(root=str(tmp_path / "t"), n_buckets=8, changelog=True)
    rep = Replayer(table=table, chain=Chain([]), epoch="e1", unique_lsn=True)
    events = change_stream(spark, N, n_repos=40, paths_per_repo=6)
    rep.replay(events, batch_width=N // 4, max_pos=N, slice_col="value.lsn")
    catalog.register_changes("chg", table)
    n_all = spark.table("chg").count()
    # vacuum retention deletes old changelog dirs WITHOUT a manifest bump
    table.vacuum(keep_versions=10, changelog_keep_batches=1, orphan_grace_seconds=0)
    catalog.refresh("chg")  # must NOT short-circuit onto the broken plan
    n_after = spark.table("chg").count()
    assert 0 < n_after < n_all


def test_txn_recovery_roll_forward_fires_hooks(spark, tmp_path, catalog):
    """A transaction published during replay-recovery becomes visible
    THERE — snapshot views must refresh, not wait for a later batch."""
    import json as _json

    from transforms_for_apache_kafka_connect_spark.streaming import (
        TransactionalRouter,
    )

    schema = (
        "topic string, partition int, key struct<repo:string,path:string>, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,"
        "after:struct<content:string>,tenant:string>, "
        "timestamp long, headers map<string,string>"
    )

    def mk_router(**kw):
        return TransactionalRouter(
            root=str(tmp_path / "tables"),
            chain=Chain([{"type": "extract_topic", "field.name": "tenant"}]),
            epoch="e1", table_opts={"n_buckets": 4},
            replayer_opts={"unique_lsn": True}, **kw,
        )

    router = mk_router()
    router.apply_batch(spark.createDataFrame(
        [("s", 0, ("r0", "p0"), ("c", 1, 1, ("a0",), "acme"), 1, None)],
        schema,
    ), 0)
    catalog.register_snapshot(router, prefix="rec_")
    # batch 1 "crashes" after the decision record: stage + decide only
    b1 = spark.createDataFrame(
        [("s", 0, ("r0", "p1"), ("c", 2, 2, ("a1",), "acme"), 2, None)],
        schema,
    )
    r = router.apply_batch(b1, 1)
    # rewind the decision to pre-roll-forward state (simulate the crash)
    dp = router._decision_path(1)
    d = _json.loads(open(dp).read())
    d["status"] = "commit"
    with open(dp, "w") as f:
        _json.dump(d, f)
    hooked = mk_router(on_commit=[catalog])
    res = hooked.apply_batch(b1, 1)  # replay hits the roll-forward path
    assert res["skipped"] is True
    assert spark.table("rec_acme").count() == 2, "hook did not fire on recovery"


# ------------------------------------------------------ persistent store

def test_store_roundtrip_new_session(spark, tmp_path):
    """register with a store, open the catalog in a NEW SparkSession
    (isolated temp-view namespace = a fresh SQL consumer): the views
    resolve immediately and serve the tables' current state."""
    table, _, _ = _build(spark, tmp_path)
    store = str(tmp_path / "catalog.json")
    cat = LakeCatalog(spark, store=store)
    cat.register("repos", table)
    n = spark.sql("SELECT count(*) AS n FROM repos").first()["n"]
    assert n > 0

    s2 = spark.newSession()
    with pytest.raises(Exception):
        s2.table("repos")  # temp views do NOT cross sessions on their own
    cat2 = LakeCatalog(s2, store=store)
    assert cat2.names() == ["repos"]
    assert s2.sql("SELECT count(*) AS n FROM repos").first()["n"] == n


def test_store_survives_commits_between_sessions(spark, tmp_path):
    """A commit landing between save and restore is visible after the
    restore — the store persists the SPEC (root + options), never data,
    so a restored view serves CURRENT state, not a stale copy (why
    saveAsTable-style registration was rejected)."""
    table, rep, events = _build(spark, tmp_path, first_half_only=True)
    store = str(tmp_path / "catalog.json")
    LakeCatalog(spark, store=store).register("repos", table)
    v1 = table.manifest()["version"]
    # second half lands AFTER the catalog was persisted (batch 0 is
    # ledger-skipped on the re-replay; batch 1 applies)
    rep.replay(events, batch_width=N // 2, max_pos=N, slice_col="value.lsn")
    assert table.manifest()["version"] > v1
    s2 = spark.newSession()
    LakeCatalog(s2, store=store)
    got = s2.sql("SELECT count(*) AS n FROM repos").first()["n"]
    want = table.read(s2).count()
    assert got == want


def test_store_pinned_version_and_unregister(spark, tmp_path):
    table, rep, events = _build(spark, tmp_path, first_half_only=True)
    v1 = table.manifest()["version"]
    n1 = table.read(spark).count()
    rep.replay(events, batch_width=N // 2, max_pos=N, slice_col="value.lsn")
    store = str(tmp_path / "catalog.json")
    cat = LakeCatalog(spark, store=store)
    cat.register("repos_v1", table, version=v1)
    cat.register("repos", table)
    cat.unregister("repos")
    s2 = spark.newSession()
    cat2 = LakeCatalog(s2, store=store)
    assert cat2.names() == ["repos_v1"]  # unregister persisted too
    assert s2.sql("SELECT count(*) AS n FROM repos_v1").first()["n"] == n1


def test_store_changes_view_and_options_roundtrip(spark, tmp_path):
    """A changelog view persists with the table's constructor options
    (key_cols/n_buckets/merge_strategy ride the spec) and restores as
    the same incremental-tail surface."""
    table = LakeTable(root=str(tmp_path / "t"), key_cols=["k"],
                      n_buckets=4, changelog=True, discovery=False,
                      merge_strategy="broadcast")
    upd = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 1)], "k long, v long, _lsn long"
    ).withColumn("__is_delete", F.lit(False))
    table.merge(upd, epoch="e", batch_id=0)
    store = str(tmp_path / "catalog.json")
    cat = LakeCatalog(spark, store=store)
    cat.register_changes("chg", table)
    n = spark.sql("SELECT count(*) AS n FROM chg").first()["n"]
    assert n == 2
    s2 = spark.newSession()
    cat2 = LakeCatalog(s2, store=store)
    assert cat2.names() == ["chg"]
    assert s2.sql("SELECT count(*) AS n FROM chg").first()["n"] == n
    assert s2.sql(
        "SELECT count(*) AS n FROM chg WHERE _change_type = 'insert'"
    ).first()["n"] == 2


def test_store_pending_registration_restores(spark, tmp_path):
    """A pending (pre-ingest) registration persists; after the first
    commit a new session's restore materializes the view directly."""
    table = LakeTable(root=str(tmp_path / "t"), key_cols=["k"],
                      n_buckets=4, discovery=False,
                      merge_strategy="broadcast")
    store = str(tmp_path / "catalog.json")
    cat = LakeCatalog(spark, store=store)
    assert cat.register("repos", table) is None  # pending
    upd = spark.createDataFrame(
        [(1, 10, 1)], "k long, v long, _lsn long"
    ).withColumn("__is_delete", F.lit(False))
    table.merge(upd, epoch="e", batch_id=0)
    s2 = spark.newSession()
    LakeCatalog(s2, store=store)
    assert s2.sql("SELECT count(*) AS n FROM repos").first()["n"] == 1


def test_store_shared_by_two_sessions_preserves_both(spark, tmp_path):
    """Two catalogs sharing one store must only ever touch their own
    names: a wholesale rewrite from either instance's memory would
    silently erase the other's registrations."""
    t1 = LakeTable(root=str(tmp_path / "t1"), key_cols=["k"], n_buckets=4,
                   discovery=False, merge_strategy="broadcast")
    t2 = LakeTable(root=str(tmp_path / "t2"), key_cols=["k"], n_buckets=4,
                   discovery=False, merge_strategy="broadcast")
    for t in (t1, t2):
        upd = spark.createDataFrame([(1, 1, 1)], "k long, v long, _lsn long")
        t.merge(upd.withColumn("__is_delete", F.lit(False)),
                epoch="e", batch_id=0)
    store = str(tmp_path / "catalog.json")
    s2 = spark.newSession()
    cat_a = LakeCatalog(spark, store=store)
    cat_b = LakeCatalog(s2, store=store)
    cat_a.register("a_view", t1)
    cat_b.register("b_view", t2)   # must not erase a_view from the store
    cat_a.register("a_view2", t1)  # must not erase b_view
    s3 = spark.newSession()
    cat3 = LakeCatalog(s3, store=store)
    assert cat3.names() == ["a_view", "a_view2", "b_view"]
    cat_a.unregister("a_view")  # drops ONLY its own name
    s4 = spark.newSession()
    assert LakeCatalog(s4, store=store).names() == ["a_view2", "b_view"]


def test_store_survives_failed_restore(spark, tmp_path):
    """A mid-restore failure (torn manifest, moved root) must leave
    the on-disk spec INTACT — restore never rewrites the store."""
    import json
    import shutil

    t1 = LakeTable(root=str(tmp_path / "t1"), key_cols=["k"], n_buckets=4,
                   discovery=False, merge_strategy="broadcast")
    upd = spark.createDataFrame([(1, 1, 1)], "k long, v long, _lsn long")
    t1.merge(upd.withColumn("__is_delete", F.lit(False)), epoch="e",
             batch_id=0)
    store = str(tmp_path / "catalog.json")
    cat = LakeCatalog(spark, store=store)
    cat.register("broken", LakeTable(root=str(tmp_path / "gone"),
                                     key_cols=["k"], n_buckets=4))
    cat.register("ok", t1)
    before = json.load(open(store))
    # break the first entry's table: its manifest dir vanishes
    shutil.rmtree(str(tmp_path / "gone"))
    (tmp_path / "gone" / "_manifest").mkdir(parents=True)
    with open(tmp_path / "gone" / "_manifest" / "CURRENT", "w") as f:
        f.write("99")  # points at a manifest that does not exist
    s2 = spark.newSession()
    with pytest.raises(Exception):
        LakeCatalog(s2, store=store)
    assert json.load(open(store)) == before, "restore rewrote the store"
