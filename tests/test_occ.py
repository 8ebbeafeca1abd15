"""Multi-writer optimistic concurrency (OCC) laws over the lake commit
protocol: the version claim IS the commit (manifest() rolls the head
forward over a crashed claimer's window), concurrent writers never
clobber each other's data files (unique per-attempt directories), a
loser whose read set is untouched rebases metadata-only, a loser whose
read set moved re-runs the merge, and every interleaving converges to
the same LWW state with an exactly-once ledger."""

from __future__ import annotations

import copy
import json
import os
import threading
import types
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.streaming import LakeTable
from transforms_for_apache_kafka_connect_spark.streaming.sink import _bucket_expr

N_BUCKETS = 4


def _upd(spark, rows):
    """rows: [(k, v, lsn)] -> update frame (no deletes)."""
    df = spark.createDataFrame(rows, "k long, v long, _lsn long")
    return df.withColumn("__is_delete", F.lit(False))


def _buckets_of(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    rows = df.select(
        "k", _bucket_expr(["k"], N_BUCKETS).alias("b")
    ).collect()
    return {r["k"]: r["b"] for r in rows}


def _state(spark, table):
    return {
        r["k"]: (r["v"], r["_lsn"])
        for r in table.read(spark).select("k", "v", "_lsn").collect()
    }


def _check_integrity(table):
    m = table.manifest()
    for fs in m["buckets"].values():
        for f in fs:
            assert os.path.exists(table._abs(f)), f"manifest references missing file {f}"
    seen = [tuple(e) for e in m["committed"]]
    assert len(seen) == len(set(seen)), f"duplicate ledger entries: {seen}"
    return m


def _make_stale_once(table):
    """Patch ``table.manifest()`` to serve a snapshot of the CURRENT
    manifest exactly once — simulating a writer that planned its merge
    before a concurrent commit landed. Returns a counter dict."""
    m0 = copy.deepcopy(table.manifest())
    calls = {"stale_served": 0}
    orig = LakeTable.manifest

    def fake(self, version=None):
        if version is None and calls["stale_served"] == 0:
            calls["stale_served"] += 1
            return copy.deepcopy(m0)
        return orig(self, version)

    table.manifest = types.MethodType(fake, table)
    return calls


def _count_merge_once(table):
    counter = {"n": 0}
    orig = table._merge_once

    def counted(*a, **kw):
        counter["n"] += 1
        return orig(*a, **kw)

    table._merge_once = counted
    return counter


@pytest.fixture(params=["shuffle", "broadcast"])
def cow_tables(request, spark, tmp_path):
    root = str(tmp_path / "t")
    a = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  merge_strategy=request.param)
    a.merge(_upd(spark, [(k, 0, 1) for k in range(20)]),
            epoch="seed", batch_id=0)
    b = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  merge_strategy=request.param)
    return a, b


def test_disjoint_bucket_conflict_rebases_without_rerun(spark, cow_tables):
    a, b = cow_tables
    bmap = _buckets_of(spark, range(20))
    keys_b0 = [k for k in range(20) if bmap[k] == 0]
    keys_not_b0 = [k for k in range(20) if bmap[k] != 0]
    assert keys_b0 and keys_not_b0

    calls = _make_stale_once(b)       # b plans against the pre-A state
    a.merge(_upd(spark, [(k, 10, 2) for k in keys_b0]),
            epoch="wa", batch_id=1)   # A commits first, touching bucket 0
    n_runs = _count_merge_once(b)
    b.merge(_upd(spark, [(k, 20, 2) for k in keys_not_b0]),
            epoch="wb", batch_id=1)   # B's read set excludes bucket 0
    assert calls["stale_served"] == 1
    assert n_runs["n"] == 1, "disjoint buckets must rebase, not re-run"

    m = _check_integrity(a)
    assert ["wa", 1] in m["committed"] and ["wb", 1] in m["committed"]
    st = _state(spark, a)
    for k in keys_b0:
        assert st[k] == (10, 2), "winner's commit was lost by the rebase"
    for k in keys_not_b0:
        assert st[k] == (20, 2)


def test_overlapping_bucket_conflict_reruns_merge(spark, cow_tables):
    a, b = cow_tables
    _make_stale_once(b)
    a.merge(_upd(spark, [(k, 10, 2) for k in range(20)]),
            epoch="wa", batch_id=1)
    n_runs = _count_merge_once(b)
    b.merge(_upd(spark, [(k, 20, 3) for k in range(0, 20, 2)]),
            epoch="wb", batch_id=1)
    assert n_runs["n"] == 2, "overlapping buckets must re-run against the head"

    m = _check_integrity(a)
    assert ["wa", 1] in m["committed"] and ["wb", 1] in m["committed"]
    st = _state(spark, a)
    for k in range(20):
        assert st[k] == ((20, 3) if k % 2 == 0 else (10, 2))


def test_append_mode_rebases_even_on_same_bucket(spark, tmp_path):
    root = str(tmp_path / "t")
    a = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  merge_strategy="append")
    a.merge(_upd(spark, [(k, 0, 1) for k in range(20)]),
            epoch="seed", batch_id=0)
    b = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  merge_strategy="append")
    _make_stale_once(b)
    a.merge(_upd(spark, [(k, 10, 2) for k in range(20)]),
            epoch="wa", batch_id=1)
    n_runs = _count_merge_once(b)
    b.merge(_upd(spark, [(k, 20, 3) for k in range(20)]),
            epoch="wb", batch_id=1)   # same buckets — appends never read
    assert n_runs["n"] == 1, "append merges read nothing: always rebase"
    m = _check_integrity(a)
    assert ["wa", 1] in m["committed"] and ["wb", 1] in m["committed"]
    assert _state(spark, a) == {k: (20, 3) for k in range(20)}


def test_changelog_append_on_same_bucket_reruns(spark, tmp_path):
    root = str(tmp_path / "t")
    a = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  merge_strategy="append", changelog=True)
    a.merge(_upd(spark, [(k, 0, 1) for k in range(20)]),
            epoch="seed", batch_id=0)
    b = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  merge_strategy="append", changelog=True)
    _make_stale_once(b)
    a.merge(_upd(spark, [(k, 10, 2) for k in range(20)]),
            epoch="wa", batch_id=1)
    n_runs = _count_merge_once(b)
    b.merge(_upd(spark, [(k, 20, 3) for k in range(20)]),
            epoch="wb", batch_id=1)
    # pre-images were resolved against the stale base -> must re-run
    assert n_runs["n"] == 2
    assert _state(spark, a) == {k: (20, 3) for k in range(20)}
    # the re-run's pre-images saw A's values, so B's changelog records
    # update_preimage v=10 (not the stale 0)
    pre = (
        a.read_changelog(spark, epoch="wb")
        .filter(
            (F.col("batch_id") == 1)
            & (F.col("_change_type") == "update_preimage")
        )
        .select("v").distinct().collect()
    )
    assert {r["v"] for r in pre} == {10}


def test_ledger_only_commit_rebases(spark, tmp_path):
    root = str(tmp_path / "t")
    a = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    a.merge(_upd(spark, [(1, 0, 1)]), epoch="seed", batch_id=0)
    b = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    _make_stale_once(b)
    a.merge(_upd(spark, [(1, 5, 2)]), epoch="wa", batch_id=1)
    r = b.commit_empty(epoch="wb", batch_id=1)
    assert not r["skipped"]
    m = _check_integrity(a)
    assert ["wa", 1] in m["committed"] and ["wb", 1] in m["committed"]
    assert _state(spark, a)[1] == (5, 2)


def test_crashed_claim_is_the_commit(spark, tmp_path):
    """A durably-written version claim whose writer died before the
    CURRENT repoint is still a commit: readers roll forward to it, the
    pointer heals, and the next writer builds on top of it."""
    root = str(tmp_path / "t")
    a = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    a.merge(_upd(spark, [(1, 0, 1)]), epoch="seed", batch_id=0)
    m1 = a.manifest()
    v1 = m1["version"]
    claim = dict(copy.deepcopy(m1))
    claim["version"] = v1 + 1
    claim["committed"] = m1["committed"] + [["crashed", 7]]
    with open(a._manifest_path(v1 + 1), "x") as f:
        json.dump(claim, f)
    # CURRENT still points at v1 — the claim must surface anyway
    m = a.manifest()
    assert m["version"] == v1 + 1
    assert a.committed("crashed", 7)
    with open(a._current_path) as f:
        assert int(f.read().strip()) == v1 + 1  # pointer healed
    r = a.merge(_upd(spark, [(2, 9, 3)]), epoch="next", batch_id=0)
    assert r["version"] == v1 + 2
    _check_integrity(a)


def test_threaded_writers_converge(spark, tmp_path):
    """Two real concurrent writers (threads sharing the Spark session,
    separate table handles), three batches each on disjoint key
    ranges: no lost updates, exactly-once ledger, intact files."""
    root = str(tmp_path / "t")
    LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS).merge(
        _upd(spark, [(k, 0, 1) for k in range(40)]), epoch="seed", batch_id=0
    )

    barrier = threading.Barrier(2)

    def writer(epoch, keys):
        t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
        barrier.wait()
        for bid in range(1, 4):
            t.merge(
                _upd(spark, [(k, 100 * bid, 10 + bid) for k in keys]),
                epoch=epoch, batch_id=bid,
            )

    with ThreadPoolExecutor(max_workers=2) as ex:
        fa = ex.submit(writer, "wa", list(range(0, 20)))
        fb = ex.submit(writer, "wb", list(range(20, 40)))
        fa.result(timeout=600)
        fb.result(timeout=600)

    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    m = _check_integrity(t)
    for e in ("wa", "wb"):
        for bid in range(1, 4):
            assert [e, bid] in m["committed"]
    assert _state(spark, t) == {k: (300, 13) for k in range(40)}


def test_threaded_same_batch_exactly_once(spark, tmp_path):
    """Two replayers racing the SAME (epoch, batch_id): exactly one
    ledger entry lands; the loser adopts or skips, never duplicates."""
    root = str(tmp_path / "t")
    LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS).merge(
        _upd(spark, [(k, 0, 1) for k in range(10)]), epoch="seed", batch_id=0
    )
    barrier = threading.Barrier(2)

    def replayer():
        t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
        barrier.wait()
        t.merge(
            _upd(spark, [(k, 7, 2) for k in range(10)]),
            epoch="e", batch_id=1,
        )

    with ThreadPoolExecutor(max_workers=2) as ex:
        f1, f2 = ex.submit(replayer), ex.submit(replayer)
        f1.result(timeout=600)
        f2.result(timeout=600)

    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    m = _check_integrity(t)
    assert m["committed"].count(["e", 1]) == 1
    assert _state(spark, t) == {k: (7, 2) for k in range(10)}


def test_single_writer_fast_path_unchanged(spark, tmp_path):
    """No conflict -> one _merge_once run, one version per batch, no
    retries: OCC must cost nothing on the happy path."""
    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    n_runs = _count_merge_once(t)
    for bid in range(3):
        r = t.merge(_upd(spark, [(k, bid, bid + 1) for k in range(10)]),
                    epoch="e", batch_id=bid)
        assert r["version"] == bid + 1
    assert n_runs["n"] == 3
    _check_integrity(t)


def test_compact_rebases_over_disjoint_commit(spark, tmp_path):
    """Compaction only READ the buckets it folded: a concurrent commit
    elsewhere rebases metadata-only and neither commit is lost."""
    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  merge_strategy="append")
    bmap = _buckets_of(spark, range(40))
    k0 = [k for k in range(40) if bmap[k] == 0]
    kn = [k for k in range(40) if bmap[k] != 0][:3]
    for bid in range(6):
        t.merge(_upd(spark, [(k, bid, bid + 1) for k in k0]),
                epoch="seed", batch_id=bid)
    c = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  merge_strategy="append")
    _make_stale_once(c)
    t.merge(_upd(spark, [(k, 99, 100) for k in kn]),
            epoch="wa", batch_id=10)   # lands between c's plan and claim
    r = c.compact(spark, max_files_per_bucket=2)
    assert 0 in r["compacted_buckets"]
    m = _check_integrity(t)
    assert ["wa", 10] in m["committed"]
    assert len(m["buckets"]["0"]) <= 2, "bucket 0 was not compacted"
    st = _state(spark, t)
    for k in k0:
        assert st[k] == (5, 6)
    for k in kn:
        assert st[k] == (99, 100)


def test_compact_conflict_in_folded_bucket_aborts(spark, tmp_path):
    """A commit INTO a bucket being folded invalidates the rewrite:
    compaction aborts loudly and the table keeps both data commits."""
    from transforms_for_apache_kafka_connect_spark.errors import (
        CommitConflictException,
    )

    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  merge_strategy="append")
    bmap = _buckets_of(spark, range(40))
    k0 = [k for k in range(40) if bmap[k] == 0]
    for bid in range(6):
        t.merge(_upd(spark, [(k, bid, bid + 1) for k in k0]),
                epoch="seed", batch_id=bid)
    c = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  merge_strategy="append")
    _make_stale_once(c)
    t.merge(_upd(spark, [(k0[0], 99, 100)]), epoch="wa", batch_id=10)
    with pytest.raises(CommitConflictException):
        c.compact(spark, max_files_per_bucket=2)
    st = _state(spark, t)
    assert st[k0[0]] == (99, 100)  # the conflicting commit survived
    _check_integrity(t)


def test_rescale_aborts_on_any_concurrent_data_commit(spark, tmp_path):
    from transforms_for_apache_kafka_connect_spark.errors import (
        CommitConflictException,
    )

    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    t.merge(_upd(spark, [(k, 0, 1) for k in range(20)]),
            epoch="seed", batch_id=0)
    r = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    _make_stale_once(r)
    t.merge(_upd(spark, [(1, 5, 2)]), epoch="wa", batch_id=1)
    with pytest.raises(CommitConflictException):
        r.rescale(spark, 8)
    assert _state(spark, t)[1] == (5, 2)
    _check_integrity(t)


def test_all_buckets_compact_rebase_keeps_mor_for_unseen_delta(spark, tmp_path):
    """compact(all_buckets=True) rebasing over a commit that appended
    deltas to a bucket EMPTY at plan time must NOT clear the mor flag —
    those delta files were never folded, and a plain scan would surface
    their _deleted markers."""
    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  merge_strategy="append")
    bmap = _buckets_of(spark, range(40))
    k0 = [k for k in range(40) if bmap[k] == 0]
    k1 = [k for k in range(40) if bmap[k] == 1]
    # seed ONLY bucket 0 (bucket 1 empty at the compactor's plan time),
    # with a delete marker that must never resurface
    t.merge(_upd(spark, [(k, 7, 1) for k in k0]), epoch="seed", batch_id=0)
    victim = k0[0]
    dele = (
        spark.createDataFrame([(victim, 2)], "k long, _lsn long")
        .withColumn("v", F.lit(None).cast("long"))
        .withColumn("__is_delete", F.lit(True))
        .select("k", "v", "_lsn", "__is_delete")
    )
    t.merge(dele, epoch="seed", batch_id=1)
    c = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  merge_strategy="append")
    _make_stale_once(c)
    # the interleaved commit appends deltas (incl. a delete) to bucket 1
    t.merge(_upd(spark, [(k, 9, 1) for k in k1]), epoch="wa", batch_id=0)
    d1 = (
        spark.createDataFrame([(k1[0], 2)], "k long, _lsn long")
        .withColumn("v", F.lit(None).cast("long"))
        .withColumn("__is_delete", F.lit(True))
        .select("k", "v", "_lsn", "__is_delete")
    )
    t.merge(d1, epoch="wa", batch_id=1)
    c.compact(spark, all_buckets=True)
    m = _check_integrity(t)
    assert m.get("mor") is True, "mor cleared while unfolded deltas exist"
    st = _state(spark, t)
    assert victim not in st and k1[0] not in st, "deleted keys resurfaced"
    for k in k0[1:]:
        assert st[k] == (7, 1)
    for k in k1[1:]:
        assert st[k] == (9, 1)
    # a quiesced full fold NOW clears the flag
    c2 = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                   merge_strategy="append")
    c2.compact(spark, all_buckets=True)
    assert c2.manifest().get("mor") is False
    assert victim not in _state(spark, t)


def test_staged_publish_rebases_over_disjoint_commit(spark, tmp_path):
    """WAP: a stage audited while another writer commits elsewhere
    publishes by metadata rebase — no re-staging, nothing lost."""
    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    t.merge(_upd(spark, [(k, 0, 1) for k in range(20)]),
            epoch="seed", batch_id=0)
    bmap = _buckets_of(spark, range(20))
    keys_b0 = [k for k in range(20) if bmap[k] == 0]
    keys_not_b0 = [k for k in range(20) if bmap[k] != 0]
    r = t.merge(_upd(spark, [(k, 20, 2) for k in keys_not_b0]),
                epoch="wap", batch_id=1, publish=False)
    # interleaved commit during the audit, in a bucket the stage never read
    t.merge(_upd(spark, [(k, 10, 2) for k in keys_b0]),
            epoch="wa", batch_id=1)
    pub = t.publish(r["staged"])
    assert pub.get("rebased") is True
    m = _check_integrity(t)
    assert ["wap", 1] in m["committed"] and ["wa", 1] in m["committed"]
    st = _state(spark, t)
    for k in keys_b0:
        assert st[k] == (10, 2)
    for k in keys_not_b0:
        assert st[k] == (20, 2)
    assert not os.path.exists(t._occ_sidecar_path(r["staged"].replace(".json", "")))


def test_staged_publish_conflict_in_read_set_refused(spark, tmp_path):
    from transforms_for_apache_kafka_connect_spark.errors import (
        CommitConflictException,
    )

    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    t.merge(_upd(spark, [(k, 0, 1) for k in range(20)]),
            epoch="seed", batch_id=0)
    r = t.merge(_upd(spark, [(k, 20, 2) for k in range(20)]),
                epoch="wap", batch_id=1, publish=False)
    t.merge(_upd(spark, [(0, 10, 2)]), epoch="wa", batch_id=1)
    with pytest.raises(CommitConflictException, match="re-stage"):
        t.publish(r["staged"])
    # the interleaved commit survived; the stage stayed un-published
    st = _state(spark, t)
    assert st[0] == (10, 2) and st[1] == (0, 1)
    m = _check_integrity(t)
    assert ["wap", 1] not in m["committed"]


def test_staged_append_publish_rebases_on_same_bucket(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  merge_strategy="append")
    t.merge(_upd(spark, [(k, 0, 1) for k in range(20)]),
            epoch="seed", batch_id=0)
    r = t.merge(_upd(spark, [(k, 20, 3) for k in range(20)]),
                epoch="wap", batch_id=1, publish=False)
    t.merge(_upd(spark, [(k, 10, 2) for k in range(20)]),
            epoch="wa", batch_id=1)
    pub = t.publish(r["staged"])
    assert pub.get("rebased") is True
    m = _check_integrity(t)
    assert ["wap", 1] in m["committed"] and ["wa", 1] in m["committed"]
    assert _state(spark, t) == {k: (20, 3) for k in range(20)}


def test_staged_publish_already_landed_is_idempotent(spark, tmp_path):
    """A publish retried after its ledger entry already landed (crash
    window / concurrent same-batch publisher) cleans up and reports."""
    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    t.merge(_upd(spark, [(k, 0, 1) for k in range(20)]),
            epoch="seed", batch_id=0)
    r = t.merge(_upd(spark, [(k, 20, 2) for k in range(20)]),
                epoch="wap", batch_id=1, publish=False)
    # the same logical batch lands through a different (published) path
    t.merge(_upd(spark, [(k, 20, 2) for k in range(20)]),
            epoch="wap", batch_id=1)
    # legal outcomes: same-ledger-tail adoption (identical tail means
    # identical logical commit) or the rebase loop's already-landed
    # detection — either way published exactly once
    pub = t.publish(r["staged"])
    assert pub["published"] is True
    m = _check_integrity(t)
    assert m["committed"].count(["wap", 1]) == 1
    assert _state(spark, t) == {k: (20, 2) for k in range(20)}


def test_concurrent_delete_where_different_predicates_both_land(spark, tmp_path):
    """Predicate-scoped maintenance epochs: two delete_where calls that
    planned at the same version must not collide into a ledger skip."""
    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    t.merge(_upd(spark, [(k, k % 3, 1) for k in range(30)]),
            epoch="seed", batch_id=0)
    d = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    _make_stale_once(d)
    r1 = t.delete_where(spark, "v = 1")
    r2 = d.delete_where(spark, "v = 2")
    assert not r1.get("skipped") and not r2.get("skipped")
    assert r1["epoch"] != r2["epoch"]
    st = _state(spark, t)
    assert st and all(v == 0 for v, _ in st.values())
    _check_integrity(t)


def test_publish_after_vacuum_expired_slot_never_rolls_back(spark, tmp_path):
    """A stage audited across many commits + a vacuum that expired its
    predicted version slot must NOT link into the freed slot (that
    would silently roll the table back to the stage's base)."""
    from transforms_for_apache_kafka_connect_spark.errors import (
        CommitConflictException,
    )

    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    t.merge(_upd(spark, [(k, 0, 1) for k in range(20)]),
            epoch="seed", batch_id=0)
    r = t.merge(_upd(spark, [(0, 50, 2)]), epoch="wap", batch_id=1,
                publish=False)
    # the table advances well past the stage's predicted slot...
    for bid in range(1, 6):
        t.merge(_upd(spark, [(k, 100 + bid, 10 + bid) for k in range(20)]),
                epoch="wa", batch_id=bid)
    head_before = t.manifest()["version"]
    # ...and vacuum expires the old manifests, freeing the slot
    t.vacuum(keep_versions=2, orphan_grace_seconds=0)
    assert not os.path.exists(t._manifest_path(r["version"]))
    with pytest.raises(CommitConflictException):
        t.publish(r["staged"])  # bucket 0 moved: rebase correctly refused
    m = _check_integrity(t)
    assert m["version"] >= head_before, "publish rolled the table back"
    assert _state(spark, t) == {k: (105, 15) for k in range(20)}


def test_ledger_stage_rebase_keeps_head_schema_evolution(spark, tmp_path):
    """A ledger-only stage publishing over a schema-evolving commit
    must union onto the HEAD's schema, not resurrect its stale copy."""
    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    t.merge(_upd(spark, [(k, 0, 1) for k in range(8)]),
            epoch="seed", batch_id=0)
    # stage a verifiably-empty batch (ledger-only WAP)
    empty = _upd(spark, []).limit(0)
    r = t.merge(empty, epoch="wap", batch_id=1, publish=False)
    # mid-audit commit ADDS a column
    widened = (
        _upd(spark, [(3, 7, 2)])
        .withColumn("city", F.lit("berlin"))
        .select("k", "v", "city", "_lsn", "__is_delete")
    )
    t.merge(widened, epoch="wa", batch_id=1)
    pub = t.publish(r["staged"])
    assert pub["published"] is True
    fields = {f["name"] for f in t.manifest()["schema"]["fields"]}
    assert "city" in fields, "rebase resurrected the stale schema"
    row = t.read(spark).filter(F.col("k") == 3).first()
    assert row["city"] == "berlin"


def test_rebased_publish_stats_carry_delta_not_absolute(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  merge_strategy="append")
    t.merge(_upd(spark, [(k, 0, 1) for k in range(100)]),
            epoch="seed", batch_id=0)
    # stage appends 10 NEW keys
    r = t.merge(_upd(spark, [(1000 + k, 1, 2) for k in range(10)]),
                epoch="wap", batch_id=1, publish=False)
    # mid-audit another writer appends 50 NEW keys
    t.merge(_upd(spark, [(2000 + k, 1, 2) for k in range(50)]),
            epoch="wa", batch_id=1)
    pub = t.publish(r["staged"])
    assert pub.get("rebased") is True
    assert t.manifest()["stats"]["total_rows"] == 160
    assert t.read(spark).count() == 160


def test_zero_retries_restores_fail_fast(spark, tmp_path):
    from transforms_for_apache_kafka_connect_spark.errors import (
        CommitConflictException,
    )

    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    t.merge(_upd(spark, [(k, 0, 1) for k in range(20)]),
            epoch="seed", batch_id=0)
    b = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  max_commit_retries=0)
    bmap = _buckets_of(spark, range(20))
    keys_not_b0 = [k for k in range(20) if bmap[k] != 0]
    _make_stale_once(b)
    t.merge(_upd(spark, [(k, 10, 2) for k in range(20) if bmap[k] == 0]),
            epoch="wa", batch_id=1)
    with pytest.raises(CommitConflictException):
        # even a rebase-eligible (disjoint) conflict must surface
        b.merge(_upd(spark, [(k, 20, 2) for k in keys_not_b0]),
                epoch="wb", batch_id=1)
    _check_integrity(t)


def test_pending_reregister_drops_previous_view(spark, tmp_path):
    from transforms_for_apache_kafka_connect_spark.streaming import LakeCatalog
    from pyspark.sql.utils import AnalysisException

    cat = LakeCatalog(spark)
    a = LakeTable(str(tmp_path / "a"), key_cols=["k"], n_buckets=N_BUCKETS)
    a.merge(_upd(spark, [(1, 1, 1)]), epoch="seed", batch_id=0)
    cat.register("occ_t", a)
    assert spark.table("occ_t").count() == 1
    fresh = LakeTable(str(tmp_path / "b"), key_cols=["k"], n_buckets=N_BUCKETS)
    assert cat.register("occ_t", fresh) is None  # pending
    with pytest.raises(AnalysisException):
        spark.table("occ_t").count()  # must NOT serve table a's rows
    fresh.merge(_upd(spark, [(2, 2, 1), (3, 3, 1)]), epoch="seed", batch_id=0)
    cat.refresh("occ_t")
    assert spark.table("occ_t").count() == 2
    cat.unregister("occ_t")


def test_vacuum_orphan_grace_protects_inflight_writers(spark, tmp_path):
    """Under multi-writer OCC an in-flight merge's files are
    unreferenced until its claim lands; a grace window keeps young
    orphans while still reclaiming genuinely dead ones."""
    import time as _time

    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    t.merge(_upd(spark, [(k, 0, 1) for k in range(10)]),
            epoch="seed", batch_id=0)
    young = os.path.join(root, "data", "inflight", "part-0.parquet")
    old = os.path.join(root, "data", "crashed", "part-0.parquet")
    for p in (young, old):
        os.makedirs(os.path.dirname(p))
        with open(p, "wb") as f:
            f.write(b"x")
    _time.sleep(0.05)
    os.utime(old, (1, 1))  # ancient mtime: a dead writer's leftovers
    r = t.vacuum(keep_versions=1, orphan_grace_seconds=3600)
    assert os.path.exists(young), "grace window must protect young files"
    assert not os.path.exists(old)
    assert r["deleted_files"] == 1
    # strict mode reclaims everything unreferenced
    t.vacuum(keep_versions=1, orphan_grace_seconds=0)
    assert not os.path.exists(young)
    assert _state(spark, t) == {k: (0, 1) for k in range(10)}


def test_vacuum_grace_covers_changelog_and_tmp(spark, tmp_path):
    """The grace window must protect an in-flight writer's UNCOMMITTED
    changelog dir and a live claimer's manifest tmp file, not just its
    data files."""
    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS, changelog=True)
    t.merge(_upd(spark, [(k, 0, 1) for k in range(10)]),
            epoch="seed", batch_id=0)
    # an in-flight merge's changelog (written BEFORE its claim lands)
    chg = os.path.join(root, "_changes", "epoch=w2", "batch_id=0")
    os.makedirs(chg)
    with open(os.path.join(chg, "part-0.parquet"), "wb") as f:
        f.write(b"x")
    # a live claimer's manifest temp file (mid-_swap)
    tmpf = os.path.join(root, "_manifest",
                        "manifest-00000099.json.tmp-live")
    with open(tmpf, "w") as f:
        f.write("{}")
    t.vacuum(keep_versions=1, orphan_grace_seconds=3600)
    assert os.path.isdir(chg), "young uncommitted changelog dir deleted"
    assert os.path.exists(tmpf), "live claimer's tmp manifest deleted"
    # aged out -> both reclaimed (strict semantics preserved)
    for p in (os.path.join(chg, "part-0.parquet"), chg, tmpf):
        os.utime(p, (1, 1))
    t.vacuum(keep_versions=1, orphan_grace_seconds=3600)
    assert not os.path.isdir(chg)
    assert not os.path.exists(tmpf)


# ---------------------------------------------------------------- op identity
# A racing claim is adoptable only when BOTH its ledger tail AND its
# logical op identity match (manifest["op"]). The tail alone cannot
# distinguish ledger-invariant commits: compact, rescale and tag
# commits append no ledger entry, so any two of them racing from the
# same base have identical tails.


def test_rescale_never_adopts_concurrent_compact(spark, tmp_path):
    """A rescale racing a compact from the same base must CONFLICT,
    not adopt: the old tail-only adoption made the rescale loser
    report success and set self.n_buckets to a count the committed
    manifest does not have — every later merge would hash rows into
    the wrong buckets and bucket-pruned reads would miss them."""
    from transforms_for_apache_kafka_connect_spark.errors import (
        CommitConflictException,
    )

    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    t.merge(_upd(spark, [(k, 0, 1) for k in range(20)]),
            epoch="seed", batch_id=0)
    r = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    _make_stale_once(r)
    t.compact(spark, all_buckets=True)  # ledger-invariant commit
    with pytest.raises(CommitConflictException):
        r.rescale(spark, 8)
    m = _check_integrity(t)
    assert m.get("n_buckets", N_BUCKETS) == N_BUCKETS
    assert r.n_buckets == N_BUCKETS, "loser must not switch bucket count"
    assert _state(spark, t) == {k: (0, 1) for k in range(20)}
    # and the loser keeps working correctly against the real layout
    r2 = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    r2.merge(_upd(spark, [(1, 9, 2)]), epoch="after", batch_id=0)
    assert _state(spark, t)[1] == (9, 2)


def test_two_rescales_different_counts_conflict(spark, tmp_path):
    """rescale(8) racing rescale(16) from the same base: exactly one
    lands; the loser raises instead of adopting the winner's manifest
    under its own (different) bucket count."""
    from transforms_for_apache_kafka_connect_spark.errors import (
        CommitConflictException,
    )

    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    t.merge(_upd(spark, [(k, 0, 1) for k in range(20)]),
            epoch="seed", batch_id=0)
    r = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    _make_stale_once(r)
    t.rescale(spark, 16)
    with pytest.raises(CommitConflictException):
        r.rescale(spark, 8)
    m = _check_integrity(t)
    assert m["n_buckets"] == 16
    assert r.n_buckets == N_BUCKETS, (
        "loser must not believe its own rescale landed"
    )
    assert _state(spark, t) == {k: (0, 1) for k in range(20)}


def test_identical_concurrent_compacts_adopt(spark, tmp_path):
    """Two writers compacting the SAME bucket set from the same base
    are the same logical op: the link loser adopts the winner's
    manifest (its own files become vacuum orphans) and reports the
    winner's committed version — no spurious failure."""
    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    t.merge(_upd(spark, [(k, 0, 1) for k in range(20)]),
            epoch="seed", batch_id=0)
    t.merge(_upd(spark, [(k, 1, 2) for k in range(20)]),
            epoch="seed", batch_id=1)
    b = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    _make_stale_once(b)
    r1 = t.compact(spark, all_buckets=True)
    r2 = b.compact(spark, all_buckets=True)  # stale base, same op
    assert r2["version"] == r1["version"]
    m = _check_integrity(t)
    assert m["version"] == r1["version"]
    assert _state(spark, t) == {k: (1, 2) for k in range(20)}


def test_racing_tags_both_land(spark, tmp_path):
    """Two different tags racing from the same base: the loser retries
    on the fresh head instead of adopting the winner's commit (which
    would silently drop its tag)."""
    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    t.merge(_upd(spark, [(1, 0, 1)]), epoch="seed", batch_id=0)
    v1 = t.manifest()["version"]
    b = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    _make_stale_once(b)
    t.tag("golden", v1)
    b.tag("audit", v1)  # stale handle: must rebase-and-retry
    m = _check_integrity(t)
    assert m["tags"] == {"golden": v1, "audit": v1}


def test_racing_same_tag_different_targets_never_adopt(spark, tmp_path):
    """tag('golden', 3) racing tag('golden', 7) from the same base:
    identical name AND commit version, so tail+name+version op
    identity would let the loser adopt — and report a pin that never
    landed (the next vacuum then collects files it believes pinned).
    The op includes the TARGET: the loser must rebase-and-commit its
    own pin, so BOTH land (last one wins the name durably)."""
    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    for bid in range(3):
        t.merge(_upd(spark, [(1, bid, bid + 1)]), epoch="seed", batch_id=bid)
    m = t.manifest()
    v = m["version"]
    b = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS)
    _make_stale_once(b)
    r_a = t.tag("golden", v - 2)
    r_b = b.tag("golden", v - 1)  # stale: must rebase, not adopt
    assert r_a["pinned_version"] == v - 2
    assert r_b["pinned_version"] == v - 1
    m2 = _check_integrity(t)
    # b committed AFTER a, so b's pin is the durable one — and what b
    # REPORTED matches what the manifest actually holds
    assert m2["tags"] == {"golden": v - 1}
    # a's pin landed too (an intermediate version carries it)
    with open(t._manifest_path(m2["version"] - 1)) as f:
        assert json.load(f)["tags"] == {"golden": v - 2}


def test_sparse_merge_keeps_exact_table_total_rows(spark, tmp_path):
    """A discovery-mode merge touching a subset of buckets must not
    collapse stats.total_rows to the touched-bucket count: the footer
    row counts riding the zone maps keep the COW total exact."""
    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  discovery=True)
    t.merge(_upd(spark, [(k, 0, 1) for k in range(400)]),
            epoch="seed", batch_id=0)
    assert t.manifest()["stats"]["total_rows"] == 400
    # touch ONE key (one bucket) — the observed merge row count is a
    # fraction of the table
    t.merge(_upd(spark, [(1, 9, 2)]), epoch="seed", batch_id=1)
    m = t.manifest()
    assert m["stats"]["total_rows"] == 400 == t.read(spark).count()
    # deletes shrink it exactly too
    dels = spark.createDataFrame(
        [(k, 0, 3) for k in range(10)], "k long, v long, _lsn long"
    ).withColumn("__is_delete", F.lit(True))
    t.merge(dels, epoch="seed", batch_id=2)
    assert t.manifest()["stats"]["total_rows"] == 390 == t.read(spark).count()


def test_stale_slot_reclaim_is_exclusive_and_bounded(spark, tmp_path):
    """An unreadable (torn) claim older than the reclaim grace is
    reclaimed via an exclusive rename+link — the writer commits
    instead of burning merge retries, and a racing fresh claim in the
    emptied slot surfaces as a clean conflict, never a clobber."""
    import time as _time

    root = str(tmp_path / "t")
    t = LakeTable(root, key_cols=["k"], n_buckets=N_BUCKETS,
                  reclaim_grace_seconds=0.3)
    t.merge(_upd(spark, [(1, 0, 1)]), epoch="seed", batch_id=0)
    v = t.manifest()["version"]
    torn = t._manifest_path(v + 1)
    with open(torn, "w") as f:
        f.write("{not json")  # crash debris in the next slot
    t0 = _time.perf_counter()
    t.merge(_upd(spark, [(2, 5, 2)]), epoch="seed", batch_id=1)
    waited = _time.perf_counter() - t0
    m = _check_integrity(t)
    assert ["seed", 1] in m["committed"]
    assert m["version"] == v + 1  # the reclaimed slot holds OUR commit
    assert _state(spark, t) == {1: (0, 1), 2: (5, 2)}
    # the wait was the grace remainder, not a merge-retry storm
    assert waited < 30
