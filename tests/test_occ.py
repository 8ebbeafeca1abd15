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
