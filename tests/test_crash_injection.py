"""Systematic crash injection over the commit protocol.

The reference relies on the Connect runtime for delivery guarantees;
our engine owns its own commit protocol (SURVEY.md §4.3 "exactly-once
+ resumability"), so the exactly-once claim deserves more than happy-
path tests: this module simulates a process death at EVERY filesystem
mutation the Python-side commit path performs (manifest create,
CURRENT tmp write, atomic repoint, WAP link/remove) and asserts, for
each crash point:

  A. atomic visibility — readers see exactly the pre-batch state or
     the post-batch state, never a mix;
  B. recoverability — replaying the same batch after the crash
     converges to the correct final state with the batch in the
     ledger exactly once;
  C. vacuum safety — garbage-collecting after recovery does not
     change what readers see.

Data-file writes happen JVM-side (a crash there leaves orphans that
are invisible by construction — covered by
test_orphan_files_from_crashed_write_are_invisible); the Python
manifest protocol is where torn states could hide, so that is what we
enumerate exhaustively here.
"""

from __future__ import annotations

import builtins
import os
import shutil

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.sources import change_stream
from transforms_for_apache_kafka_connect_spark.streaming import LakeTable, Replayer
from transforms_for_apache_kafka_connect_spark.streaming import sink as sink_mod

BASE_TS = 1_600_000_000_000
N = 2_000


class SimulatedCrash(BaseException):
    """BaseException so no library except-Exception handler swallows
    the simulated process death."""


class FaultInjector:
    """Counts filesystem MUTATIONS issued by sink.py and raises
    SimulatedCrash *instead of* performing the crash_at-th one
    (crash-before semantics; crash-after op k == crash-before op k+1,
    so enumerating crash_at = 1..N covers every interleaving).

    Installed by shadowing sink.py's module globals: ``os`` becomes a
    counting proxy and ``open`` a counting wrapper (module globals
    shadow builtins), so nothing outside sink.py — Spark, py4j, the
    test itself — is affected.
    """

    MUTATORS = {"replace", "link", "remove", "rename"}

    def __init__(self, crash_at: int | None):
        self.crash_at = crash_at
        self.count = 0
        self.tripped = False

    def _bump(self, label: str) -> None:
        self.count += 1
        if self.crash_at is not None and self.count == self.crash_at:
            self.tripped = True
            raise SimulatedCrash(f"simulated crash before {label} #{self.count}")

    class _OsProxy:
        def __init__(self, injector):
            self._injector = injector

        def __getattr__(self, name):
            real = getattr(os, name)
            if name in FaultInjector.MUTATORS:

                def wrapped(*a, **k):
                    self._injector._bump(f"os.{name}")
                    return real(*a, **k)

                return wrapped
            return real

    def os_proxy(self):
        return self._OsProxy(self)

    def open_wrapper(self):
        def wrapped(path, mode="r", *a, **k):
            if any(c in mode for c in "wxa"):
                self._bump(f"open({mode})")
            return builtins.open(path, mode, *a, **k)

        return wrapped

    def install(self, monkeypatch) -> None:
        monkeypatch.setattr(sink_mod, "os", self.os_proxy())
        monkeypatch.setattr(sink_mod, "open", self.open_wrapper(), raising=False)


def _state(spark, table: LakeTable):
    df = table.read(spark)
    cols = [c for c in ("repo", "path", "content", "_lsn") if c in df.columns]
    return sorted(tuple(r[c] for c in cols) for r in df.select(cols).collect())


def _batches(spark):
    events = change_stream(spark, N, n_repos=20, paths_per_repo=5)
    half = BASE_TS + N // 2
    b0 = events.filter(F.col("timestamp") < half)
    b1 = events.filter(F.col("timestamp") >= half)
    return b0, b1


def _build(spark, root: str, **table_opts):
    table = LakeTable(root, n_buckets=4, **table_opts)
    return table, Replayer(table=table, chain=Chain([]), epoch="e")


def test_table_directory_is_relocatable(spark, tmp_path):
    """Manifests store root-relative data-file paths, so copying the
    table tree IS cloning it: the copy opens at its new root, reads
    identically, and accepts further merges independently of the
    original (DR restore / environment promotion / fixture cloning).
    The crash-injection tests below rely on this to replay each crash
    point from a pristine clone."""
    b0, b1 = _batches(spark)
    src_root = str(tmp_path / "src")
    table, rep = _build(spark, src_root)
    rep.apply_batch(b0, 0)
    expected = _state(spark, table)

    clone_root = str(tmp_path / "elsewhere" / "clone")
    shutil.copytree(src_root, clone_root)
    clone = LakeTable(clone_root, n_buckets=4)
    assert _state(spark, clone) == expected

    # the clone advances independently; the original is untouched
    rep2 = Replayer(table=clone, chain=Chain([]), epoch="e")
    rep2.apply_batch(b1, 1)
    assert _state(spark, clone) != expected
    assert _state(spark, LakeTable(src_root, n_buckets=4)) == expected


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle", "append"])
def test_crash_at_every_commit_fs_op(spark, tmp_path, monkeypatch, strategy):
    b0, b1 = _batches(spark)

    # control run: expected pre/post states with no faults
    ctrl_root = str(tmp_path / "ctrl")
    table, rep = _build(spark, ctrl_root, merge_strategy=strategy)
    rep.apply_batch(b0, 0)
    pre_state = _state(spark, table)
    rep.apply_batch(b1, 1)
    post_state = _state(spark, table)
    assert pre_state != post_state  # the batch must actually change state

    # template table holding only batch 0, cloned per crash point
    tmpl_root = str(tmp_path / "tmpl")
    _, rep_t = _build(spark, tmpl_root, merge_strategy=strategy)
    rep_t.apply_batch(b0, 0)

    crash_points = 0
    for crash_at in range(1, 50):
        root = str(tmp_path / f"run{strategy}{crash_at}")
        shutil.copytree(tmpl_root, root)
        table, rep = _build(spark, root, merge_strategy=strategy)

        injector = FaultInjector(crash_at)
        with monkeypatch.context() as mp:
            injector.install(mp)
            try:
                rep.apply_batch(b1, 1)
            except SimulatedCrash:
                pass
        if not injector.tripped:
            # commit completed before reaching crash_at: every fs op
            # has been enumerated — stop, after checking the clean run
            assert _state(spark, table) == post_state
            break
        crash_points += 1

        # A: atomic visibility — never a torn state
        observed = _state(spark, table)
        assert observed in (pre_state, post_state), (
            f"{strategy} crash point {crash_at}: torn state"
        )

        # B: recovery — a fresh replayer (simulated restart) converges
        table2, rep2 = _build(spark, root, merge_strategy=strategy)
        rep2.apply_batch(b1, 1)
        assert _state(spark, table2) == post_state, (
            f"{strategy} crash point {crash_at}: replay did not converge"
        )
        assert table2.committed("e", 1)
        assert table2.manifest()["committed"].count(["e", 1]) == 1

        # C: vacuum after recovery is invisible to readers
        table2.vacuum(keep_versions=1, orphan_grace_seconds=0)
        assert _state(spark, table2) == post_state, (
            f"{strategy} crash point {crash_at}: vacuum changed state"
        )
    else:
        pytest.fail("commit never completed within 50 fs mutations")

    # the protocol has at least manifest-create + CURRENT tmp + repoint
    assert crash_points >= 3, f"only {crash_points} crash points exercised"


def test_crash_at_every_publish_fs_op(spark, tmp_path, monkeypatch):
    """Write-audit-publish: a crash anywhere inside publish() must
    leave the table either unpublished (stage still auditable or
    re-stageable) or fully published — and publish must be completable
    afterwards."""
    b0, b1 = _batches(spark)

    ctrl_root = str(tmp_path / "ctrl")
    table, rep = _build(spark, ctrl_root)
    rep.apply_batch(b0, 0)
    pre_state = _state(spark, table)
    r = table.merge(
        rep.updates_for(Chain([]).apply(b1)), epoch="e", batch_id=1,
        publish=False,
    )
    token = r["staged"]
    table.publish(token)
    post_state = _state(spark, table)
    assert pre_state != post_state

    tmpl_root = str(tmp_path / "tmpl")
    table_t, rep_t = _build(spark, tmpl_root)
    rep_t.apply_batch(b0, 0)
    r = table_t.merge(
        rep_t.updates_for(Chain([]).apply(b1)), epoch="e", batch_id=1,
        publish=False,
    )
    tmpl_token = r["staged"]

    crash_points = 0
    for crash_at in range(1, 50):
        root = str(tmp_path / f"pub{crash_at}")
        shutil.copytree(tmpl_root, root)
        table = LakeTable(root, n_buckets=4)

        injector = FaultInjector(crash_at)
        with monkeypatch.context() as mp:
            injector.install(mp)
            try:
                table.publish(tmpl_token)
            except SimulatedCrash:
                pass
        if not injector.tripped:
            assert _state(spark, table) == post_state
            break
        crash_points += 1

        observed = _state(spark, LakeTable(root, n_buckets=4))
        assert observed in (pre_state, post_state), (
            f"publish crash point {crash_at}: torn state"
        )
        # recovery: re-publishing the same token (idempotent adoption)
        # must complete the commit
        LakeTable(root, n_buckets=4).publish(tmpl_token)
        assert _state(spark, LakeTable(root, n_buckets=4)) == post_state
    else:
        pytest.fail("publish never completed within 50 fs mutations")

    assert crash_points >= 3, f"only {crash_points} crash points exercised"


def test_vacuum_collects_stale_swap_tmp_files(spark, tmp_path):
    """A crash between writing CURRENT.tmp-<uuid> and the os.replace
    leaves the tmp file behind; vacuum must collect it (it is not a
    data file, so the orphan scan under data/ never saw it)."""
    b0, _ = _batches(spark)
    root = str(tmp_path / "t")
    table, rep = _build(spark, root)
    rep.apply_batch(b0, 0)

    stale = [
        os.path.join(root, "_manifest", "CURRENT.tmp-deadbeef"),
        os.path.join(root, "_manifest", "manifest-00000009.json.tmp-cafe"),
    ]
    for p in stale:
        with open(p, "w") as f:
            f.write("1")
    r = table.vacuum(keep_versions=1, orphan_grace_seconds=0)
    assert r["stale_tmp_files"] == 2
    for p in stale:
        assert not os.path.exists(p)
    # dry_run counts but keeps
    for p in stale:
        with open(p, "w") as f:
            f.write("1")
    r2 = table.vacuum(keep_versions=1, dry_run=True, orphan_grace_seconds=0)
    assert r2["stale_tmp_files"] == 2 and all(os.path.exists(p) for p in stale)
