"""Write-audit-publish staging and optimistic commit-conflict
detection on the manifest swap."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.errors import (
    CommitConflictException,
)
from transforms_for_apache_kafka_connect_spark.streaming import LakeTable, Replayer


def _env(spark, rows):
    return spark.createDataFrame(
        rows,
        "topic string, partition int, key struct<repo:string,path:string>, "
        "value struct<op:string,lsn:bigint,ts_ms:bigint,"
        "after:struct<content:string>>, "
        "timestamp long, headers map<string,string>",
    )


def _batch(i, content):
    return [("t", 0, ("r0", f"p{i}"), ("c", i, i, (content,)), i, None)]


def _updates(spark, table, rows):
    """Chain+dedupe an envelope batch into merge-ready updates."""
    rep = Replayer(table=table, chain=Chain([]), epoch="x", unique_lsn=True)
    return rep.updates_for(Chain([]).apply(_env(spark, rows)))


def test_stage_audit_publish_roundtrip(spark, tmp_path):
    table = LakeTable(str(tmp_path / "t"), key_cols=["repo", "path"],
                      n_buckets=4)
    upd = _updates(spark, table, _batch(1, "v1"))
    r = table.merge(upd, epoch="e", batch_id=0, publish=False)
    token = r["staged"]
    assert token and r["version"] == 1

    # not live: the table is still empty and the batch uncommitted
    assert not table.committed("e", 0)
    with pytest.raises(ValueError, match="no schema"):
        table.read(spark)

    # audit the staged state, then publish
    audit = table.read_staged(spark, token)
    assert [row["content"] for row in audit.collect()] == ["v1"]
    pub = table.publish(token)
    assert pub == {"published": True, "version": 1}
    assert table.committed("e", 0)
    assert table.read(spark).count() == 1
    assert not os.path.exists(
        os.path.join(table.root, "_manifest", f"{token}.json")
    )


def test_publish_conflict_when_table_advanced(spark, tmp_path):
    table = LakeTable(str(tmp_path / "t"), key_cols=["repo", "path"],
                      n_buckets=4)
    staged = table.merge(
        _updates(spark, table, _batch(1, "v1")),
        epoch="e", batch_id=0, publish=False,
    )["staged"]
    # another writer lands version 1 first
    table.merge(_updates(spark, table, _batch(2, "v2")),
                epoch="e", batch_id=1)
    with pytest.raises(CommitConflictException, match="under audit"):
        table.publish(staged)
    # the live table is untouched by the failed publish
    assert [r["content"] for r in table.read(spark).collect()] == ["v2"]


def test_swap_conflict_between_read_and_commit(spark, tmp_path):
    # two writers build against the same base version; the slower one's
    # manifest creation must fail, not silently clobber
    t1 = LakeTable(str(tmp_path / "t"), key_cols=["repo", "path"], n_buckets=4)
    t2 = LakeTable(str(tmp_path / "t"), key_cols=["repo", "path"], n_buckets=4)
    u1 = _updates(spark, t1, _batch(1, "a"))
    u2 = _updates(spark, t2, _batch(2, "b"))
    # both computed updates against version 0; t2 commits first
    t2.merge(u2, epoch="w2", batch_id=0)

    # t1's merge re-reads the manifest at merge() time, so to model the
    # race we pre-build its commit against the stale base the way a
    # paused writer would: stage against stale state, then publish
    m_stale = {**t1.manifest(0), "version": 1, "buckets": {},
               "committed": [["w1", 0]], "lineage": [],
               "schema": None, "n_buckets": 4,
               "key_cols": ["repo", "path"]}
    with pytest.raises(CommitConflictException, match="already committed"):
        t1._swap(m_stale)
    # winner's state intact
    assert [r["content"] for r in t1.read(spark).collect()] == ["b"]


def test_staged_wap_for_mor_strategy(spark, tmp_path):
    table = LakeTable(str(tmp_path / "t"), key_cols=["repo", "path"],
                      n_buckets=4, merge_strategy="append")
    token = table.merge(
        _updates(spark, table, _batch(1, "v1")),
        epoch="e", batch_id=0, publish=False,
    )["staged"]
    assert not table.committed("e", 0)
    assert table.read_staged(spark, token).count() == 1
    table.publish(token)
    assert table.read(spark).count() == 1
