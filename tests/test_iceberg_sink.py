"""IcebergLakeTable commit protocol: stage → error gate → evolve →
MERGE → ledger. The sandbox has no Iceberg jar, so the protocol is
pinned with a mocked catalog (SQL text + call ordering) and the
end-to-end test is jar-gated (runs on a real cluster, skips here)."""

from __future__ import annotations

import json
import re

import pytest
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.streaming import iceberg_sink
from transforms_for_apache_kafka_connect_spark.streaming.iceberg_sink import (
    IcebergLakeTable,
)


class FakeResult:
    def __init__(self, rows):
        self.rows = rows

    def collect(self):
        return self.rows


class FakeSpark:
    """Records every SQL statement; emulates SHOW/ALTER TBLPROPERTIES
    and spark.table() schema lookups."""

    def __init__(self, table_fields):
        self.queries: list[str] = []
        self.props: dict[str, str] = {}
        self.table_fields = list(table_fields)

    def sql(self, q):
        self.queries.append(q)
        qs = q.strip()
        if qs.startswith("SHOW TBLPROPERTIES"):
            return FakeResult(
                [{"key": k, "value": v} for k, v in self.props.items()]
            )
        if "SET TBLPROPERTIES" in qs:
            for k, v in re.findall(r"'([^']+)'\s*=\s*'([^']+)'", qs):
                self.props[k] = v
            return FakeResult([])
        if qs.startswith("ALTER TABLE") and "ADD COLUMNS" in qs:
            return FakeResult([])
        if qs.startswith("MERGE INTO"):
            return FakeResult([])
        raise AssertionError(f"unexpected SQL: {q}")

    def table(self, identifier):
        fields = self.table_fields

        class _Tbl:
            schema = T.StructType(fields)

        return _Tbl()


class FakeUpdates:
    def __init__(self, spark, schema, n_rows):
        self.sparkSession = spark
        self.schema = schema
        self.columns = [f.name for f in schema.fields]
        self.n_rows = n_rows
        self.persisted = False
        self.unpersisted = False
        self.views: list[str] = []

    def persist(self):
        self.persisted = True
        return self

    def count(self):
        return self.n_rows

    def unpersist(self):
        self.unpersisted = True
        return self

    def createOrReplaceTempView(self, name):
        self.views.append(name)


UPD_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("_lsn", T.LongType()),
        T.StructField("__is_delete", T.BooleanType()),
    ]
)
TBL_FIELDS = UPD_SCHEMA.fields[:4]  # table lacks the delete flag, as it should


@pytest.fixture(autouse=True)
def force_available(monkeypatch):
    monkeypatch.setattr(iceberg_sink, "available", lambda spark: True)


def _mk(n_rows=10, table_fields=TBL_FIELDS):
    fake = FakeSpark(table_fields)
    upd = FakeUpdates(fake, UPD_SCHEMA, n_rows)
    tbl = IcebergLakeTable("lake.db.repositories")
    return fake, upd, tbl


def test_error_gate_runs_before_any_mutation():
    fake, upd, tbl = _mk()
    seen = {}

    def failing_gate(n):
        seen["n"] = n
        raise RuntimeError("record error")

    with pytest.raises(RuntimeError):
        tbl.merge(upd, epoch="e1", batch_id=0, pre_commit=failing_gate)
    # the gate saw the staged count, and the table was never touched:
    # no MERGE, no ALTER of any kind — only read-side lookups (the
    # ledger SHOW and the snapshot-summary recovery SELECT)
    assert seen["n"] == 10
    assert all(
        q.strip().startswith(("SHOW TBLPROPERTIES", "SELECT"))
        for q in fake.queries
    )
    assert upd.persisted and upd.unpersisted


def test_success_sequence_and_merge_sql_golden():
    fake, upd, tbl = _mk()
    r = tbl.merge(upd, epoch="e1", batch_id=3, pre_commit=lambda n: None)
    assert not r["skipped"] and r["n_updates"] == 10
    kinds = [
        q.strip().split()[0] + ("/props" if "TBLPROPERTIES" in q else "")
        for q in fake.queries
    ]
    # ledger check, evolve lookup happens via table() not SQL, then
    # MERGE (data), then the ledger property commit — in that order
    merge_idx = next(i for i, q in enumerate(fake.queries) if q.startswith("MERGE"))
    ledger_idx = next(
        i for i, q in enumerate(fake.queries) if "SET TBLPROPERTIES" in q
    )
    assert merge_idx < ledger_idx, kinds
    merge_sql = fake.queries[merge_idx]
    assert merge_sql == (
        "MERGE INTO `lake`.`db`.`repositories` t\n"
        "USING `__tkc_updates_e1_3` s\n"
        "ON t.`repo` = s.`repo` AND t.`path` = s.`path`\n"
        "WHEN MATCHED AND s.`__is_delete` THEN DELETE\n"
        "WHEN MATCHED THEN UPDATE SET t.`content` = s.`content`, "
        "t.`_lsn` = s.`_lsn`\n"
        "WHEN NOT MATCHED AND NOT s.`__is_delete` THEN INSERT\n"
        "  (`repo`, `path`, `content`, `_lsn`) VALUES "
        "(s.`repo`, s.`path`, s.`content`, s.`_lsn`)"
    )
    assert json.loads(fake.props["tkc.committed"]) == [["e1", 3]]
    assert upd.views == ["__tkc_updates_e1_3"]


def test_already_committed_is_noop():
    fake, upd, tbl = _mk()
    tbl.merge(upd, epoch="e1", batch_id=0, pre_commit=lambda n: None)
    n_queries = len(fake.queries)
    r = tbl.merge(upd, epoch="e1", batch_id=0, pre_commit=lambda n: None)
    assert r["skipped"]
    # only the ledger lookup ran the second time
    assert all(
        q.strip().startswith("SHOW TBLPROPERTIES")
        for q in fake.queries[n_queries:]
    )


def test_empty_batch_ledger_only():
    fake, upd, tbl = _mk(n_rows=0)
    calls = []
    r = tbl.merge(upd, epoch="e1", batch_id=7, pre_commit=calls.append)
    assert calls == [0] and not r["skipped"]
    assert not any(q.startswith("MERGE") for q in fake.queries)
    assert json.loads(fake.props["tkc.committed"]) == [["e1", 7]]


def test_schema_evolution_adds_columns_after_gate_before_merge():
    # table lacks _lsn: evolve must ADD COLUMNS before the MERGE
    fake, upd, tbl = _mk(table_fields=TBL_FIELDS[:3])
    tbl.merge(upd, epoch="e1", batch_id=0, pre_commit=lambda n: None)
    add_idx = next(
        i for i, q in enumerate(fake.queries) if "ADD COLUMNS" in q
    )
    merge_idx = next(
        i for i, q in enumerate(fake.queries) if q.startswith("MERGE")
    )
    assert add_idx < merge_idx
    assert "(`_lsn` bigint)" in fake.queries[add_idx]
    # the delete flag never becomes a table column
    assert "__is_delete" not in fake.queries[add_idx]


def test_lineage_recorded_and_capped():
    fake, upd, tbl = _mk()
    tbl.max_lineage_entries = 3
    for b in range(5):
        tbl.merge(upd, epoch="e1", batch_id=b, pre_commit=lambda n: None)
    lin = json.loads(fake.props["tkc.lineage"])
    assert len(lin) == 3
    assert [x["batch_id"] for x in lin] == [2, 3, 4]
    assert len(json.loads(fake.props["tkc.committed"])) == 5


def test_key_only_table_drops_update_clause():
    # every column is a key column: UPDATE SET with an empty assignment
    # list is malformed SQL — the clause must be dropped entirely (a
    # matched non-delete row is already byte-identical)
    tbl = IcebergLakeTable("lake.db.keys", key_cols=["repo", "path"])
    sql = tbl._merge_sql(["repo", "path"], "__is_delete", "v")
    assert "UPDATE SET" not in sql
    assert "WHEN MATCHED AND s.`__is_delete` THEN DELETE" in sql
    assert "WHEN NOT MATCHED AND NOT s.`__is_delete` THEN INSERT" in sql


def test_quoting_survives_reserved_word_identifiers():
    tbl = IcebergLakeTable("lake.db.t", key_cols=["order"])
    sql = tbl._merge_sql(["order", "select"], "__is_delete", "v")
    assert "t.`order` = s.`order`" in sql
    assert "t.`select` = s.`select`" in sql


class FakeCommitMetadata:
    """Pins the single-commit protocol: the MERGE must run INSIDE
    withCommitProperties with the ledger entry in the property map."""

    def __init__(self):
        self.calls: list[dict] = []

    def withCommitProperties(self, jmap, callable_, exc_cls):
        self.calls.append(dict(jmap))
        callable_.call()


class _FakeHashMap(dict):
    def put(self, k, v):
        self[k] = v


class _FakeGateway:
    class jvm:
        class java:
            class util:
                HashMap = _FakeHashMap

            class lang:
                RuntimeException = RuntimeError


def test_single_commit_path_stamps_snapshot_props(monkeypatch):
    fake, upd, tbl = _mk()
    fake.sparkContext = type("SC", (), {"_gateway": _FakeGateway()})()
    cm = FakeCommitMetadata()
    monkeypatch.setattr(iceberg_sink, "_commit_metadata", lambda s: cm)
    monkeypatch.setattr(iceberg_sink, "_ensure_callback", lambda gw: None)
    r = tbl.merge(upd, epoch="e9", batch_id=4, pre_commit=lambda n: None)
    assert r["one_commit"] and not r["skipped"]
    # the MERGE ran exactly once, inside the thread-local wrapper,
    # carrying epoch + batch id in the snapshot summary
    assert len(cm.calls) == 1
    assert cm.calls[0]["tkc.epoch"] == "e9"
    assert cm.calls[0]["tkc.batch-id"] == "4"
    assert sum(q.startswith("MERGE") for q in fake.queries) == 1
    # the table-properties ledger cache still updates afterwards
    assert json.loads(fake.props["tkc.committed"]) == [["e9", 4]]


def test_single_commit_merge_failure_not_rerun(monkeypatch):
    fake, upd, tbl = _mk()
    fake.sparkContext = type("SC", (), {"_gateway": _FakeGateway()})()

    class ExplodingCM:
        def withCommitProperties(self, jmap, callable_, exc_cls):
            callable_.call()

    real_sql = fake.sql

    def exploding_sql(q):
        if q.startswith("MERGE"):
            fake.queries.append(q)
            raise RuntimeError("commit conflict")
        return real_sql(q)

    fake.sql = exploding_sql
    monkeypatch.setattr(iceberg_sink, "_commit_metadata", lambda s: ExplodingCM())
    monkeypatch.setattr(iceberg_sink, "_ensure_callback", lambda gw: None)
    with pytest.raises(RuntimeError, match="commit conflict"):
        tbl.merge(upd, epoch="e9", batch_id=5, pre_commit=lambda n: None)
    # a started MERGE must never silently re-run on the fallback path
    assert sum(q.startswith("MERGE") for q in fake.queries) == 1


def test_committed_falls_back_to_snapshot_summaries(monkeypatch):
    fake, upd, tbl = _mk()
    # the snapshots scan only runs when CommitMetadata is reachable
    # (two-commit mode can't have stamped summaries) — simulate its
    # presence
    monkeypatch.setattr(iceberg_sink, "_commit_metadata", lambda s: object())

    def sql_with_snapshots(q):
        if ".`snapshots`" in q or ".snapshots" in q:
            fake.queries.append(q)
            return FakeResult([{"e": "e1", "b": "9"}])
        return FakeSpark.sql(fake, q)

    fake.sql = sql_with_snapshots
    monkeypatch.setattr(
        iceberg_sink.SparkSession, "getActiveSession", staticmethod(lambda: fake)
    )
    # not in the table-properties ledger, but present in a snapshot
    # summary (crash between MERGE and ledger cache): still committed
    assert tbl.committed("e1", 9) is True
    assert tbl.committed("e1", 8) is False


def test_jar_gated_end_to_end(spark, tmp_path, monkeypatch):
    # real-catalog path: only runs where an Iceberg runtime jar is on
    # the classpath (never in this sandbox)
    monkeypatch.undo()  # restore the real available()
    if not iceberg_sink.available(spark):
        pytest.skip("no Iceberg runtime jar in this environment")
    spark.sql("CREATE DATABASE IF NOT EXISTS tkc_it")
    spark.sql(
        "CREATE TABLE IF NOT EXISTS tkc_it.repos "
        "(repo string, path string, content string, _lsn bigint) USING iceberg"
    )
    tbl = IcebergLakeTable("tkc_it.repos")
    upd = spark.createDataFrame(
        [("r1", "a", "v1", 1, False), ("r1", "b", "v2", 2, True)],
        "repo string, path string, content string, _lsn long, __is_delete boolean",
    )
    # failing gate leaves the table untouched
    before = spark.table("tkc_it.repos").count()
    with pytest.raises(RuntimeError):
        tbl.merge(upd, epoch="it", batch_id=0,
                  pre_commit=lambda n: (_ for _ in ()).throw(RuntimeError("x")))
    assert spark.table("tkc_it.repos").count() == before
    r = tbl.merge(upd, epoch="it", batch_id=0, pre_commit=lambda n: None)
    assert not r["skipped"]
    assert tbl.committed("it", 0)
