"""Row retention / right-to-erasure: delete_where as a ledgered merge
(exactly-once, MoR-safe via _lsn+1 markers, audit pre-images on
changelog tables)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
from transforms_for_apache_kafka_connect_spark.sources.changestream import (
    change_stream,
)
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    Replayer,
)

BASE_TS = 1_600_000_000_000


def _seed(spark, root, *, strategy, n=1_500, changelog=False):
    table = LakeTable(str(root), n_buckets=4, merge_strategy=strategy,
                      changelog=changelog)
    rep = Replayer(table=table, chain=Chain([]), epoch="e")
    events = change_stream(spark, n, n_repos=10, paths_per_repo=4)
    rep.replay(events, batch_width=n,
               start_pos=BASE_TS, max_pos=BASE_TS + n)
    return table, rep


@pytest.mark.parametrize("strategy", ["shuffle", "broadcast", "append"])
def test_delete_where_removes_matching_rows(spark, tmp_path, strategy):
    table, _ = _seed(spark, tmp_path / "t", strategy=strategy)
    before = table.read(spark)
    n_py = before.filter("lang = 'py'").count()
    n_all = before.count()
    assert 0 < n_py < n_all

    r = table.delete_where(spark, "lang = 'py'")
    assert not r.get("skipped")
    after = table.read(spark)
    assert after.filter("lang = 'py'").count() == 0
    assert after.count() == n_all - n_py

    # retry with the same derived batch id is a ledger no-op
    r2 = table.delete_where(spark, "lang = 'py'", batch_id=r["batch_id"]
                            if "batch_id" in r else None)
    # the derived id changed with the new version; pin it explicitly
    r3 = table.delete_where(spark, "lang = 'py'",
                            batch_id=table.manifest()["version"] - 1)
    assert r3["skipped"]


def test_delete_where_keys_can_be_recreated(spark, tmp_path):
    """A later real event at a higher LSN re-creates an erased key —
    the _lsn+1 marker only outranks what existed at deletion time."""
    table, rep = _seed(spark, tmp_path / "t", strategy="append", n=800)
    table.delete_where(spark, "lang = 'py'")
    assert table.read(spark).filter("lang = 'py'").count() == 0

    # replay a later slice (higher LSNs) under a fresh epoch — some
    # 'py' rows come back
    more = change_stream(spark, 2_400, n_repos=10, paths_per_repo=4)
    rep2 = Replayer(table=table, chain=Chain([]), epoch="e2")
    rep2.replay(more, batch_width=1_600,
                start_pos=BASE_TS + 800, max_pos=BASE_TS + 2_400)
    assert table.read(spark).filter("lang = 'py'").count() > 0


def test_delete_where_audit_trail_on_changelog_table(spark, tmp_path):
    """GDPR evidence: the erased rows' full pre-images land in the
    maintenance batch's changelog entry."""
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        batch_changes,
    )

    table, _ = _seed(spark, tmp_path / "t", strategy="broadcast",
                     changelog=True)
    victims = {
        (r["repo"], r["path"])
        for r in table.read(spark).filter("lang = 'py'").collect()
    }
    r = table.delete_where(spark, "lang = 'py'")
    chg = batch_changes(
        table, spark, epoch=r["epoch"],
        batch_id=table.manifest()["version"] - 1,
    )
    audited = {
        (row["repo"], row["path"])
        for row in chg.filter("_change_type = 'delete'").collect()
    }
    assert audited == victims and len(audited) > 0
    # pre-images carry the erased payload
    assert chg.filter(
        (F.col("_change_type") == "delete") & F.col("content").isNotNull()
    ).count() == len(victims)


def test_delete_where_empty_table_and_no_match(spark, tmp_path):
    empty = LakeTable(str(tmp_path / "empty"), n_buckets=2)
    assert empty.delete_where(spark, "1 = 1")["skipped"]

    table, _ = _seed(spark, tmp_path / "t", strategy="broadcast", n=400)
    n = table.read(spark).count()
    r = table.delete_where(spark, "lang = 'nope'")
    assert not r.get("skipped")
    assert table.read(spark).count() == n


def test_cli_delete_where(spark, tmp_path, capsys):
    import json as _json

    from transforms_for_apache_kafka_connect_spark.cli import main

    events = change_stream(spark, 600, n_repos=8, paths_per_repo=3)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    root = str(tmp_path / "table")
    assert main(["--table", root, "--buckets", "4", "--batches", "1",
                 "--events", str(tmp_path / "events")]) == 0
    capsys.readouterr()
    assert main(["--table", root, "--buckets", "4",
                 "--maintenance", "delete-where",
                 "--predicate", "lang = 'py'"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["op"] == "delete-where" and out["predicate"] == "lang = 'py'"
    table = LakeTable(root, n_buckets=4)
    assert table.read(spark).filter("lang = 'py'").count() == 0
    # missing predicate -> exit 2
    assert main(["--table", root, "--buckets", "4",
                 "--maintenance", "delete-where"]) == 2
