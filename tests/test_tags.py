"""Snapshot tags (Iceberg tag analog): named versions pinned against
vacuum, read via read(tag=...); plus sort_cols clustering in compact
(zone maps prune on non-key predicates)."""

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


def _seed(spark, root, *, n=1_200, batches=3, **kw):
    table = LakeTable(str(root), n_buckets=4, merge_strategy="broadcast",
                      **kw)
    rep = Replayer(table=table, chain=Chain([]), epoch="e")
    events = change_stream(spark, n, n_repos=10, paths_per_repo=4)
    rep.replay(events, batch_width=-(-n // batches),
               start_pos=BASE_TS, max_pos=BASE_TS + n)
    return table


def test_tag_read_and_vacuum_pinning(spark, tmp_path):
    table = _seed(spark, tmp_path / "t")
    v_mid = table.manifest()["version"] - 1  # state after batch 1
    mid_rows = table.read(spark, version=v_mid).count()
    r = table.tag("audit-2026q3", version=v_mid)
    assert r == {"tag": "audit-2026q3", "pinned_version": v_mid}

    # aggressive vacuum: everything outside the window dies EXCEPT the
    # tagged version
    table.vacuum(keep_versions=1, orphan_grace_seconds=0)
    got = table.read(spark, tag="audit-2026q3")
    assert got.count() == mid_rows
    # untagged historical versions are gone
    with pytest.raises(Exception):
        table.read(spark, version=1).count()

    # drop the tag -> next vacuum reclaims it
    table.drop_tag("audit-2026q3")
    table.vacuum(keep_versions=1, orphan_grace_seconds=0)
    with pytest.raises(Exception):
        table.read(spark, tag="audit-2026q3").count()


def test_tag_validation(spark, tmp_path):
    table = _seed(spark, tmp_path / "t", n=300, batches=1)
    with pytest.raises(ValueError, match="no manifest version"):
        table.tag("x", version=99)
    with pytest.raises(ValueError, match="no such tag"):
        table.read(spark, tag="nope")
    with pytest.raises(ValueError, match="no such tag"):
        table.drop_tag("nope")
    table.tag("a")
    with pytest.raises(ValueError, match="not both"):
        table.read(spark, version=1, tag="a")


def test_tag_survives_later_commits(spark, tmp_path):
    table = _seed(spark, tmp_path / "t", n=600, batches=1)
    v0 = table.manifest()["version"]
    rows0 = table.read(spark).count()
    table.tag("pin")
    # later activity (delete + compact) must not disturb the pin
    table.delete_where(spark, "lang = 'py'")
    table.compact(spark, max_files_per_bucket=1, all_buckets=True)
    table.vacuum(keep_versions=1, orphan_grace_seconds=0)
    assert table.read(spark, tag="pin").count() == rows0
    assert (table.manifest().get("tags") or {}) == {"pin": v0}


def test_cli_tag_roundtrip(spark, tmp_path, capsys):
    import json as _json

    from transforms_for_apache_kafka_connect_spark.cli import main

    events = change_stream(spark, 500, n_repos=6, paths_per_repo=3)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    root = str(tmp_path / "table")
    assert main(["--table", root, "--buckets", "4", "--batches", "1",
                 "--events", str(tmp_path / "events")]) == 0
    capsys.readouterr()
    assert main(["--table", root, "--buckets", "4",
                 "--maintenance", "tag", "--tag-name", "rel1"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tag"] == "rel1"
    assert main(["--table", root, "--buckets", "4",
                 "--maintenance", "drop-tag", "--tag-name", "rel1"]) == 0
    # missing name -> exit 2
    assert main(["--table", root, "--buckets", "4",
                 "--maintenance", "tag"]) == 2


def test_compact_sort_cols_improves_nonkey_pruning(spark, tmp_path):
    """Clustering by a predicate column makes zone maps prune files on
    that predicate — files carry disjoint value ranges for it."""
    table = _seed(spark, tmp_path / "t", n=2_000, batches=1)
    # force several files per bucket, clustered by lang
    table.target_rows_per_file = 5
    table.compact(spark, max_files_per_bucket=0, all_buckets=True,
                  sort_cols=["lang"])
    table.read(spark, where=[("lang", "==", "py")]).count()
    assert table.last_prune["files_read"] < table.last_prune["files_total"]


# --------------------------------------------------- schema enforcement


def test_strict_schema_mode_rejects_new_columns(spark, tmp_path):
    from pyspark.sql import types as T

    from transforms_for_apache_kafka_connect_spark.errors import (
        SchemaEnforcementError,
    )

    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("_lsn", T.LongType()),
        T.StructField("__is_delete", T.BooleanType()),
    ])
    table = LakeTable(str(tmp_path / "t"), n_buckets=2,
                      merge_strategy="broadcast", schema_mode="strict")
    table.merge(spark.createDataFrame(
        [("r0", "p0", "v1", 1, False)], schema), epoch="e", batch_id=0)

    widened = spark.createDataFrame(
        [("r0", "p0", "v2", 2, False, "extra")],
        schema.add("surprise", T.StringType()),
    )
    with pytest.raises(SchemaEnforcementError, match="surprise"):
        table.merge(widened, epoch="e", batch_id=1)
    # batch stays uncommitted and the table untouched
    assert not table.committed("e", 1)
    assert table.read(spark).collect()[0]["content"] == "v1"

    # an evolve-mode handle applies the same batch (explicit migration)
    evolve = LakeTable(str(tmp_path / "t"), n_buckets=2,
                       merge_strategy="broadcast")
    evolve.merge(widened, epoch="e", batch_id=1)
    assert evolve.read(spark).collect()[0]["surprise"] == "extra"


def test_schema_mode_validation(tmp_path):
    with pytest.raises(ValueError, match="schema_mode"):
        LakeTable(str(tmp_path / "t"), schema_mode="nope")
