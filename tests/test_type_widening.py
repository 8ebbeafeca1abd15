"""Numeric type-widening schema evolution (sink.py _widen_updates):
a CDC source whose column types drift must either merge losslessly or
fail loudly BEFORE anything is written.

The invariants:
* narrower-than-manifest updates cast UP before the (type-sensitive!)
  bucket hash — an int key against a long-keyed table must land in the
  long hash's bucket or LWW silently splits the key;
* wider updates widen the MANIFEST (COW via union coercion, MoR via
  widen_map) and old narrow files keep reading via Spark 4's Parquet
  widening promotion;
* lossy drifts (long↔double), non-primitive drifts, key-column
  widening, and any widening under schema_mode='strict' raise
  SchemaEnforcementError pre-write.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.errors import (
    SchemaEnforcementError,
)
from transforms_for_apache_kafka_connect_spark.streaming import LakeTable

BIG = 6_000_000_000  # > int32 range


def _upd(spark, rows, types):
    return spark.createDataFrame(
        rows, f"k {types[0]}, v {types[1]}, _lsn long, __is_delete boolean"
    )


@pytest.mark.parametrize("strategy", ["shuffle", "broadcast", "append"])
def test_int_to_long_widening_all_strategies(spark, tmp_path, strategy):
    t = LakeTable(
        str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
        merge_strategy=strategy,
    )
    t.merge(_upd(spark, [(1, 5, 1, False), (2, 7, 2, False)],
                 ("long", "int")), epoch="e", batch_id=0)
    t.merge(_upd(spark, [(2, BIG, 3, False), (3, 9, 4, False)],
                 ("long", "long")), epoch="e", batch_id=1)
    out = t.read(spark)
    assert out.schema["v"].dataType.simpleString() == "bigint"
    got = {r["k"]: r["v"] for r in out.collect()}
    # key 1 lives in an OLD int file read under the widened schema
    assert got == {1: 5, 2: BIG, 3: 9}


@pytest.mark.parametrize("strategy", ["shuffle", "append"])
def test_narrower_update_casts_up_and_buckets_correctly(
    spark, tmp_path, strategy
):
    """The key arrives as int against a long-keyed table: without the
    pre-bucket cast the same logical key hashes to a different bucket
    (xxhash64 is type-sensitive) and the update would NOT supersede the
    original row."""
    t = LakeTable(
        str(tmp_path / "t"), key_cols=["k"], n_buckets=16,
        merge_strategy=strategy,
    )
    t.merge(_upd(spark, [(7, 1, 1, False)], ("long", "long")),
            epoch="e", batch_id=0)
    t.merge(_upd(spark, [(7, 2, 2, False)], ("int", "int")),
            epoch="e", batch_id=1)
    out = t.read(spark).collect()
    assert len(out) == 1
    assert out[0]["k"] == 7 and out[0]["v"] == 2
    # and a delete arriving narrow must still find the row
    t.merge(_upd(spark, [(7, 0, 3, True)], ("int", "int")),
            epoch="e", batch_id=2)
    assert t.read(spark).count() == 0


def test_float_to_double_and_int_to_double(spark, tmp_path):
    t = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4)
    t.merge(_upd(spark, [(1, 1.5, 1, False)], ("long", "float")),
            epoch="e", batch_id=0)
    t.merge(_upd(spark, [(2, 2.25, 2, False)], ("long", "double")),
            epoch="e", batch_id=1)
    out = t.read(spark)
    assert out.schema["v"].dataType.simpleString() == "double"
    assert {r["k"]: r["v"] for r in out.collect()} == {1: 1.5, 2: 2.25}

    t2 = LakeTable(str(tmp_path / "t2"), key_cols=["k"], n_buckets=4)
    t2.merge(_upd(spark, [(1, 5, 1, False)], ("long", "int")),
             epoch="e", batch_id=0)
    t2.merge(_upd(spark, [(2, 2.25, 2, False)], ("long", "double")),
             epoch="e", batch_id=1)
    assert t2.read(spark).schema["v"].dataType.simpleString() == "double"
    assert {r["k"]: r["v"] for r in t2.read(spark).collect()} == {
        1: 5.0, 2: 2.25
    }


def test_lossy_and_incompatible_drift_refused_pre_write(spark, tmp_path):
    t = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4)
    t.merge(_upd(spark, [(1, BIG, 1, False)], ("long", "long")),
            epoch="e", batch_id=0)
    v_before = t.manifest()["version"]
    with pytest.raises(SchemaEnforcementError, match="lossless"):
        t.merge(_upd(spark, [(2, 1.5, 2, False)], ("long", "double")),
                epoch="e", batch_id=1)
    with pytest.raises(SchemaEnforcementError, match="lossless"):
        t.merge(_upd(spark, [(2, "x", 2, False)], ("long", "string")),
                epoch="e", batch_id=1)
    # nothing was committed, the batch stays replayable
    assert t.manifest()["version"] == v_before
    assert t.read(spark).count() == 1


def test_key_widening_refused(spark, tmp_path):
    t = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4)
    t.merge(_upd(spark, [(1, 1, 1, False)], ("int", "long")),
            epoch="e", batch_id=0)
    with pytest.raises(SchemaEnforcementError, match="key column"):
        t.merge(_upd(spark, [(BIG, 2, 2, False)], ("long", "long")),
                epoch="e", batch_id=1)


def test_strict_mode_refuses_widening_but_allows_upcast(spark, tmp_path):
    t = LakeTable(
        str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
        schema_mode="strict",
    )
    t.merge(_upd(spark, [(1, BIG, 1, False)], ("long", "long")),
            epoch="e", batch_id=0)
    # narrower input casts up silently — the table schema is unchanged
    t.merge(_upd(spark, [(2, 5, 2, False)], ("long", "int")),
            epoch="e", batch_id=1)
    assert {r["k"]: r["v"] for r in t.read(spark).collect()} == {
        1: BIG, 2: 5
    }
    with pytest.raises(SchemaEnforcementError, match="strict"):
        t.merge(
            spark.createDataFrame(
                [(3, 1, 3, False)],
                "k long, v2 int, _lsn long, __is_delete boolean",
            ),
            epoch="e", batch_id=2,
        )


def test_widened_mor_table_compacts_changelogs_and_time_travels(
    spark, tmp_path
):
    t = LakeTable(
        str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
        merge_strategy="append", changelog=True,
    )
    t.merge(_upd(spark, [(1, 5, 1, False), (2, 7, 2, False)],
                 ("long", "int")), epoch="e", batch_id=0)
    t.merge(_upd(spark, [(2, BIG, 3, False)], ("long", "long")),
            epoch="e", batch_id=1)
    # changelog read spans the int batch and the long batch
    chg = t.read_changelog(spark)
    assert chg.schema["v"].dataType.simpleString() == "bigint"
    assert chg.filter(F.col("_change_type") == "insert").count() >= 2
    # time travel to v1 keeps the OLD (narrow-file) state readable
    v1 = t.read(spark, version=1)
    assert {r["k"]: r["v"] for r in v1.collect()} == {1: 5, 2: 7}
    # compaction folds the mixed-width deltas into clean long files
    t.compact(spark)
    out = t.read(spark)
    assert out.schema["v"].dataType.simpleString() == "bigint"
    assert {r["k"]: r["v"] for r in out.collect()} == {1: 5, 2: BIG}


def test_void_update_column_casts_to_manifest_type(spark, tmp_path):
    """A literal-None (void-typed) update column — what a view fold
    synthesizes for a payload it has no value for — must cast to the
    manifest type losslessly, not be refused as incompatible drift
    (hypothesis found this via the maintained-join law: a left-join
    fold writing a NULL dim payload for never-matched facts)."""
    t = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=2,
                  merge_strategy="broadcast")
    t.merge(_upd(spark, [(1, "a", 1, False)], ("long", "string")),
            epoch="e", batch_id=0)
    void_upd = spark.createDataFrame(
        [(2, 2, False)], "k long, _lsn long, __is_delete boolean"
    ).withColumn("v", F.lit(None))  # untyped None -> void
    assert void_upd.schema["v"].dataType.simpleString() == "void"
    t.merge(void_upd, epoch="e", batch_id=1)
    out = t.read(spark)
    assert out.schema["v"].dataType.simpleString() == "string"
    assert {r["k"]: r["v"] for r in out.collect()} == {1: "a", 2: None}


def test_void_manifest_column_widens_to_real_type(spark, tmp_path):
    """The mirror case: the table's first batch carried only NULLs for
    a column (manifest records void); a later typed batch widens the
    manifest to the real type."""
    t = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=2,
                  merge_strategy="broadcast")
    first = spark.createDataFrame(
        [(1, 1, False)], "k long, _lsn long, __is_delete boolean"
    ).withColumn("v", F.lit(None))
    t.merge(first, epoch="e", batch_id=0)
    t.merge(_upd(spark, [(2, "b", 2, False)], ("long", "string")),
            epoch="e", batch_id=1)
    out = t.read(spark)
    assert out.schema["v"].dataType.simpleString() == "string"
    assert {r["k"]: r["v"] for r in out.collect()} == {1: None, 2: "b"}
