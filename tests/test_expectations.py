"""Data-quality expectations over the merge input (Delta CHECK /
DLT-expectations analog): fail aborts the batch pre-commit, drop
filters and counts, warn counts and logs; NULL predicates pass (SQL
CHECK semantics) and delete rows are exempt."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.errors import DataException
from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
from transforms_for_apache_kafka_connect_spark.streaming import (
    Expectation,
    LakeTable,
    Replayer,
)

SCHEMA = T.StructType([
    T.StructField("topic", T.StringType()),
    T.StructField("partition", T.IntegerType()),
    T.StructField("key", T.StructType([T.StructField("id", T.StringType())])),
    T.StructField("value", T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("after", T.StructType([
            T.StructField("content", T.StringType()),
            T.StructField("n", T.LongType()),
        ])),
    ])),
    T.StructField("timestamp", T.LongType()),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
])


def _batch(spark, rows):
    """rows: (id, op, lsn, content, n)"""
    return spark.createDataFrame(
        [("t", 0, (i,), (op, lsn, lsn, (c, n)), lsn, None)
         for i, op, lsn, c, n in rows],
        SCHEMA,
    )


def _rep(tmp_path, expectations, name="t"):
    table = LakeTable(str(tmp_path / name), key_cols=["id"], n_buckets=2,
                      merge_strategy="broadcast", discovery=False)
    return table, Replayer(table=table, chain=Chain([]), epoch="e",
                           unique_lsn=True, expectations=expectations)


def test_fail_expectation_aborts_batch_and_is_replayable(spark, tmp_path):
    table, rep = _rep(tmp_path, [
        Expectation("content_present", "content IS NOT NULL", "fail"),
    ])
    good = _batch(spark, [("a", "c", 1, "x", 1)])
    rep.apply_batch(good, 0)
    bad = _batch(spark, [("b", "c", 2, None, 2), ("c", "c", 3, "y", 3)])
    with pytest.raises(DataException, match="content_present.*2? row"):
        rep.apply_batch(bad, 1)
    # table untouched by the failed batch; ledger lacks it
    assert {r["id"] for r in table.read(spark).collect()} == {"a"}
    assert not table.committed("e", 1)
    # the batch is replayable once the expectation is relaxed
    table2, rep2 = _rep(tmp_path, [
        Expectation("content_present", "content IS NOT NULL", "drop"),
    ], name="t")  # same root -> same table
    r = rep2.apply_batch(bad, 1)
    assert r["expectation_violations"] == {"content_present": 1}
    assert {r["id"] for r in table2.read(spark).collect()} == {"a", "c"}


def test_drop_expectation_filters_and_counts(spark, tmp_path):
    table, rep = _rep(tmp_path, [
        Expectation("n_positive", "n > 0", "drop"),
    ])
    r = rep.apply_batch(_batch(spark, [
        ("a", "c", 1, "x", 5),
        ("b", "c", 2, "y", -1),
        ("c", "c", 3, "z", 0),
    ]), 0)
    assert r["expectation_violations"] == {"n_positive": 2}
    assert {row["id"] for row in table.read(spark).collect()} == {"a"}


def test_warn_expectation_keeps_rows(spark, tmp_path):
    table, rep = _rep(tmp_path, [
        Expectation("n_positive", "n > 0", "warn"),
    ])
    r = rep.apply_batch(_batch(spark, [
        ("a", "c", 1, "x", 5), ("b", "c", 2, "y", -1),
    ]), 0)
    assert r["expectation_violations"] == {"n_positive": 1}
    assert {row["id"] for row in table.read(spark).collect()} == {"a", "b"}


def test_null_predicate_passes_and_deletes_exempt(spark, tmp_path):
    table, rep = _rep(tmp_path, [
        Expectation("n_positive", "n > 0", "fail"),
    ])
    # n NULL -> predicate NULL -> passes (SQL CHECK semantics)
    rep.apply_batch(_batch(spark, [("a", "c", 1, "x", None)]), 0)
    assert table.read(spark).count() == 1
    # delete rows have a null payload: exempt even from fail mode
    rep.apply_batch(_batch(spark, [("a", "d", 2, None, None)]), 1)
    assert table.read(spark).count() == 0


def test_clean_batch_reports_no_violations(spark, tmp_path):
    table, rep = _rep(tmp_path, [
        Expectation("n_positive", "n > 0", "fail"),
        Expectation("content_present", "content IS NOT NULL", "drop"),
    ])
    r = rep.apply_batch(_batch(spark, [("a", "c", 1, "x", 1)]), 0)
    assert "expectation_violations" not in r


def test_invalid_action_rejected():
    with pytest.raises(ValueError, match="action"):
        Expectation("x", "1=1", "explode")


def test_cli_expectations_file(spark, tmp_path, capsys):
    import json as _json

    from tests.test_cli import change_stream  # reuse the CLI test stream
    from transforms_for_apache_kafka_connect_spark.cli import main

    events = change_stream(spark, 500, n_repos=6, paths_per_repo=3)
    events.write.mode("overwrite").parquet(str(tmp_path / "events"))
    spec = [{"name": "lang_known", "expr": "lang IS NOT NULL",
             "action": "drop"}]
    (tmp_path / "exp.json").write_text(_json.dumps(spec))
    assert main(["--table", str(tmp_path / "t"), "--buckets", "4",
                 "--batches", "1",
                 "--expectations", str(tmp_path / "exp.json"),
                 "--events", str(tmp_path / "events")]) == 0
    out = capsys.readouterr().out
    table = LakeTable(str(tmp_path / "t"), n_buckets=4)
    assert table.read(spark).filter(F.col("lang").isNull()).count() == 0

    # malformed spec -> exit 2
    (tmp_path / "bad.json").write_text('[{"name": "x"}]')
    assert main(["--table", str(tmp_path / "t2"), "--buckets", "4",
                 "--expectations", str(tmp_path / "bad.json"),
                 "--events", str(tmp_path / "events")]) == 2
