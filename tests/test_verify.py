"""State-parity verification laws (streaming/verify.py): the
pt-table-checksum-shaped bucket checksum + drill-down diff."""

from __future__ import annotations

from unittest import mock

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.sources import change_stream
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    Replayer,
    row_digest,
    table_checksum,
    table_diff,
    verify_state,
)
from transforms_for_apache_kafka_connect_spark.streaming.verify import (
    checksum_frame,
)


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable(str(tmp_path / "t"), n_buckets=8, discovery=False,
                  merge_strategy="broadcast")
    Replayer(table=t, chain=Chain([]), epoch="v").apply_batch(
        change_stream(spark, 2_000, n_repos=40, paths_per_repo=5), 0
    )
    return t


def _sums(df):
    return {r["bucket"]: (r["n_rows"], r["x0"], r["x1"], r["x2"], r["x3"])
            for r in df.collect()}


def test_checksum_order_and_partitioning_independent(spark, table):
    base = _sums(table_checksum(spark, table))
    assert base and sum(n for n, *_ in base.values()) == table.read(spark).count()
    shuffled = table.read(spark).orderBy(F.rand(7)).repartition(13)
    cols = [c for c in table.read(spark).columns if c != "_lsn"]
    assert _sums(checksum_frame(table, shuffled, cols)) == base


def test_diff_empty_on_identical_state(spark, table):
    diff = table_diff(spark, table, table.read(spark))
    assert diff.count() == 0
    rep = verify_state(spark, table, table.read(spark))
    assert rep["match"] and rep["n_table_only"] == 0


def test_diff_finds_missing_modified_and_extra(spark, table):
    cur = table.read(spark)
    gone = cur.orderBy("repo", "path").limit(3).collect()
    changed = cur.orderBy(F.desc("repo"), F.desc("path")).limit(2).collect()
    gone_keys = {(r["repo"], r["path"]) for r in gone}
    changed_keys = {(r["repo"], r["path"]) for r in changed}
    assert not gone_keys & changed_keys
    is_gone = F.struct("repo", "path").isin(
        [F.struct(F.lit(a), F.lit(b)) for a, b in gone_keys]
    )
    is_changed = F.struct("repo", "path").isin(
        [F.struct(F.lit(a), F.lit(b)) for a, b in changed_keys]
    )
    extra = cur.limit(1).select(
        F.lit("ghost_repo").alias("repo"), F.lit("ghost/path").alias("path"),
        *[c for c in cur.columns if c not in ("repo", "path")],
    )
    expected = (
        cur.filter(~is_gone)
        .withColumn("content",
                    F.when(is_changed, F.lit("TAMPERED")).otherwise(F.col("content")))
        .unionByName(extra)
    )
    diff = {(r["side"], r["repo"], r["path"])
            for r in table_diff(spark, table, expected).collect()}
    want = {("table", a, b) for a, b in gone_keys}          # missing on expected
    want |= {("table", a, b) for a, b in changed_keys}      # table's version
    want |= {("expected", a, b) for a, b in changed_keys}   # tampered version
    want |= {("expected", "ghost_repo", "ghost/path")}      # extra row
    assert diff == want


def test_duplicate_row_multiplicity_detected(spark, table):
    cur = table.read(spark)
    dup = cur.orderBy("repo", "path").limit(1)
    r = dup.first()
    expected = cur.unionByName(dup)
    diff = table_diff(spark, table, expected).collect()
    assert [(d["side"], d["repo"], d["path"]) for d in diff] == [
        ("expected", r["repo"], r["path"])
    ]


def test_row_digest_injective_on_null_and_separators(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", "N;"), ("a", "V1:x;"), ("aV", "1:x;")],
        T.StructType([T.StructField("k", T.StringType()),
                      T.StructField("v", T.StringType())]),
    )
    digs = [r[0] for r in df.select(row_digest(["k", "v"])).collect()]
    assert len(set(digs)) == 4


def test_row_digest_validation():
    with pytest.raises(ValueError, match="at least one"):
        row_digest([])


def test_diff_requires_key_columns(spark, table):
    with pytest.raises(ValueError, match="key column"):
        table_diff(spark, table, table.read(spark), cols=["repo", "content"])
    with pytest.raises(ValueError, match="not in frame"):
        table_checksum(spark, table, cols=["nope"])


def test_drilldown_reads_only_mismatched_buckets(spark, table):
    cur = table.read(spark)
    victim = cur.orderBy("repo", "path").limit(1).first()
    expected = cur.filter(
        ~((F.col("repo") == victim["repo"]) & (F.col("path") == victim["path"]))
    )
    orig = LakeTable.read
    calls = []

    def spy(self, spark_, *a, **kw):
        calls.append(kw.get("buckets"))
        return orig(self, spark_, *a, **kw)

    with mock.patch.object(LakeTable, "read", spy):
        diff = table_diff(spark, table, expected).collect()
    assert [(d["side"], d["repo"], d["path"]) for d in diff] == [
        ("table", victim["repo"], victim["path"])
    ]
    pruned = [b for b in calls if b is not None]
    assert pruned and all(len(b) == 1 for b in pruned)


def test_checksum_time_travel_and_diff_against_old_version(spark, tmp_path):
    t = LakeTable(str(tmp_path / "t"), n_buckets=4, discovery=False,
                  merge_strategy="broadcast")
    rep = Replayer(table=t, chain=Chain([]), epoch="v")
    ev = change_stream(spark, 2_000, n_repos=30, paths_per_repo=4)
    mx = ev.agg(F.max("timestamp")).first()[0]
    rep.replay(ev, batch_width=mx // 2 + 1, max_pos=mx + 1)
    assert len(t.versions(spark)) >= 2 if hasattr(t, "versions") else True
    v1 = _sums(table_checksum(spark, t, version=1))
    curr = _sums(table_checksum(spark, t))
    assert v1 != curr
    # the v1 snapshot read back as the expected frame diffs empty vs v1
    assert table_diff(spark, t, t.read(spark, version=1), version=1).count() == 0
    # and the current state vs the v1 expected frame is exactly the keys
    # whose rows changed between the commits
    d = table_diff(spark, t, t.read(spark, version=1))
    keys_changed = {(r["repo"], r["path"]) for r in d.collect()}
    a = t.read(spark, version=1).select("repo", "path", "commit", "lang", "content")
    b = t.read(spark).select("repo", "path", "commit", "lang", "content")
    sym = a.exceptAll(b).select("repo", "path").union(
        b.exceptAll(a).select("repo", "path"))
    want = {(r["repo"], r["path"]) for r in sym.collect()}
    assert keys_changed == want and want


def test_expected_with_narrow_keys_buckets_correctly(spark, tmp_path):
    # the bucket hash is type-sensitive: an expected frame whose key
    # arrived as INT against a LONG-keyed table must still land in the
    # table's buckets (cast-up before hashing) — otherwise every
    # bucket mismatches and the diff degenerates to a full rescan
    t = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=4,
                  discovery=False, merge_strategy="broadcast")
    env = spark.createDataFrame(
        [("t", 0, (i,), ("u", i, 0, None, (i, f"v{i}")), i, None)
         for i in range(1, 21)],
        T.StructType([
            T.StructField("topic", T.StringType(), False),
            T.StructField("partition", T.IntegerType(), False),
            T.StructField("key", T.StructType([T.StructField("k", T.LongType())])),
            T.StructField("value", T.StructType([
                T.StructField("op", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("ts_ms", T.LongType()),
                T.StructField("before", T.StructType([
                    T.StructField("k", T.LongType()),
                    T.StructField("payload", T.StringType())])),
                T.StructField("after", T.StructType([
                    T.StructField("k", T.LongType()),
                    T.StructField("payload", T.StringType())])),
            ])),
            T.StructField("timestamp", T.LongType()),
            T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
        ]),
    )
    Replayer(table=t, chain=Chain([]), epoch="v").apply_batch(env, 0)
    narrow = t.read(spark).withColumn("k", F.col("k").cast("int"))
    assert table_diff(spark, t, narrow).count() == 0


# ---------------------------------------------------------- repair

def test_repair_makes_states_equal(spark, table):
    from transforms_for_apache_kafka_connect_spark.streaming import (
        repair_state,
        table_diff,
    )

    cur = table.read(spark)
    victim = cur.orderBy("repo", "path").limit(1).first()
    is_victim = (F.col("repo") == victim["repo"]) & (
        F.col("path") == victim["path"]
    )
    # expected: the victim row dropped, one row's content changed, one
    # new row added
    changed = cur.orderBy(F.desc("repo"), F.desc("path")).limit(1).first()
    is_changed = (F.col("repo") == changed["repo"]) & (
        F.col("path") == changed["path"]
    )
    extra = cur.limit(1).select(
        F.lit("new_repo").alias("repo"), F.lit("new/path").alias("path"),
        *[c for c in cur.columns if c not in ("repo", "path")],
    )
    expected = (
        cur.filter(~is_victim)
        .withColumn("content", F.when(is_changed, F.lit("FIXED"))
                    .otherwise(F.col("content")))
        .unionByName(extra)
    )
    r = repair_state(spark, table, expected, epoch="rp", batch_id=0)
    assert r["repaired"] == 2 and r["deleted"] == 1
    # post-repair: provably equal
    assert table_diff(spark, table, expected).count() == 0
    got = table.read(spark)
    assert got.filter(is_victim).count() == 0
    assert got.filter(is_changed).first()["content"] == "FIXED"
    assert got.filter("repo = 'new_repo'").count() == 1
    # replay is a ledger no-op
    assert repair_state(spark, table, expected, epoch="rp",
                        batch_id=0).get("skipped")


def test_repair_noop_on_equal_states(spark, table):
    from transforms_for_apache_kafka_connect_spark.streaming import repair_state

    r = repair_state(spark, table, table.read(spark), epoch="rp0")
    assert r == {"repaired": 0, "deleted": 0, "match": True}
    # the no-op is still ledgered (idempotent audit trail)
    assert table.committed("rp0", 0)


def test_repair_refuses_ambiguous_expected(spark, table):
    from transforms_for_apache_kafka_connect_spark.streaming import repair_state

    cur = table.read(spark)
    one = cur.orderBy("repo", "path").limit(1)
    tampered = one.withColumn("content", F.lit("X"))
    dup = cur.unionByName(tampered).unionByName(
        tampered.withColumn("content", F.lit("Y"))
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        repair_state(spark, table, dup, epoch="rp1")
