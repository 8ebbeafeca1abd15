"""Changelog-maintained join view (MaintainedJoin): the delta-join
decomposition dV = dL x R_new  UNION  (L_new \\ dL) x dR applied per
committed batch.

The money test: after EVERY batch, the maintained view equals a full
recompute join of the two base tables' current states — across fact
inserts/updates/deletes, fk retargeting, dim updates, dim deletes
(inner cascade vs left null-out), late-arriving dims, and null fks.

Reference parity note: the reference SMT catalog is single-record
(no joins); this is engine-level capability beyond
aiven/transforms-for-apache-kafka-connect (SURVEY.md §2.3).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    MaintainedJoin,
    batch_changes,
)

_FACT = T.StructType([
    T.StructField("order_id", T.LongType(), False),
    T.StructField("cust_id", T.LongType(), True),
    T.StructField("amount", T.DoubleType(), True),
    T.StructField("_lsn", T.LongType(), False),
    T.StructField("__is_delete", T.BooleanType(), False),
])
_DIM = T.StructType([
    T.StructField("cust_id", T.LongType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("tier", T.StringType(), True),
    T.StructField("_lsn", T.LongType(), False),
    T.StructField("__is_delete", T.BooleanType(), False),
])

# per batch: (facts, dims) update rows
#   fact: (order_id, cust_id, amount, lsn, is_delete)
#   dim:  (cust_id, name, tier, lsn, is_delete)
_BATCHES = [
    (  # b0: base load; o3 references a dim that doesn't exist yet,
       # o4 has a NULL fk
        [(1, 1, 10.0, 1, False), (2, 2, 20.0, 2, False),
         (3, 9, 30.0, 3, False), (4, None, 40.0, 4, False)],
        [(1, "ann", "gold", 1, False), (2, "bob", "silver", 2, False),
         (4, "dee", "bronze", 3, False)],
    ),
    (  # b1: o1 amount update; o2 retargets fk 2->3 (3 doesn't exist);
       # o5/o6 insert; dim c4 tier update; dim c1 DELETED (o1 cascades
       # out under inner, nulls out under left)
        [(1, 1, 11.0, 5, False), (2, 3, 20.0, 6, False),
         (5, 4, 50.0, 7, False), (6, 9, 60.0, 8, False)],
        [(4, "dee", "gold", 4, False), (1, None, None, 5, True)],
    ),
    (  # b2: o3 deleted; late dims c9 and c3 arrive (o6 and o2 light up
       # under inner)
        [(3, None, None, 9, True)],
        [(9, "zed", "gold", 6, False), (3, "cat", "silver", 7, False)],
    ),
]


def _mk_tables(spark, tmp_path, **join_kw):
    left = LakeTable(str(tmp_path / "facts"), key_cols=["order_id"],
                     n_buckets=4, discovery=False,
                     merge_strategy="broadcast", changelog=True)
    right = LakeTable(str(tmp_path / "dims"), key_cols=["cust_id"],
                      n_buckets=4, discovery=False,
                      merge_strategy="broadcast", changelog=True)
    mj = MaintainedJoin(root=str(tmp_path / "mj"), left=left, right=right,
                        fk_cols=["cust_id"], n_buckets=4, **join_kw)
    return left, right, mj


def _recompute(left, right, spark, how):
    """Full-recompute oracle with the view's column shape."""
    l = left.read(spark)
    r = (right.read(spark)
         .withColumnRenamed("_lsn", "_lsn_dim")
         .withColumnRenamed("cust_id", "__k"))
    j = l.join(r, l["cust_id"] == r["__k"], how).drop("__k", "_lsn_dim")
    return j


def _apply_batch(spark, left, right, mj, b, facts, dims):
    if dims:
        right.merge(spark.createDataFrame(dims, _DIM), epoch="e", batch_id=b)
    if facts:
        left.merge(spark.createDataFrame(facts, _FACT), epoch="e", batch_id=b)
    lchg = (batch_changes(left, spark, epoch="e", batch_id=b)
            if facts and left.has_changes("e", b) else None)
    rchg = (batch_changes(right, spark, epoch="e", batch_id=b)
            if dims and right.has_changes("e", b) else None)
    if lchg is not None and rchg is not None:
        mj.apply_both(lchg, rchg, epoch="e", batch_id=b)
    elif lchg is not None:
        mj.apply_changes(lchg, epoch="e", batch_id=b)
    elif rchg is not None:
        mj.apply_right_changes(rchg, epoch="e", batch_id=b)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(r[c] for c in cols) for r in df.select(*cols).collect()),
        key=str,  # None-safe ordering
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_view_matches_recompute_after_every_batch(spark, tmp_path, how):
    left, right, mj = _mk_tables(spark, tmp_path, how=how)
    for b, (facts, dims) in enumerate(_BATCHES):
        _apply_batch(spark, left, right, mj, b, facts, dims)
        got = _rows(mj.read(spark))
        want = _rows(_recompute(left, right, spark, how))
        assert got == want, f"batch {b} ({how}): {got} != {want}"


def test_inner_final_state_is_expected_set(spark, tmp_path):
    left, right, mj = _mk_tables(spark, tmp_path, how="inner")
    for b, (facts, dims) in enumerate(_BATCHES):
        _apply_batch(spark, left, right, mj, b, facts, dims)
    final = {
        (r["order_id"], r["cust_id"], r["name"], r["tier"])
        for r in mj.read(spark).collect()
    }
    # o1 cascaded out with dim c1's delete; o3 deleted; o4 null-fk;
    # o2 -> late dim c3; o5 -> updated c4; o6 -> late dim c9
    assert final == {
        (2, 3, "cat", "silver"),
        (5, 4, "dee", "gold"),
        (6, 9, "zed", "gold"),
    }


def test_left_unmatched_rows_surface_with_null_dim_cols(spark, tmp_path):
    left, right, mj = _mk_tables(spark, tmp_path, how="left")
    for b, (facts, dims) in enumerate(_BATCHES[:2]):
        _apply_batch(spark, left, right, mj, b, facts, dims)
    rows = {r["order_id"]: (r["name"], r["tier"])
            for r in mj.read(spark).collect()}
    # all live facts present; o1 (dim deleted), o2 (retargeted to
    # missing), o4 (null fk), o6 (dim not yet arrived) carry nulls
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    assert rows[1] == (None, None)
    assert rows[2] == (None, None)
    assert rows[4] == (None, None)
    assert rows[6] == (None, None)
    assert rows[5] == ("dee", "gold")


def test_exactly_once_reapply_is_skipped(spark, tmp_path):
    left, right, mj = _mk_tables(spark, tmp_path, how="inner")
    facts, dims = _BATCHES[0]
    _apply_batch(spark, left, right, mj, 0, facts, dims)
    before = _rows(mj.read(spark))
    lchg = batch_changes(left, spark, epoch="e", batch_id=0)
    rchg = batch_changes(right, spark, epoch="e", batch_id=0)
    out = mj.apply_both(lchg, rchg, epoch="e", batch_id=0)
    assert out.get("skipped") is True
    assert _rows(mj.read(spark)) == before


def test_left_and_right_sides_ledger_independently(spark, tmp_path):
    """The same (epoch, batch_id) may arrive once from each side —
    the view ledgers them under distinct derived epochs."""
    left, right, mj = _mk_tables(spark, tmp_path, how="inner")
    facts, dims = _BATCHES[0]
    right.merge(spark.createDataFrame(dims, _DIM), epoch="e", batch_id=0)
    left.merge(spark.createDataFrame(facts, _FACT), epoch="e", batch_id=0)
    rchg = batch_changes(right, spark, epoch="e", batch_id=0)
    lchg = batch_changes(left, spark, epoch="e", batch_id=0)
    r1 = mj.apply_right_changes(rchg, epoch="e", batch_id=0)
    r2 = mj.apply_changes(lchg, epoch="e", batch_id=0)
    assert not r1.get("skipped") and not r2.get("skipped")
    assert _rows(mj.read(spark)) == _rows(
        _recompute(left, right, spark, "inner")
    )


def test_right_maintainer_adapter(spark, tmp_path):
    left, right, mj = _mk_tables(spark, tmp_path, how="inner")
    facts, dims = _BATCHES[0]
    right.merge(spark.createDataFrame(dims, _DIM), epoch="e", batch_id=0)
    left.merge(spark.createDataFrame(facts, _FACT), epoch="e", batch_id=0)
    mj.apply_changes(batch_changes(left, spark, epoch="e", batch_id=0),
                     epoch="e", batch_id=0)
    adapter = mj.right_maintainer()
    # dim-side batch arrives through the Replayer maintenance protocol
    dims2 = [(9, "zed", "gold", 6, False)]
    right.merge(spark.createDataFrame(dims2, _DIM), epoch="e", batch_id=1)
    adapter.apply_changes(batch_changes(right, spark, epoch="e", batch_id=1),
                          epoch="e", batch_id=1)
    got = {(r["order_id"], r["name"]) for r in mj.read(spark).collect()}
    assert (3, "zed") in got  # o3 -> c9 lit up via the adapter


def test_fk_retarget_moves_view_row(spark, tmp_path):
    left, right, mj = _mk_tables(spark, tmp_path, how="inner")
    _apply_batch(spark, left, right, mj, 0,
                 [(1, 1, 10.0, 1, False)],
                 [(1, "ann", "gold", 1, False),
                  (2, "bob", "silver", 2, False)])
    _apply_batch(spark, left, right, mj, 1,
                 [(1, 2, 10.0, 5, False)], [])
    rows = mj.read(spark).collect()
    assert len(rows) == 1 and rows[0]["name"] == "bob"


def test_dim_update_rewrites_only_referencing_rows(spark, tmp_path):
    """A dim-side batch touches exactly the fact rows referencing the
    changed keys — verified through the view contents; the read is the
    multi-point 'in' path."""
    left, right, mj = _mk_tables(spark, tmp_path, how="inner")
    facts = [(i, i % 3 + 1, float(i), i + 1, False) for i in range(30)]
    dims = [(k, f"n{k}", "base", 100 + k, False) for k in (1, 2, 3)]
    _apply_batch(spark, left, right, mj, 0, facts, dims)
    # update only dim 2
    _apply_batch(spark, left, right, mj, 1,
                 [], [(2, "n2", "vip", 200, False)])
    tiers = {(r["order_id"], r["tier"]) for r in mj.read(spark).collect()}
    for oid, fk, *_ in facts:
        assert (oid, "vip" if fk == 2 else "base") in tiers


def test_in_where_op_reads_correct_rows_and_prunes_files(spark, tmp_path):
    """('col','in',values) on a compacted COW table: exact results and
    zone-map file skipping — the dim-delta scan path at scale."""
    t = LakeTable(str(tmp_path / "t"), key_cols=["id"], n_buckets=2,
                  discovery=False, merge_strategy="broadcast",
                  target_rows_per_file=50)
    rows = [(i, i // 100, f"v{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, g long, v string") \
        .withColumn("__is_delete", F.lit(False))
    t.merge(df, epoch="e", batch_id=0)
    t.compact(spark, all_buckets=True, sort_cols=["g"])
    got = t.read(spark, where=[("g", "in", [2, 7])])
    assert got.count() == 200
    assert set(r["g"] for r in got.select("g").distinct().collect()) == {2, 7}
    p = t.last_prune
    assert p["files_read"] < p["files_total"]
    # empty membership list: no rows, no files
    assert t.read(spark, where=[("g", "in", [])]).count() == 0


def test_in_where_on_mor_table_filters_without_wrong_rows(spark, tmp_path):
    """Non-key 'in' on a merge-on-read table must not resurrect
    superseded versions: results equal post-LWW filtering."""
    t = LakeTable(str(tmp_path / "t"), key_cols=["id"], n_buckets=2,
                  discovery=False, merge_strategy="append")
    mk = lambda rows: spark.createDataFrame(
        rows, "id long, g long, _lsn long").withColumn(
        "__is_delete", F.lit(False))
    t.merge(mk([(i, 1, i) for i in range(10)]), epoch="e", batch_id=0)
    # move ids 0-4 to group 2 (newer versions)
    t.merge(mk([(i, 2, 100 + i) for i in range(5)]), epoch="e", batch_id=1)
    got = sorted(r["id"] for r in t.read(
        spark, where=[("g", "in", [1])]).collect())
    assert got == [5, 6, 7, 8, 9]


def test_changelog_view_cascades_downstream(spark, tmp_path):
    """changelog=True on the view: a second hop can replicate the
    maintained join without reading it."""
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        apply_changes_to_table,
    )

    left, right, mj = _mk_tables(spark, tmp_path, how="inner",
                                 changelog=True)
    replica = LakeTable(str(tmp_path / "replica"), key_cols=["order_id"],
                        n_buckets=4, discovery=False,
                        merge_strategy="broadcast")
    for b, (facts, dims) in enumerate(_BATCHES):
        _apply_batch(spark, left, right, mj, b, facts, dims)
        for tag in ("L", "R", "LR"):
            ve = f"e#{tag}"
            if mj.view.has_changes(ve, b):
                apply_changes_to_table(
                    replica,
                    batch_changes(mj.view, spark, epoch=ve, batch_id=b),
                    epoch=ve, batch_id=b,
                )
    assert _rows(replica.read(spark)) == _rows(mj.read(spark))


def test_medallion_rollup_over_view_stays_consistent(spark, tmp_path):
    """Gold-layer aggregate maintained from the VIEW's changelog
    (maintain=[...] on the MaintainedJoin): per-tier count/sum over the
    joined rows equals a recompute after every batch — including the
    dim-driven batch that MOVES facts between tiers (c4 bronze->gold),
    the retraction path."""
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        MaintainedAggregate,
    )

    gold = LakeTable(str(tmp_path / "gold"), key_cols=["tier"],
                     n_buckets=2, discovery=False,
                     merge_strategy="broadcast")
    left, right, mj = _mk_tables(
        spark, tmp_path, how="inner", changelog=True,
        maintain=[MaintainedAggregate(
            table=gold, group_cols=["tier"], sum_cols=["amount"],
        )],
    )
    for b, (facts, dims) in enumerate(_BATCHES):
        _apply_batch(spark, left, right, mj, b, facts, dims)
        got = {r["tier"]: (r["n_rows"], round(r["sum_amount"], 6))
               for r in gold.read(spark).collect()}
        want = {r["tier"]: (r["n"], round(r["s"], 6))
                for r in mj.read(spark).groupBy("tier").agg(
                    F.count("*").alias("n"),
                    F.sum("amount").alias("s")).collect()}
        assert got == want, f"batch {b}: {got} != {want}"


def test_maintain_requires_changelog_view(spark, tmp_path):
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        MaintainedAggregate,
    )

    left = LakeTable(str(tmp_path / "l"), key_cols=["a"], n_buckets=2)
    right = LakeTable(str(tmp_path / "r"), key_cols=["b"], n_buckets=2)
    gold = LakeTable(str(tmp_path / "g"), key_cols=["g"], n_buckets=2)
    with pytest.raises(ValueError, match="changelog=True"):
        MaintainedJoin(
            root=str(tmp_path / "m"), left=left, right=right,
            fk_cols=["b"],
            maintain=[MaintainedAggregate(table=gold, group_cols=["g"])],
        )


def test_two_replayers_maintain_the_view_through_the_protocol(
    spark, tmp_path
):
    """The deployment shape: a facts Replayer with maintain=[mj] and a
    dims Replayer with maintain=[mj.right_maintainer()], batches
    interleaved — the view tracks the recompute join at every step."""
    from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
    from transforms_for_apache_kafka_connect_spark.streaming import Replayer

    fact_env_schema = T.StructType([
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("key", T.StructType(
            [T.StructField("order_id", T.LongType())])),
        T.StructField("value", T.StructType([
            T.StructField("op", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("before", T.StructType([
                T.StructField("cust_id", T.LongType()),
                T.StructField("amount", T.DoubleType())])),
            T.StructField("after", T.StructType([
                T.StructField("cust_id", T.LongType()),
                T.StructField("amount", T.DoubleType())])),
        ])),
        T.StructField("timestamp", T.LongType()),
        T.StructField("headers",
                      T.MapType(T.StringType(), T.StringType())),
    ])
    dim_env_schema = T.StructType([
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("key", T.StructType(
            [T.StructField("cust_id", T.LongType())])),
        T.StructField("value", T.StructType([
            T.StructField("op", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("before", T.StructType(
                [T.StructField("tier", T.StringType())])),
            T.StructField("after", T.StructType(
                [T.StructField("tier", T.StringType())])),
        ])),
        T.StructField("timestamp", T.LongType()),
        T.StructField("headers",
                      T.MapType(T.StringType(), T.StringType())),
    ])

    def fenv(events):  # (lsn, order_id, op, cust_id, amount)
        rows = [("f", 0, (oid,),
                 (op, lsn, lsn, None,
                  None if op == "d" else (cid, amt)), lsn, None)
                for lsn, oid, op, cid, amt in events]
        return spark.createDataFrame(rows, fact_env_schema)

    def denv(events):  # (lsn, cust_id, op, tier)
        rows = [("d", 0, (cid,),
                 (op, lsn, lsn, None,
                  None if op == "d" else (tier,)), lsn, None)
                for lsn, cid, op, tier in events]
        return spark.createDataFrame(rows, dim_env_schema)

    left = LakeTable(str(tmp_path / "facts"), key_cols=["order_id"],
                     n_buckets=4, discovery=False,
                     merge_strategy="broadcast", changelog=True)
    right = LakeTable(str(tmp_path / "dims"), key_cols=["cust_id"],
                      n_buckets=4, discovery=False,
                      merge_strategy="broadcast", changelog=True)
    mj = MaintainedJoin(root=str(tmp_path / "mj"), left=left, right=right,
                        fk_cols=["cust_id"], how="inner", n_buckets=4)
    frep = Replayer(table=left, chain=Chain([]), epoch="ef",
                    maintain=[mj])
    drep = Replayer(table=right, chain=Chain([]), epoch="ed",
                    maintain=[mj.right_maintainer()])

    # interleave: dims b0, facts b0, dims b1 (tier update + delete),
    # facts b1 (fk retarget + delete)
    drep.apply_batch(denv([(1, 1, "u", "gold"), (2, 2, "u", "silver")]), 0)
    frep.apply_batch(fenv([(1, 10, "u", 1, 5.0), (2, 11, "u", 2, 6.0),
                           (3, 12, "u", 3, 7.0)]), 0)
    drep.apply_batch(denv([(3, 2, "u", "bronze"), (4, 1, "d", None),
                           (5, 3, "u", "new")]), 1)
    frep.apply_batch(fenv([(4, 11, "u", 3, 6.5), (5, 12, "d", None, None)]),
                     1)

    got = _rows(mj.read(spark))
    want = _rows(_recompute(left, right, spark, "inner"))
    assert got == want
    tiers = {(r["order_id"], r["tier"]) for r in mj.read(spark).collect()}
    # order 10's dim was deleted; order 12 deleted; order 11 retargeted
    # to the late dim 3
    assert tiers == {(11, "new")}


def test_streaming_facts_maintain_the_view(spark, tmp_path):
    """Structured Streaming deployment: facts arrive through
    Replayer.stream (foreachBatch + checkpoint) with maintain=[mj];
    the view tracks the recompute join, and a checkpoint restart is a
    no-op."""
    from transforms_for_apache_kafka_connect_spark import Chain
    from transforms_for_apache_kafka_connect_spark.sources import (
        change_stream,
    )
    from transforms_for_apache_kafka_connect_spark.streaming import Replayer

    BASE = 1_600_000_000_000
    N = 2_000
    events = change_stream(spark, N, n_repos=12, paths_per_repo=3)
    src = str(tmp_path / "incoming")
    events.filter(F.col("timestamp") < BASE + N // 2).write.parquet(
        src + "/f1.parquet")
    events.filter(F.col("timestamp") >= BASE + N // 2).write.parquet(
        src + "/f2.parquet")

    left = LakeTable(str(tmp_path / "t"), n_buckets=8,
                     merge_strategy="broadcast", discovery=False,
                     changelog=True)
    right = LakeTable(str(tmp_path / "dims"), key_cols=["repo"],
                      n_buckets=4, discovery=False,
                      merge_strategy="broadcast", changelog=True)
    mj = MaintainedJoin(root=str(tmp_path / "mj"), left=left, right=right,
                        fk_cols=["repo"], how="inner", n_buckets=8)
    # static dim: every repo except repo-0 (its facts stay out of the
    # inner view)
    repos = [f"repo-{i}" for i in range(1, 12)]
    right.merge(
        spark.createDataFrame([(r, f"team-{i % 3}") for i, r in
                               enumerate(repos)], "repo string, team string")
        .withColumn("_lsn", F.lit(0))
        .withColumn("__is_delete", F.lit(False)),
        epoch="dim", batch_id=0)
    mj.apply_right_changes(
        batch_changes(right, spark, epoch="dim", batch_id=0),
        epoch="dim", batch_id=0)

    rep = Replayer(table=left, chain=Chain([]), epoch="s1", maintain=[mj])
    q = rep.stream(
        spark.readStream.schema(events.schema).parquet(src + "/*"),
        str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)

    def recompute():
        l = left.read(spark)
        r = (right.read(spark).withColumnRenamed("_lsn", "_lsn_dim")
             .withColumnRenamed("repo", "__k"))
        return (l.join(r, l["repo"] == r["__k"], "inner")
                .drop("__k", "_lsn_dim"))

    assert _rows(mj.read(spark)) == _rows(recompute())
    assert mj.read(spark).filter("repo = 'repo-0'").count() == 0

    # restart over the same checkpoint: ledgers make it a no-op
    q2 = rep.stream(
        spark.readStream.schema(events.schema).parquet(src + "/*"),
        str(tmp_path / "ckpt"), available_now=True)
    q2.awaitTermination(120)
    assert _rows(mj.read(spark)) == _rows(recompute())


def test_snowflake_three_table_chain(spark, tmp_path):
    """Snowflake composition: facts JOIN dim1 -> view1 (changelog) is
    itself the LEFT of a second MaintainedJoin against dim2, chained
    through view1's maintain=[...] — a 3-table denormalization kept
    incremental end to end, including a dim2-side update."""
    facts_t = LakeTable(str(tmp_path / "facts"), key_cols=["order_id"],
                        n_buckets=4, discovery=False,
                        merge_strategy="broadcast", changelog=True)
    dim1 = LakeTable(str(tmp_path / "dim1"), key_cols=["cust_id"],
                     n_buckets=4, discovery=False,
                     merge_strategy="broadcast", changelog=True)
    dim2 = LakeTable(str(tmp_path / "dim2"), key_cols=["region_id"],
                     n_buckets=2, discovery=False,
                     merge_strategy="broadcast", changelog=True)
    mj1 = MaintainedJoin(root=str(tmp_path / "mj1"), left=facts_t,
                         right=dim1, fk_cols=["cust_id"], how="inner",
                         n_buckets=4, changelog=True)
    mj2 = MaintainedJoin(root=str(tmp_path / "mj2"), left=mj1.view,
                         right=dim2, fk_cols=["region_id"], how="inner",
                         n_buckets=4)
    mj1.maintain.append(mj2)  # second hop chains off view1's changelog

    dim2_rows = [(1, "emea", 1, False), (2, "apac", 2, False)]
    dim2.merge(spark.createDataFrame(
        dim2_rows, "region_id long, region string, _lsn long, "
        "__is_delete boolean"), epoch="e", batch_id=0)
    mj2.apply_right_changes(
        batch_changes(dim2, spark, epoch="e", batch_id=0),
        epoch="e", batch_id=0)

    dim1_rows = [(1, "ann", 1, 1, False), (2, "bob", 2, 2, False)]
    dim1.merge(spark.createDataFrame(
        dim1_rows, "cust_id long, name string, region_id long, _lsn long, "
        "__is_delete boolean"), epoch="e", batch_id=0)
    mj1.apply_right_changes(
        batch_changes(dim1, spark, epoch="e", batch_id=0),
        epoch="e", batch_id=0)

    fact_rows = [(10, 1, 5.0, 1, False), (11, 2, 6.0, 2, False),
                 (12, 1, 7.0, 3, False)]
    facts_t.merge(spark.createDataFrame(
        fact_rows, "order_id long, cust_id long, amount double, _lsn long, "
        "__is_delete boolean"), epoch="e", batch_id=1)
    mj1.apply_changes(
        batch_changes(facts_t, spark, epoch="e", batch_id=1),
        epoch="e", batch_id=1)

    got = {(r["order_id"], r["name"], r["region"])
           for r in mj2.read(spark).collect()}
    assert got == {(10, "ann", "emea"), (11, "bob", "apac"),
                   (12, "ann", "emea")}

    # dim2 update ripples through the second hop only
    dim2.merge(spark.createDataFrame(
        [(1, "europe", 10, False)],
        "region_id long, region string, _lsn long, __is_delete boolean"),
        epoch="e", batch_id=1)
    mj2.apply_right_changes(
        batch_changes(dim2, spark, epoch="e", batch_id=1),
        epoch="e", batch_id=1)
    got = {(r["order_id"], r["region"]) for r in mj2.read(spark).collect()}
    assert got == {(10, "europe"), (11, "apac"), (12, "europe")}

    # dim1 retarget ripples through BOTH hops via view1's changelog
    dim1.merge(spark.createDataFrame(
        [(1, "ann", 2, 20, False)],
        "cust_id long, name string, region_id long, _lsn long, "
        "__is_delete boolean"), epoch="e", batch_id=1)
    mj1.apply_right_changes(
        batch_changes(dim1, spark, epoch="e", batch_id=1),
        epoch="e", batch_id=1)
    got = {(r["order_id"], r["region"]) for r in mj2.read(spark).collect()}
    assert got == {(10, "apac"), (11, "apac"), (12, "apac")}


def test_noop_dim_fold_is_ledgered_against_replay(spark, tmp_path):
    """Regression (review finding): a dim batch folded while the fact
    table was still empty is a no-op — but it must still be ledgered,
    or a later replay re-applies its STALE post-images over newer dim
    values in the view."""
    left, right, mj = _mk_tables(spark, tmp_path, how="inner")
    # dim batch 0 arrives before any facts: old tier for cust 1
    right.merge(spark.createDataFrame(
        [(1, "ann", "OLD", 1, False)], _DIM), epoch="e", batch_id=0)
    r0 = batch_changes(right, spark, epoch="e", batch_id=0)
    out = mj.apply_right_changes(r0, epoch="e", batch_id=0)
    assert out.get("noop") is True
    # facts arrive (probing the dim's CURRENT state incl. batch 0)
    left.merge(spark.createDataFrame(
        [(10, 1, 5.0, 2, False)], _FACT), epoch="e", batch_id=1)
    mj.apply_changes(batch_changes(left, spark, epoch="e", batch_id=1),
                     epoch="e", batch_id=1)
    # dim batch 1: tier moves to NEW
    right.merge(spark.createDataFrame(
        [(1, "ann", "NEW", 3, False)], _DIM), epoch="e", batch_id=1)
    mj.apply_right_changes(batch_changes(right, spark, epoch="e",
                                         batch_id=1),
                           epoch="e", batch_id=1)
    assert [r["tier"] for r in mj.read(spark).collect()] == ["NEW"]
    # dims pipeline crashes and replays batches 0..1: batch 0 must be
    # skipped by its ledger-only commit, batch 1 by the data commit
    s0 = mj.apply_right_changes(r0, epoch="e", batch_id=0)
    s1 = mj.apply_right_changes(
        batch_changes(right, spark, epoch="e", batch_id=1),
        epoch="e", batch_id=1)
    assert s0.get("skipped") and s1.get("skipped")
    assert [r["tier"] for r in mj.read(spark).collect()] == ["NEW"]


def test_in_where_rejects_scalars_and_handles_generators(spark, tmp_path):
    """Regression (review finding): a bare string must raise (it would
    silently explode into characters); a generator must be materialized
    once, not consumed by the first file's prune test."""
    t = LakeTable(str(tmp_path / "t"), key_cols=["id"], n_buckets=2,
                  discovery=False, merge_strategy="broadcast",
                  target_rows_per_file=50)
    rows = [(i, i // 100) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, g long") \
        .withColumn("__is_delete", F.lit(False))
    t.merge(df, epoch="e", batch_id=0)
    t.compact(spark, all_buckets=True, sort_cols=["g"])
    with pytest.raises(ValueError, match="'in' takes"):
        t.read(spark, where=[("g", "in", "1")])
    with pytest.raises(ValueError, match="'in' takes"):
        t.read(spark, where=[("g", "in", 1)])
    got = t.read(spark, where=[("g", "in", (v for v in [1, 3]))])
    assert got.count() == 200


def test_validation_errors(spark, tmp_path):
    left = LakeTable(str(tmp_path / "l"), key_cols=["a"], n_buckets=2)
    right = LakeTable(str(tmp_path / "r"), key_cols=["b"], n_buckets=2)
    with pytest.raises(ValueError, match="how"):
        MaintainedJoin(root=str(tmp_path / "m1"), left=left, right=right,
                       fk_cols=["a"], how="full")
    with pytest.raises(ValueError, match="positionally"):
        MaintainedJoin(root=str(tmp_path / "m2"), left=left, right=right,
                       fk_cols=["a", "c"])


def test_dim_schema_appearing_in_changeless_batch_widens_left_view(
    spark, tmp_path
):
    """Regression (hypothesis find): a fact with a NULL fk folds while
    the dim table is still schema-less, so the view is created with
    left columns only. The dim's schema then appears via a batch that
    produces NO change rows (a delete merged into the empty dim). The
    fold is a verifiable no-op, but the left-join contract now includes
    the dim payload columns — the ledger-only commit must widen the
    view schema so the never-retouched fact reads with null dim
    columns, exactly like the recompute join."""
    left, right, mj = _mk_tables(spark, tmp_path, how="left")
    left.merge(spark.createDataFrame([(1, None, 10.0, 1, False)], _FACT),
               epoch="e", batch_id=0)
    mj.apply_changes(batch_changes(left, spark, epoch="e", batch_id=0),
                     epoch="e", batch_id=0)
    assert "tier" not in mj.read(spark).columns
    # dim delete against the empty dim: establishes the schema, zero
    # change rows
    right.merge(
        spark.createDataFrame([(1, None, None, 2, True)], _DIM),
        epoch="e", batch_id=1,
    )
    out = mj.apply_right_changes(
        batch_changes(right, spark, epoch="e", batch_id=1),
        epoch="e", batch_id=1,
    )
    assert out["noop"] is True
    got = mj.read(spark)
    assert {"name", "tier"} <= set(got.columns)
    row = got.collect()[0]
    assert (row["order_id"], row["name"], row["tier"]) == (1, None, None)
    # replay of the widening batch: skipped through the one ledger
    replay = mj.apply_right_changes(
        batch_changes(right, spark, epoch="e", batch_id=1),
        epoch="e", batch_id=1,
    )
    assert replay["skipped"] is True


def test_crash_between_view_commit_and_downstream_fold_recovers(
    spark, tmp_path
):
    """Crash window the _apply docstring promises to close: the view's
    merge commits, then the process dies BEFORE the downstream
    maintainer folds the view's changelog. The replay must skip the
    view (its ledger) but still fold the maintainer (its own ledger),
    and a second full replay must be a no-op everywhere."""
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        MaintainedAggregate,
    )

    gold = LakeTable(str(tmp_path / "gold"), key_cols=["tier"],
                     n_buckets=2, discovery=False,
                     merge_strategy="broadcast")
    left, right, mj = _mk_tables(
        spark, tmp_path, how="inner", changelog=True,
        maintain=[MaintainedAggregate(
            table=gold, group_cols=["tier"], sum_cols=["amount"],
        )],
    )
    facts0, dims0 = _BATCHES[0]
    _apply_batch(spark, left, right, mj, 0, facts0, dims0)

    real = mj._fold_downstream
    calls = {"n": 0}

    def dying(spark_, vepoch, batch_id):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash before downstream fold")
        return real(spark_, vepoch, batch_id)

    mj._fold_downstream = dying
    facts1, dims1 = _BATCHES[1]
    with pytest.raises(RuntimeError, match="simulated crash"):
        _apply_batch(spark, left, right, mj, 1, facts1, dims1)
    # the view committed batch 1 but gold did not fold it
    view_rows = _rows(mj.read(spark))
    want_gold = {r["tier"]: (r["n"], round(r["s"], 6))
                 for r in mj.read(spark).groupBy("tier").agg(
                     F.count("*").alias("n"),
                     F.sum("amount").alias("s")).collect()}
    got_gold = {r["tier"]: (r["n_rows"], round(r["sum_amount"], 6))
                for r in gold.read(spark).collect()}
    assert got_gold != want_gold, "crash did not open the window"

    # replay batch 1 (new process would re-run the maintenance call):
    # view skips through its ledger, downstream folds exactly once
    _apply_batch(spark, left, right, mj, 1, facts1, dims1)
    assert _rows(mj.read(spark)) == view_rows
    got_gold = {r["tier"]: (r["n_rows"], round(r["sum_amount"], 6))
                for r in gold.read(spark).collect()}
    assert got_gold == want_gold

    # a second full replay is a no-op for both tables
    v_before = (mj.view.manifest()["version"], gold.manifest()["version"])
    _apply_batch(spark, left, right, mj, 1, facts1, dims1)
    assert _rows(mj.read(spark)) == view_rows
    assert {r["tier"]: (r["n_rows"], round(r["sum_amount"], 6))
            for r in gold.read(spark).collect()} == want_gold
    assert gold.manifest()["version"] == v_before[1]
