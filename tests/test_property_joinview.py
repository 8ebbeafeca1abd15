"""Property law for the changelog-maintained join view: ANY interleaved
sequence of fact/dim upserts and deletes, batched ANY way, leaves the
maintained view equal to a full-recompute join of the base tables'
current states — after every batch, for both inner and left semantics.

Small key spaces force the interesting collisions: fk retargeting,
dim deletes cascading facts out, dim re-inserts lighting them back up,
facts referencing never-inserted dims, null fks."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    MaintainedJoin,
    batch_changes,
)

_FACT = T.StructType([
    T.StructField("order_id", T.LongType(), False),
    T.StructField("cust_id", T.LongType(), True),
    T.StructField("amount", T.LongType(), True),
    T.StructField("_lsn", T.LongType(), False),
    T.StructField("__is_delete", T.BooleanType(), False),
])
_DIM = T.StructType([
    T.StructField("cust_id", T.LongType(), False),
    T.StructField("tier", T.StringType(), True),
    T.StructField("_lsn", T.LongType(), False),
    T.StructField("__is_delete", T.BooleanType(), False),
])

# one op: ("F", order_id, cust_id|None, amount) upsert,
#         ("Fd", order_id) delete,
#         ("D", cust_id, tier) upsert, ("Dd", cust_id) delete
fact_up = st.tuples(st.just("F"), st.integers(0, 5),
                    st.one_of(st.none(), st.integers(0, 3)),
                    st.integers(-9, 9))
fact_del = st.tuples(st.just("Fd"), st.integers(0, 5))
dim_up = st.tuples(st.just("D"), st.integers(0, 3),
                   st.sampled_from(["a", "b", "c"]))
dim_del = st.tuples(st.just("Dd"), st.integers(0, 3))
ops_strategy = st.lists(
    st.one_of(fact_up, fact_del, dim_up, dim_del), min_size=1, max_size=18
)


def _split(ops, widths):
    batches, i = [], 0
    for w in widths:
        if i >= len(ops):
            break
        batches.append(ops[i:i + w])
        i += w
    if i < len(ops):
        batches.append(ops[i:])
    return batches


def _net(batch, lsn0):
    """Last op per key within the batch (merge wants <=1 row/key),
    keeping the ORIGINAL op's lsn so cross-batch LWW stays faithful."""
    facts, dims = {}, {}
    for j, op in enumerate(batch):
        lsn = lsn0 + j
        if op[0] == "F":
            _, oid, cid, amt = op
            facts[oid] = (oid, cid, amt, lsn, False)
        elif op[0] == "Fd":
            facts[op[1]] = (op[1], None, None, lsn, True)
        elif op[0] == "D":
            _, cid, tier = op
            dims[cid] = (cid, tier, lsn, False)
        else:
            dims[op[1]] = (op[1], None, lsn, True)
    return list(facts.values()), list(dims.values())


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(r[c] for c in cols) for r in df.select(*cols).collect()),
        key=str,
    )


def _expected(left, right, spark, how):
    """Recompute-join oracle rows, tolerating never-merged (schema-less)
    base tables."""
    if left.manifest()["schema"] is None:
        return []
    l = left.read(spark)
    if right.manifest()["schema"] is None:
        if how == "inner":
            return []
        # the view has never seen a dim schema either: left cols only
        return _rows(l)
    r = (right.read(spark)
         .withColumnRenamed("_lsn", "_lsn_dim")
         .withColumnRenamed("cust_id", "__k"))
    return _rows(
        l.join(r, l["cust_id"] == r["__k"], how).drop("__k", "_lsn_dim")
    )


@pytest.mark.parametrize("how", ["inner", "left"])
@settings(max_examples=8, deadline=None)
@given(ops=ops_strategy, widths=st.lists(st.integers(1, 7), min_size=1,
                                         max_size=4))
def test_maintained_view_equals_recompute_for_any_batching(
    spark, tmp_path_factory, how, ops, widths
):
    tmp = tmp_path_factory.mktemp("pjv")
    left = LakeTable(str(tmp / "f"), key_cols=["order_id"], n_buckets=2,
                     discovery=False, merge_strategy="broadcast",
                     changelog=True)
    right = LakeTable(str(tmp / "d"), key_cols=["cust_id"], n_buckets=2,
                      discovery=False, merge_strategy="broadcast",
                      changelog=True)
    mj = MaintainedJoin(root=str(tmp / "mj"), left=left, right=right,
                        fk_cols=["cust_id"], how=how, n_buckets=2)
    lsn0 = 0
    for b, batch in enumerate(_split(ops, widths)):
        facts, dims = _net(batch, lsn0)
        lsn0 += len(batch)
        if dims:
            right.merge(spark.createDataFrame(dims, _DIM),
                        epoch="e", batch_id=b)
        if facts:
            left.merge(spark.createDataFrame(facts, _FACT),
                       epoch="e", batch_id=b)
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
        want = _expected(left, right, spark, how)
        if mj.view.manifest()["schema"] is None:
            # view never materialized a row: legal only when the
            # recompute join is empty
            assert want == []
            continue
        got = _rows(mj.read(spark))
        if not got and not want:
            continue  # delete-only view: column sets may differ, both empty
        assert got == want, f"diverged at batch {b} (how={how})"
