"""Changelog-maintained STAR view (MaintainedStar): one denormalized
table over a fact table and N dims, folded per committed batch.

The money test: after every batch — fact inserts/updates/deletes, fk
retargets, per-dim updates/deletes (inner cascade vs left null-out),
late dims, batches touching SEVERAL dims at once — the view equals a
full recompute of facts JOIN dim0 JOIN dim1 [JOIN dim2]."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.streaming import (
    DimSpec,
    LakeTable,
    MaintainedStar,
    batch_changes,
)

_FACT = T.StructType([
    T.StructField("order_id", T.LongType(), False),
    T.StructField("cust_id", T.LongType(), True),
    T.StructField("part_id", T.LongType(), True),
    T.StructField("amount", T.DoubleType(), True),
    T.StructField("_lsn", T.LongType(), False),
    T.StructField("__is_delete", T.BooleanType(), False),
])
_CUST = T.StructType([
    T.StructField("cust_id", T.LongType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("_lsn", T.LongType(), False),
    T.StructField("__is_delete", T.BooleanType(), False),
])
_PART = T.StructType([
    T.StructField("part_id", T.LongType(), False),
    T.StructField("pname", T.StringType(), True),
    T.StructField("_lsn", T.LongType(), False),
    T.StructField("__is_delete", T.BooleanType(), False),
])

# per batch: (facts, custs, parts)
_BATCHES = [
    (  # b0: facts before the part dim exists; o3 has a null part fk
        [(1, 1, 100, 10.0, 1, False), (2, 2, 200, 20.0, 2, False),
         (3, 1, None, 30.0, 3, False)],
        [(1, "ann", 1, False), (2, "bob", 2, False)],
        [],
    ),
    (  # b1: part dim arrives late (o1/o2 light up under inner);
       # o4 inserts; cust 2 renamed
        [(4, 2, 100, 40.0, 4, False)],
        [(2, "bobby", 3, False)],
        [(100, "widget", 1, False), (200, "gadget", 2, False)],
    ),
    (  # b2: cust 1 DELETED (o1, o3 cascade out under inner);
       # o2 retargets part 200 -> 100; part 200 deleted
        [(2, 2, 100, 20.0, 5, False)],
        [(1, None, 4, True)],
        [(200, None, 3, True)],
    ),
]


def _mk(spark, tmp_path, hows=("inner", "inner"), **kw):
    facts = LakeTable(str(tmp_path / "facts"), key_cols=["order_id"],
                      n_buckets=4, discovery=False,
                      merge_strategy="broadcast", changelog=True)
    cust = LakeTable(str(tmp_path / "cust"), key_cols=["cust_id"],
                     n_buckets=2, discovery=False,
                     merge_strategy="broadcast", changelog=True)
    part = LakeTable(str(tmp_path / "part"), key_cols=["part_id"],
                     n_buckets=2, discovery=False,
                     merge_strategy="broadcast", changelog=True)
    star = MaintainedStar(
        root=str(tmp_path / "star"), left=facts,
        dims=[DimSpec(table=cust, fk_cols=["cust_id"], how=hows[0]),
              DimSpec(table=part, fk_cols=["part_id"], how=hows[1])],
        n_buckets=4, **kw,
    )
    return facts, cust, part, star


def _apply(spark, facts_t, cust_t, part_t, star, b, facts, custs, parts):
    if custs:
        cust_t.merge(spark.createDataFrame(custs, _CUST),
                     epoch="e", batch_id=b)
    if parts:
        part_t.merge(spark.createDataFrame(parts, _PART),
                     epoch="e", batch_id=b)
    if facts:
        facts_t.merge(spark.createDataFrame(facts, _FACT),
                      epoch="e", batch_id=b)
    lchg = (batch_changes(facts_t, spark, epoch="e", batch_id=b)
            if facts and facts_t.has_changes("e", b) else None)
    dchg = {}
    if custs and cust_t.has_changes("e", b):
        dchg[0] = batch_changes(cust_t, spark, epoch="e", batch_id=b)
    if parts and part_t.has_changes("e", b):
        dchg[1] = batch_changes(part_t, spark, epoch="e", batch_id=b)
    if lchg is not None or dchg:
        star.apply_all(lchg, dchg, epoch="e", batch_id=b)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(r[c] for c in cols) for r in df.select(*cols).collect()),
        key=str,
    )


def _recompute(spark, facts_t, cust_t, part_t, hows):
    l = facts_t.read(spark)
    out = l
    for t, fk, keycol, how in [
        (cust_t, "cust_id", "cust_id", hows[0]),
        (part_t, "part_id", "part_id", hows[1]),
    ]:
        if t.manifest()["schema"] is None:
            if how == "inner":
                return out.limit(0)
            continue
        r = (t.read(spark).drop("_lsn")
             .withColumnRenamed(keycol, "__k"))
        out = out.join(r, out[fk] == r["__k"], how).drop("__k")
    return out


@pytest.mark.parametrize("hows", [("inner", "inner"), ("left", "left"),
                                  ("inner", "left")])
def test_star_matches_recompute_after_every_batch(spark, tmp_path, hows):
    facts_t, cust_t, part_t, star = _mk(spark, tmp_path, hows=hows)
    for b, (facts, custs, parts) in enumerate(_BATCHES):
        _apply(spark, facts_t, cust_t, part_t, star, b,
               facts, custs, parts)
        if star.view.manifest()["schema"] is None:
            assert _recompute(spark, facts_t, cust_t, part_t, hows
                              ).count() == 0
            continue
        got = _rows(star.read(spark))
        want = _rows(_recompute(spark, facts_t, cust_t, part_t, hows))
        if not got and not want:
            continue
        assert got == want, f"batch {b} hows={hows}"


def test_star_inner_final_state(spark, tmp_path):
    facts_t, cust_t, part_t, star = _mk(spark, tmp_path)
    for b, (facts, custs, parts) in enumerate(_BATCHES):
        _apply(spark, facts_t, cust_t, part_t, star, b,
               facts, custs, parts)
    final = {(r["order_id"], r["name"], r["pname"])
             for r in star.read(spark).collect()}
    # cust 1 deleted -> o1, o3 out; part 200 deleted but o2 retargeted
    # to 100 in the same batch; o4 survives with renamed bobby
    assert final == {(2, "bobby", "widget"), (4, "bobby", "widget")}


def test_dim_maintainer_adapters_and_exactly_once(spark, tmp_path):
    facts_t, cust_t, part_t, star = _mk(spark, tmp_path)
    facts, custs, parts = _BATCHES[0]
    cust_t.merge(spark.createDataFrame(custs, _CUST), epoch="e", batch_id=0)
    facts_t.merge(spark.createDataFrame(facts, _FACT), epoch="e", batch_id=0)
    star.dim_maintainer(0).apply_changes(
        batch_changes(cust_t, spark, epoch="e", batch_id=0),
        epoch="e", batch_id=0)
    star.apply_changes(
        batch_changes(facts_t, spark, epoch="e", batch_id=0),
        epoch="e", batch_id=0)
    before = _rows(star.read(spark))
    # replays of both sides are skipped through the one ledger
    s1 = star.dim_maintainer(0).apply_changes(
        batch_changes(cust_t, spark, epoch="e", batch_id=0),
        epoch="e", batch_id=0)
    s2 = star.apply_changes(
        batch_changes(facts_t, spark, epoch="e", batch_id=0),
        epoch="e", batch_id=0)
    assert s1.get("skipped") and s2.get("skipped")
    assert _rows(star.read(spark)) == before
    with pytest.raises(ValueError, match="no dims"):
        star.dim_maintainer(7)


def test_star_validation(spark, tmp_path):
    facts = LakeTable(str(tmp_path / "f"), key_cols=["a"], n_buckets=2)
    d = LakeTable(str(tmp_path / "d"), key_cols=["b"], n_buckets=2)
    with pytest.raises(ValueError, match="at least one"):
        MaintainedStar(root=str(tmp_path / "s1"), left=facts, dims=[])
    with pytest.raises(ValueError, match="positionally"):
        MaintainedStar(root=str(tmp_path / "s2"), left=facts,
                       dims=[DimSpec(table=d, fk_cols=["x", "y"])])
    with pytest.raises(ValueError, match="'inner' or 'left'"):
        MaintainedStar(root=str(tmp_path / "s3"), left=facts,
                       dims=[DimSpec(table=d, fk_cols=["b"], how="full")])


def test_star_colliding_dim_columns_are_suffixed(spark, tmp_path):
    """Two dims sharing a payload column name: the second gets _d1."""
    facts_t = LakeTable(str(tmp_path / "f"), key_cols=["order_id"],
                        n_buckets=2, discovery=False,
                        merge_strategy="broadcast", changelog=True)
    d0 = LakeTable(str(tmp_path / "d0"), key_cols=["k0"], n_buckets=2,
                   discovery=False, merge_strategy="broadcast",
                   changelog=True)
    d1 = LakeTable(str(tmp_path / "d1"), key_cols=["k1"], n_buckets=2,
                   discovery=False, merge_strategy="broadcast",
                   changelog=True)
    star = MaintainedStar(
        root=str(tmp_path / "s"), left=facts_t,
        dims=[DimSpec(table=d0, fk_cols=["f0"]),
              DimSpec(table=d1, fk_cols=["f1"])], n_buckets=2)
    mk = lambda rows, ddl: spark.createDataFrame(rows, ddl) \
        .withColumn("__is_delete", F.lit(False))
    d0.merge(mk([(1, "x")], "k0 long, label string"), epoch="e", batch_id=0)
    d1.merge(mk([(9, "y")], "k1 long, label string"), epoch="e", batch_id=0)
    facts_t.merge(mk([(10, 1, 9)], "order_id long, f0 long, f1 long"),
                  epoch="e", batch_id=0)
    star.apply_all(
        batch_changes(facts_t, spark, epoch="e", batch_id=0),
        {0: batch_changes(d0, spark, epoch="e", batch_id=0),
         1: batch_changes(d1, spark, epoch="e", batch_id=0)},
        epoch="e", batch_id=0)
    row = star.read(spark).collect()[0]
    assert row["label"] == "x" and row["label_d1"] == "y"


def test_dim_schema_appearing_in_changeless_batch_widens_star(
    spark, tmp_path
):
    """Regression (mirrors the joinview hypothesis find): a left-how
    dim whose schema appears via a change-less batch (delete into an
    empty dim) must still widen the star view's schema through the
    ledger-only commit."""
    facts_t = LakeTable(str(tmp_path / "f"), key_cols=["order_id"],
                        n_buckets=2, discovery=False,
                        merge_strategy="broadcast", changelog=True)
    d0 = LakeTable(str(tmp_path / "d0"), key_cols=["k0"], n_buckets=2,
                   discovery=False, merge_strategy="broadcast",
                   changelog=True)
    star = MaintainedStar(
        root=str(tmp_path / "s"), left=facts_t,
        dims=[DimSpec(table=d0, fk_cols=["f0"], how="left")], n_buckets=2)
    mk = lambda rows, ddl, dele=False: spark.createDataFrame(rows, ddl) \
        .withColumn("__is_delete", F.lit(dele))
    facts_t.merge(mk([(10, None)], "order_id long, f0 long"),
                  epoch="e", batch_id=0)
    star.apply_changes(batch_changes(facts_t, spark, epoch="e", batch_id=0),
                       epoch="e", batch_id=0)
    assert "label" not in star.read(spark).columns
    d0.merge(mk([(1, None)], "k0 long, label string", dele=True),
             epoch="e", batch_id=1)
    out = star.dim_maintainer(0).apply_changes(
        batch_changes(d0, spark, epoch="e", batch_id=1),
        epoch="e", batch_id=1)
    assert out["noop"] is True
    row = star.read(spark).collect()[0]
    assert (row["order_id"], row["label"]) == (10, None)
