"""Regression tests for the round-4 review findings in the maintained
views and the merge-on-read resolution layer:

1. equal-``_lsn`` versions in an append-strategy (MoR) table resolve
   by COMMIT ORDER (``__seq``), not nondeterministically;
2. a view changelog applied to an MoR second-hop replica converges even
   when dim-driven rewrites / deletes tie on the fact's ``_lsn``;
3. an append-strategy dim's ``_deleted``/``__seq`` storage internals
   never leak into a view's payload columns;
4. collision suffixes are decided against the fact MANIFEST, so an
   insert-only fact batch that omits a colliding column cannot flip a
   dim column back to its unsuffixed name;
5. a dim batch matching no facts commits ledger-only instead of
   rewriting the view;
6. ``apply_all`` tolerates ``None`` entries inside ``dim_changes``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.streaming import (
    DimSpec,
    LakeTable,
    MaintainedJoin,
    MaintainedStar,
    batch_changes,
)
from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
    apply_changes_to_table,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(r[c] for c in cols) for r in df.select(*cols).collect()),
        key=str,
    )


def _mk(spark, rows, ddl, dele=False):
    return spark.createDataFrame(rows, ddl).withColumn(
        "__is_delete", F.lit(dele)
    )


# ---------------------------------------------------------------------
# 1. MoR ties resolve by commit order
# ---------------------------------------------------------------------
def test_mor_equal_lsn_versions_resolve_by_commit_order(spark, tmp_path):
    t = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=2,
                  merge_strategy="append", discovery=False)
    t.merge(_mk(spark, [(1, "old", 10)], "k long, v string, _lsn long"),
            epoch="e", batch_id=0)
    # same key, SAME _lsn, different payload in a later commit: the
    # later commit must win — before __seq this was max_by on a tied
    # key, i.e. whichever task happened to see which row first
    t.merge(_mk(spark, [(1, "new", 10)], "k long, v string, _lsn long"),
            epoch="e", batch_id=1)
    for _ in range(3):  # nondeterminism guard: stable across reads
        assert [(r["k"], r["v"]) for r in t.read(spark).collect()] \
            == [(1, "new")]
    # a delete marker tying the row's _lsn must also win
    t.merge(_mk(spark, [(1, None, 10)], "k long, v string, _lsn long",
                dele=True), epoch="e", batch_id=2)
    assert t.read(spark).count() == 0
    # __seq is storage-internal: never surfaced by read()
    assert "__seq" not in t.read(spark).columns


def test_mor_higher_lsn_still_beats_later_commit(spark, tmp_path):
    """__seq is a TIEBREAK only: source LSN order stays primary."""
    t = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=2,
                  merge_strategy="append", discovery=False)
    t.merge(_mk(spark, [(1, "newer", 20)], "k long, v string, _lsn long"),
            epoch="e", batch_id=0)
    t.merge(_mk(spark, [(1, "stale", 10)], "k long, v string, _lsn long"),
            epoch="e", batch_id=1)
    assert [(r["k"], r["v"]) for r in t.read(spark).collect()] \
        == [(1, "newer")]


# ---------------------------------------------------------------------
# 2. view changelog -> MoR second hop converges despite _lsn ties
# ---------------------------------------------------------------------
def test_view_changelog_to_mor_replica_converges_on_ties(spark, tmp_path):
    left = LakeTable(str(tmp_path / "f"), key_cols=["order_id"],
                     n_buckets=2, discovery=False,
                     merge_strategy="broadcast", changelog=True)
    right = LakeTable(str(tmp_path / "d"), key_cols=["cust_id"],
                      n_buckets=2, discovery=False,
                      merge_strategy="broadcast", changelog=True)
    mj = MaintainedJoin(root=str(tmp_path / "mj"), left=left, right=right,
                        fk_cols=["cust_id"], how="inner", n_buckets=2,
                        changelog=True)
    replica = LakeTable(str(tmp_path / "rep"), key_cols=["order_id"],
                        n_buckets=2, merge_strategy="append",
                        discovery=False)

    def hop(b):
        for tag in ("L", "R", "LR"):
            ve = f"e#{tag}"
            if mj.view.has_changes(ve, b):
                apply_changes_to_table(
                    replica, batch_changes(mj.view, spark, epoch=ve,
                                           batch_id=b),
                    epoch=ve, batch_id=b)

    # b0: fact (lsn 10) + dim (lsn 5) -> one view row
    left.merge(_mk(spark, [(1, 1, 10)],
                   "order_id long, cust_id long, _lsn long"),
               epoch="e", batch_id=0)
    right.merge(_mk(spark, [(1, "gold", 5)],
                    "cust_id long, tier string, _lsn long"),
                epoch="e", batch_id=0)
    mj.apply_both(batch_changes(left, spark, epoch="e", batch_id=0),
                  batch_changes(right, spark, epoch="e", batch_id=0),
                  epoch="e", batch_id=0)
    hop(0)
    assert _rows(replica.read(spark)) == _rows(mj.read(spark))

    # b1: DIM-side update rewrites the view row with the fact's _lsn
    # UNCHANGED (10) — the replica's MoR resolution ties on _lsn and
    # must pick the later commit's payload
    right.merge(_mk(spark, [(1, "silver", 6)],
                    "cust_id long, tier string, _lsn long"),
                epoch="e", batch_id=1)
    mj.apply_right_changes(batch_changes(right, spark, epoch="e",
                                         batch_id=1),
                           epoch="e", batch_id=1)
    hop(1)
    assert _rows(replica.read(spark)) == _rows(mj.read(spark))
    assert [r["tier"] for r in replica.read(spark).collect()] == ["silver"]

    # b2: fact delete -> view delete whose _change_lsn is null; the
    # replica's delete marker coalesces to the pre-image's _lsn (10),
    # tying the base row — the delete must still win
    left.merge(_mk(spark, [(1, None, 11)],
                   "order_id long, cust_id long, _lsn long", dele=True),
               epoch="e", batch_id=2)
    mj.apply_changes(batch_changes(left, spark, epoch="e", batch_id=2),
                     epoch="e", batch_id=2)
    hop(2)
    assert replica.read(spark).count() == 0
    assert mj.read(spark).count() == 0


# ---------------------------------------------------------------------
# 3. MoR dim internals never become view payload
# ---------------------------------------------------------------------
def test_append_strategy_dim_feeds_view_without_internal_cols(
    spark, tmp_path
):
    left = LakeTable(str(tmp_path / "f"), key_cols=["order_id"],
                     n_buckets=2, discovery=False,
                     merge_strategy="broadcast", changelog=True)
    right = LakeTable(str(tmp_path / "d"), key_cols=["cust_id"],
                      n_buckets=2, merge_strategy="append",
                      discovery=False, changelog=True)
    mj = MaintainedJoin(root=str(tmp_path / "mj"), left=left, right=right,
                        fk_cols=["cust_id"], how="inner", n_buckets=2)
    right.merge(_mk(spark, [(1, "gold", 1)],
                    "cust_id long, tier string, _lsn long"),
                epoch="e", batch_id=0)
    # a second MoR version of the same dim key: reads must resolve LWW
    right.merge(_mk(spark, [(1, "plat", 2)],
                    "cust_id long, tier string, _lsn long"),
                epoch="e", batch_id=1)
    left.merge(_mk(spark, [(7, 1, 3)],
                   "order_id long, cust_id long, _lsn long"),
               epoch="e", batch_id=2)
    mj.apply_changes(batch_changes(left, spark, epoch="e", batch_id=2),
                     epoch="e", batch_id=2)
    got = mj.read(spark)
    assert "_deleted" not in got.columns and "__seq" not in got.columns
    assert [(r["order_id"], r["tier"]) for r in got.collect()] \
        == [(7, "plat")]


# ---------------------------------------------------------------------
# 4. suffix decisions anchor to the manifest, not the batch frame
# ---------------------------------------------------------------------
def test_insert_only_batch_missing_colliding_column_keeps_suffix(
    spark, tmp_path
):
    left = LakeTable(str(tmp_path / "f"), key_cols=["order_id"],
                     n_buckets=8, discovery=False,
                     merge_strategy="broadcast", changelog=True)
    right = LakeTable(str(tmp_path / "d"), key_cols=["cust_id"],
                      n_buckets=2, discovery=False,
                      merge_strategy="broadcast", changelog=True)
    mj = MaintainedJoin(root=str(tmp_path / "mj"), left=left, right=right,
                        fk_cols=["cust_id"], how="inner", n_buckets=2)
    right.merge(_mk(spark, [(1, "DIM", 1)],
                    "cust_id long, label string, _lsn long"),
                epoch="e", batch_id=0)
    # batch 0: fact WITH the colliding 'label' column
    left.merge(_mk(spark, [(0, 1, "FACT", 2)],
                   "order_id long, cust_id long, label string, _lsn long"),
               epoch="e", batch_id=0)
    mj.apply_changes(batch_changes(left, spark, epoch="e", batch_id=0),
                     epoch="e", batch_id=0)
    assert [(r["label"], r["label_r"]) for r in mj.read(spark).collect()] \
        == [("FACT", "DIM")]
    # batch 1: a change frame WITHOUT 'label' — batch_changes itself
    # always projects the manifest schema, but apply_changes is a
    # public protocol entry point and a hand-built frame (or another
    # CDC source) may carry only the columns its batch touched
    k = 42
    left.merge(_mk(spark, [(k, 1, 3)],
                   "order_id long, cust_id long, _lsn long"),
               epoch="e", batch_id=1)
    chg = batch_changes(left, spark, epoch="e", batch_id=1).drop("label")
    mj.apply_changes(chg, epoch="e", batch_id=1)
    got = {r["order_id"]: (r["label"], r["label_r"])
           for r in mj.read(spark).collect()}
    # the dim's 'label' must STAY in label_r; fact 'label' is null for
    # the new row — before the fix the dim value landed in 'label'
    assert got[0] == ("FACT", "DIM")
    assert got[k] == (None, "DIM")


def test_star_insert_only_batch_missing_colliding_column_keeps_suffix(
    spark, tmp_path
):
    left = LakeTable(str(tmp_path / "f"), key_cols=["order_id"],
                     n_buckets=8, discovery=False,
                     merge_strategy="broadcast", changelog=True)
    d0 = LakeTable(str(tmp_path / "d0"), key_cols=["k0"], n_buckets=2,
                   discovery=False, merge_strategy="broadcast",
                   changelog=True)
    star = MaintainedStar(
        root=str(tmp_path / "s"), left=left,
        dims=[DimSpec(table=d0, fk_cols=["f0"])], n_buckets=2)
    d0.merge(_mk(spark, [(1, "DIM", 1)],
                 "k0 long, label string, _lsn long"),
             epoch="e", batch_id=0)
    left.merge(_mk(spark, [(0, 1, "FACT", 2)],
                   "order_id long, f0 long, label string, _lsn long"),
               epoch="e", batch_id=0)
    star.apply_changes(batch_changes(left, spark, epoch="e", batch_id=0),
                       epoch="e", batch_id=0)
    k = 42
    left.merge(_mk(spark, [(k, 1, 3)], "order_id long, f0 long, _lsn long"),
               epoch="e", batch_id=1)
    chg = batch_changes(left, spark, epoch="e", batch_id=1).drop("label")
    star.apply_changes(chg, epoch="e", batch_id=1)
    got = {r["order_id"]: (r["label"], r["label_d0"])
           for r in star.read(spark).collect()}
    assert got[0] == ("FACT", "DIM")
    assert got[k] == (None, "DIM")


# ---------------------------------------------------------------------
# 5. no-match dim batches are ledger-only commits
# ---------------------------------------------------------------------
def test_unreferenced_dim_batch_is_ledger_only(spark, tmp_path):
    left = LakeTable(str(tmp_path / "f"), key_cols=["order_id"],
                     n_buckets=2, discovery=False,
                     merge_strategy="broadcast", changelog=True)
    right = LakeTable(str(tmp_path / "d"), key_cols=["cust_id"],
                      n_buckets=2, discovery=False,
                      merge_strategy="broadcast", changelog=True)
    mj = MaintainedJoin(root=str(tmp_path / "mj"), left=left, right=right,
                        fk_cols=["cust_id"], how="inner", n_buckets=2)
    right.merge(_mk(spark, [(1, "gold", 1)],
                    "cust_id long, tier string, _lsn long"),
                epoch="e", batch_id=0)
    left.merge(_mk(spark, [(7, 1, 2)],
                   "order_id long, cust_id long, _lsn long"),
               epoch="e", batch_id=0)
    mj.apply_both(batch_changes(left, spark, epoch="e", batch_id=0),
                  batch_changes(right, spark, epoch="e", batch_id=0),
                  epoch="e", batch_id=0)
    before = _rows(mj.read(spark))
    # dim upsert to a key NO fact references: the fold must not touch
    # any view bucket (ledger-only commit), yet still be replay-skipped
    right.merge(_mk(spark, [(99, "zzz", 3)],
                    "cust_id long, tier string, _lsn long"),
                epoch="e", batch_id=1)
    out = mj.apply_right_changes(
        batch_changes(right, spark, epoch="e", batch_id=1),
        epoch="e", batch_id=1)
    assert out["touched_buckets"] == []
    assert _rows(mj.read(spark)) == before
    replay = mj.apply_right_changes(
        batch_changes(right, spark, epoch="e", batch_id=1),
        epoch="e", batch_id=1)
    assert replay["skipped"] is True
    # the dim state change is still visible to LATER fact folds
    left.merge(_mk(spark, [(8, 99, 4)],
                   "order_id long, cust_id long, _lsn long"),
               epoch="e", batch_id=2)
    mj.apply_changes(batch_changes(left, spark, epoch="e", batch_id=2),
                     epoch="e", batch_id=2)
    got = {r["order_id"]: r["tier"] for r in mj.read(spark).collect()}
    assert got == {7: "gold", 8: "zzz"}


# ---------------------------------------------------------------------
# 6. apply_all tolerates None dim entries
# ---------------------------------------------------------------------
def test_apply_all_tolerates_none_dim_entries(spark, tmp_path):
    left = LakeTable(str(tmp_path / "f"), key_cols=["order_id"],
                     n_buckets=2, discovery=False,
                     merge_strategy="broadcast", changelog=True)
    d0 = LakeTable(str(tmp_path / "d0"), key_cols=["k0"], n_buckets=2,
                   discovery=False, merge_strategy="broadcast",
                   changelog=True)
    d1 = LakeTable(str(tmp_path / "d1"), key_cols=["k1"], n_buckets=2,
                   discovery=False, merge_strategy="broadcast",
                   changelog=True)
    star = MaintainedStar(
        root=str(tmp_path / "s"), left=left,
        dims=[DimSpec(table=d0, fk_cols=["f0"], how="left"),
              DimSpec(table=d1, fk_cols=["f1"], how="left")], n_buckets=2)
    d0.merge(_mk(spark, [(1, "a", 1)], "k0 long, va string, _lsn long"),
             epoch="e", batch_id=0)
    left.merge(_mk(spark, [(5, 1, 9, 2)],
                   "order_id long, f0 long, f1 long, _lsn long"),
               epoch="e", batch_id=0)
    star.apply_all(
        batch_changes(left, spark, epoch="e", batch_id=0),
        {0: batch_changes(d0, spark, epoch="e", batch_id=0), 1: None},
        epoch="e", batch_id=0)
    row = star.read(spark).collect()[0]
    assert (row["order_id"], row["va"]) == (5, "a")


# ---------------------------------------------------------------------
# 7. an empty batch still declares its columns (ledger-only merge)
# ---------------------------------------------------------------------
def test_runtime_empty_merge_still_declares_new_columns(spark, tmp_path):
    """discovery=True short-circuits a runtime-empty batch to a
    ledger-only commit — but the frame's STATIC schema must still
    union into the manifest, exactly as a 1-row batch would evolve it.
    Derived views rely on this: a fact-delta fold whose post-images
    are runtime-empty still pads the newly-appeared dim payload
    columns, and losing them leaves the view permanently narrower than
    a recompute (hypothesis find, second path)."""
    t = LakeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=2,
                  discovery=True, merge_strategy="broadcast")
    t.merge(_mk(spark, [(1, "x", 1)], "k long, v string, _lsn long"),
            epoch="e", batch_id=0)
    # runtime-empty batch (filter removes the row) carrying a NEW col
    upd = _mk(spark, [(2, "y", "NEW", 2)],
              "k long, v string, extra string, _lsn long").filter(
        F.col("k") < 0
    )
    out = t.merge(upd, epoch="e", batch_id=1)
    assert out["touched_buckets"] == []
    assert "extra" in {f["name"]
                       for f in t.manifest()["schema"]["fields"]}
    got = t.read(spark).collect()
    assert [(r["k"], r["v"], r["extra"]) for r in got] == [(1, "x", None)]


def test_left_view_learns_dim_cols_through_empty_fact_fold(
    spark, tmp_path
):
    """The hypothesis-found second path end-to-end: batch 0 folds a
    null-fk fact while the dim is schema-less; batch 1 deletes an
    absent fact (zero-row changelog, has_changes True) AND inserts the
    first dim row. The fact-side delta is runtime-empty but statically
    padded with the dim's new payload columns — the view must learn
    them even though no view row changes."""
    left = LakeTable(str(tmp_path / "f"), key_cols=["order_id"],
                     n_buckets=2, discovery=False,
                     merge_strategy="broadcast", changelog=True)
    right = LakeTable(str(tmp_path / "d"), key_cols=["cust_id"],
                      n_buckets=2, discovery=False,
                      merge_strategy="broadcast", changelog=True)
    mj = MaintainedJoin(root=str(tmp_path / "mj"), left=left, right=right,
                        fk_cols=["cust_id"], how="left", n_buckets=2)
    left.merge(_mk(spark, [(1, None, 1)],
                   "order_id long, cust_id long, _lsn long"),
               epoch="e", batch_id=0)
    mj.apply_changes(batch_changes(left, spark, epoch="e", batch_id=0),
                     epoch="e", batch_id=0)
    assert "tier" not in mj.read(spark).columns
    left.merge(_mk(spark, [(99, None, 2)],
                   "order_id long, cust_id long, _lsn long", dele=True),
               epoch="e", batch_id=1)
    right.merge(_mk(spark, [(0, "gold", 3)],
                    "cust_id long, tier string, _lsn long"),
                epoch="e", batch_id=1)
    assert left.has_changes("e", 1)
    mj.apply_both(batch_changes(left, spark, epoch="e", batch_id=1),
                  batch_changes(right, spark, epoch="e", batch_id=1),
                  epoch="e", batch_id=1)
    got = mj.read(spark)
    assert "tier" in got.columns
    row = got.collect()[0]
    assert (row["order_id"], row["tier"]) == (1, None)
