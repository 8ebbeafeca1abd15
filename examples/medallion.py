#!/usr/bin/env python
"""The incremental medallion in one runnable script:

    bronze   facts + two dims, each a changelog-enabled LakeTable
    silver   one denormalized STAR view (facts x customer x priority),
             maintained per commit by the delta-join decomposition
    gold     a per-segment revenue rollup chained from the SILVER
             view's own changelog (maintain=[...])

No layer is ever recomputed: fact deltas probe the dims via
bucket-pruned lookups, dim deltas touch only the referencing fact rows
via the multi-point 'in' zone-map read, and the gold aggregate folds
the silver changelog's retraction rows. The script cross-checks every
layer against a full recompute after each batch.

Run: python examples/medallion.py  (local[4], ~1 min)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from transforms_for_apache_kafka_connect_spark.streaming import (
    DimSpec,
    LakeTable,
    MaintainedAggregate,
    MaintainedStar,
    batch_changes,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("medallion-example")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="tkc_medallion_")

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_name", "c_mktsegment"
    )

    # -- bronze ---------------------------------------------------------
    facts = LakeTable(os.path.join(root, "facts"), key_cols=["o_orderkey"],
                      n_buckets=8, discovery=False,
                      merge_strategy="broadcast", changelog=True)
    dcust = LakeTable(os.path.join(root, "cust"), key_cols=["c_custkey"],
                      n_buckets=8, discovery=False,
                      merge_strategy="broadcast", changelog=True)
    dprio = LakeTable(os.path.join(root, "prio"), key_cols=["prio"],
                      n_buckets=2, discovery=False,
                      merge_strategy="broadcast", changelog=True)

    # -- gold (chained off silver's changelog) ---------------------------
    gold = LakeTable(os.path.join(root, "gold"), key_cols=["c_mktsegment"],
                     n_buckets=4, discovery=False,
                     merge_strategy="broadcast")

    # -- silver ----------------------------------------------------------
    star = MaintainedStar(
        root=os.path.join(root, "silver"), left=facts,
        dims=[DimSpec(table=dcust, fk_cols=["o_custkey"], how="inner"),
              DimSpec(table=dprio, fk_cols=["o_orderpriority"],
                      how="inner")],
        n_buckets=8, changelog=True,
        maintain=[MaintainedAggregate(
            table=gold, group_cols=["c_mktsegment"],
            sum_cols=["o_totalprice"],
        )],
    )

    def fold(b, fact_df=None, cust_df=None, prio_df=None):
        dchg = {}
        if cust_df is not None:
            dcust.merge(cust_df, epoch="demo", batch_id=b)
            if dcust.has_changes("demo", b):
                dchg[0] = batch_changes(dcust, spark, epoch="demo", batch_id=b)
        if prio_df is not None:
            dprio.merge(prio_df, epoch="demo", batch_id=b)
            if dprio.has_changes("demo", b):
                dchg[1] = batch_changes(dprio, spark, epoch="demo", batch_id=b)
        lchg = None
        if fact_df is not None:
            facts.merge(fact_df, epoch="demo", batch_id=b)
            if facts.has_changes("demo", b):
                lchg = batch_changes(facts, spark, epoch="demo", batch_id=b)
        if lchg is not None or dchg:
            star.apply_all(lchg, dchg, epoch="demo", batch_id=b)

    def check(b):
        c = dcust.read(spark).drop("_lsn").withColumnRenamed(
            "c_custkey", "__c")
        p = dprio.read(spark).drop("_lsn").withColumnRenamed("prio", "__p")
        l = facts.read(spark)
        want = (l.join(c, l["o_custkey"] == c["__c"])
                 .join(p, l["o_orderpriority"] == p["__p"])
                 .drop("__c", "__p"))
        got_n, want_n = star.read(spark).count(), want.count()
        assert got_n == want_n, (b, got_n, want_n)
        g = {r["c_mktsegment"]: (r["n_rows"], round(r["sum_o_totalprice"], 2))
             for r in gold.read(spark).collect()}
        w = {r["c_mktsegment"]: (r["n"], round(r["s"], 2))
             for r in star.read(spark).groupBy("c_mktsegment").agg(
                 F.count("*").alias("n"),
                 F.sum("o_totalprice").alias("s")).collect()}
        assert g == w, (b, g, w)
        return got_n, g

    mark = lambda df: df.withColumn("__is_delete", F.lit(False))

    # batch 0: dims + even orders
    fold(0,
         fact_df=mark(orders.filter(F.col("o_orderkey") % 2 == 0)
                      .withColumn("_lsn", F.col("o_orderkey"))),
         cust_df=mark(cust.withColumn("_lsn", F.col("c_custkey"))),
         prio_df=mark(orders.select(F.col("o_orderpriority").alias("prio"))
                      .distinct()
                      .withColumn("prio_label", F.upper(F.col("prio")))
                      .withColumn("_lsn", F.lit(0))))
    n0, _ = check(0)
    print(f"batch 0: {n0} silver rows; gold consistent")

    # batch 1: odd orders + a segment re-mapping for a third of customers
    upd = (cust.filter(F.col("c_custkey") % 3 == 0)
           .withColumn("c_mktsegment", F.lit("PRIORITY"))
           .withColumn("_lsn", F.col("c_custkey") + 1_000_000)
           .withColumn("__is_delete", F.lit(False)))
    fold(1,
         fact_df=mark(orders.filter(F.col("o_orderkey") % 2 == 1)
                      .withColumn("_lsn", F.col("o_orderkey"))),
         cust_df=upd)
    n1, g1 = check(1)
    moved = g1.get("PRIORITY", (0, 0))
    print(f"batch 1: {n1} silver rows; segment re-map moved "
          f"{moved[0]} orders (${moved[1]:,.2f}) into PRIORITY — "
          f"gold retracted/re-added incrementally")

    # batch 2: a customer churns (delete) — their orders cascade out of
    # silver AND their revenue leaves gold, all from changelogs
    victim = cust.orderBy("c_custkey").limit(5)
    fold(2, cust_df=victim
         .withColumn("_lsn", F.col("c_custkey") + 2_000_000)
         .withColumn("__is_delete", F.lit(True)))
    n2, _ = check(2)
    print(f"batch 2: 5 customers churned -> {n1 - n2} orders cascaded "
          f"out of silver; gold followed via the view changelog")

    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
