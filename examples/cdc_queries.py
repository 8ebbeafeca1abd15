#!/usr/bin/env python
"""The CDC query layer in one runnable script: replay a change stream
into a lake table with changelog capture + continuous rollups, then
answer the four questions every CDC consumer eventually asks —

1. current state        (LakeTable.read  — LWW, type 1)
2. full history         (scd2_history    — type 2 intervals)
3. state at position P  (as_of / read(version=...) — query vs commit grain)
4. per-bucket timeline  (TimeRollup      — continuous aggregate)

plus a point-in-time enrichment (asof_join) of an event feed against
the dimension's history and gap-based activity sessionization
(sessionize / session_summary) of the raw change feed.

Run: python examples/cdc_queries.py  (local[4], ~1 min)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from transforms_for_apache_kafka_connect_spark.functions import (
    asof_join,
    session_summary,
    sessionize,
)
from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
from transforms_for_apache_kafka_connect_spark.sources import change_stream
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeTable,
    Replayer,
    SCD2Table,
    TimeRollup,
    as_of,
    scd2_history,
)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("cdc-queries-example")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="tkc_cdc_queries_")
    n = 20_000
    base = 1_600_000_000_000

    # -- ingest: replay the binlog-style stream in 8 commits ----------
    events = change_stream(spark, n, n_repos=50, paths_per_repo=6)
    table = LakeTable(
        os.path.join(root, "repositories"), n_buckets=8,
        discovery=False, merge_strategy="broadcast", changelog=True,
    )
    # _lsn here runs 0..n (event ordinals); treat it as ms so the demo
    # rollup has real bucket structure: 2.5k-"ms" and 10k-"ms" buckets
    roll = TimeRollup(
        root=os.path.join(root, "rollup"), time_col="_lsn",
        granularities=["2500 milliseconds", "10 seconds"],
    )
    scd2 = SCD2Table(root=os.path.join(root, "scd2"),
                     key_cols=["repo", "path"])
    rep = Replayer(table=table, chain=Chain([]), epoch="demo",
                   maintain=[*roll.specs, scd2])
    rep.replay(events, batch_width=-(-n // 8), start_pos=base,
               max_pos=base + n)

    # 1. current state (type 1)
    cur = table.read(spark)
    print(f"current state: {cur.count()} live (repo, path) keys")

    # 2. full history (type 2) from the changelog
    changes = table.read_changelog(spark).filter(
        F.col("_change_type") != "update_preimage"
    ).withColumn(
        "op",
        F.when(F.col("_change_type") == "delete", F.lit("d")).otherwise(F.lit("u")),
    )
    hist = scd2_history(
        changes.select("repo", "path", "op", "lang",
                       F.col("_change_lsn").alias("lsn")),
        ["repo", "path"], "lsn", op_col="op",
    )
    print(f"SCD2 history: {hist.count()} versions, "
          f"{hist.filter('is_current').count()} current")
    # 2b. the MAINTAINED twin: same history, but folded per commit from
    # each batch's retraction rows (zero changelog rescans) — must
    # agree with the batch build interval for interval
    m_hist = scd2.read(spark, table)
    m_iv = {tuple(r) for r in m_hist.select(
        "repo", "path", "valid_from", "valid_to").collect()}
    b_iv = {tuple(r) for r in hist.select(
        "repo", "path", "valid_from", "valid_to").collect()}
    assert m_iv == b_iv, "maintained SCD2 diverged from the batch build"
    print(f"maintained SCD2: {len(m_iv)} versions — interval-identical "
          "to the batch build")

    # 3a. state at an arbitrary position (query-layer time travel):
    # positions are LSNs (0..n), independent of the slice axis
    mid = n // 2
    print(f"as_of(mid-replay): {as_of(hist, mid).count()} versions live")
    # 3b. state at a commit boundary (file-level time travel)
    print(f"read(version=2): {table.read(spark, version=2).count()} keys "
          "after the second commit")

    # 4. continuous rollup (maintained, never recomputed)
    fine = roll.read(spark, "2500 milliseconds").orderBy("bucket_ms")
    print(f"fine rollup: {fine.count()} buckets; first 3:")
    for r in fine.take(3):
        print(f"  bucket {r.bucket_ms}: {r.n_rows} rows")

    # 5. point-in-time enrichment: an event feed asks "what did this
    # (repo, path) look like WHEN the event happened" — asof_join
    # against the history's valid_from axis, no join node in the plan
    # sample the feed ACROSS the whole replay (the history is
    # commit-grain: a position before its key's first committed version
    # correctly matches nothing)
    feed = events.filter(F.col("value").isNotNull()).select(
        F.col("key.repo").alias("repo"), F.col("key.path").alias("path"),
        F.col("value.lsn").alias("at_lsn"),
    ).filter(F.pmod(F.col("at_lsn"), F.lit(40)) == 0)
    enriched = asof_join(
        feed,
        hist.select("repo", "path", F.col("valid_from").alias("lsn"), "lang"),
        on=["repo", "path"], left_time="at_lsn", right_time="lsn",
    )
    hit = enriched.filter(F.col("lang").isNotNull()).count()
    total = enriched.count()
    print(f"asof enrichment: {hit}/{total} feed rows matched a committed "
          "version at their position (early positions predate their "
          "key's first commit)")
    assert hit > 0

    # 6. activity sessionization: stitch each repo's change events into
    # bursts separated by >500 positions of silence — per-event labels
    # (one Window pass), then one summary row per burst
    activity = events.select(
        F.col("key.repo").alias("repo"),
        F.col("timestamp").alias("pos"),
    )
    labelled = sessionize(
        activity, group_cols=["repo"], time_col="pos", gap=500,
    )
    bursts = session_summary(
        labelled, group_cols=["repo"], time_col="pos", gap=500,
    )
    n_bursts = bursts.count()
    top = bursts.orderBy(F.desc("n_events")).first()
    print(f"sessionize: {n_bursts} activity bursts across "
          f"{labelled.select('repo').distinct().count()} repos; "
          f"busiest burst: {top['n_events']} events in repo {top['repo']}")
    assert n_bursts > 0

    # 7. maintained join view: denormalize current state against a
    # repo->team dim, kept consistent by the delta-join decomposition
    # (fact deltas probe the dim via bucket-pruned lookups; dim deltas
    # touch only the referencing fact rows via the multi-point 'in'
    # zone-map read) — never a recompute of the join
    from transforms_for_apache_kafka_connect_spark.streaming import (
        MaintainedJoin,
        batch_changes,
    )

    dim = LakeTable(os.path.join(root, "teams"), key_cols=["repo"],
                    n_buckets=4, discovery=False,
                    merge_strategy="broadcast", changelog=True)
    mj = MaintainedJoin(root=os.path.join(root, "mj"), left=table,
                        right=dim, fk_cols=["repo"], how="inner",
                        n_buckets=8)
    repos = [r["repo"] for r in
             table.read(spark).select("repo").distinct().collect()]
    team = spark.createDataFrame(
        [(r, f"team-{sum(map(ord, r)) % 5}") for r in repos],
        "repo string, team string"
    ).withColumn("_lsn", F.lit(0)).withColumn("__is_delete", F.lit(False))
    dim.merge(team, epoch="demo", batch_id=0)
    mj.apply_right_changes(
        batch_changes(dim, spark, epoch="demo", batch_id=0),
        epoch="demo", batch_id=0,
    )
    # a dim-side correction: one repo changes team; only ITS fact rows
    # are rewritten in the view
    fix = spark.createDataFrame(
        [(repos[0], "team-fixed")], "repo string, team string"
    ).withColumn("_lsn", F.lit(1)).withColumn("__is_delete", F.lit(False))
    dim.merge(fix, epoch="demo", batch_id=1)
    mj.apply_right_changes(
        batch_changes(dim, spark, epoch="demo", batch_id=1),
        epoch="demo", batch_id=1,
    )
    view = mj.read(spark)
    n_view = view.count()
    n_fixed = view.filter(F.col("team") == "team-fixed").count()
    n_repo0 = cur.filter(F.col("repo") == repos[0]).count()
    print(f"maintained join view: {n_view} denormalized rows; "
          f"dim fix rewrote {n_fixed} rows (repo {repos[0]}'s keys)")
    assert n_view == cur.count() and n_fixed == n_repo0

    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
