#!/usr/bin/env python
"""Catalyst plan audit: assert the physical plans have the properties a
100 TB deployment needs — filter pushdown into the parquet scan, column
pruning (ReadSchema), broadcast joins where a side is small, no Python
UDF in any SMT path — and write the evidence to BENCH/PLANS.md.

Usage: python BENCH/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _fingerprint(plan: str) -> str:
    """Plan string -> operator-sequence fingerprint (names only, expr
    ids stripped): stable across runs/paths, sensitive to any change in
    the operator dataflow."""
    return "\n".join(
        re.sub(r"#\d+L?", "", m.group(1)).strip()
        for m in re.finditer(r"^[\s:+*-]*([A-Z][A-Za-z]+)", plan, re.M)
    )


def golden_check(check, name: str, filename: str, plan: str) -> None:
    """Diff a plan's operator fingerprint against its pinned golden in
    BENCH/ (pin on first run) — any future regression on the path shows
    as an audit diff, not as an unexplained bench-number swing."""
    path = os.path.join(os.path.dirname(__file__), filename)
    fingerprint = _fingerprint(plan)
    if not os.path.exists(path):
        with open(path, "w") as fh:
            fh.write(fingerprint + "\n")
        check(f"{name} golden: pinned (first run)", True)
        return
    with open(path) as fh:
        pinned = fh.read().strip()
    same = pinned == fingerprint.strip()
    if not same:
        import difflib

        print("\n".join(difflib.unified_diff(
            pinned.splitlines(), fingerprint.splitlines(),
            "golden", "current", lineterm="")))
    check(f"{name} golden: operator sequence unchanged", same)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from bench import build_session

    spark = build_session(8)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    checks = []

    def check(name, cond, detail=""):
        checks.append((name, bool(cond), detail))
        print(f"{'PASS' if cond else 'FAIL'}  {name}  {detail}")

    # 1. chain_fused: SMT chain fuses; filter reaches the scan; pruned columns
    p = fmt(qs["chain_fused"](spark, sf_dir))
    check("chain_fused: filter pushed to parquet scan",
          re.search(r"PushedFilters: \[.*(IsNotNull|EqualTo)\(lang", p))
    check("chain_fused: no Python eval in plan",
          "Python" not in p)
    rs = re.search(r"ReadSchema: struct<([^>]*)>", p)
    read_cols = rs.group(1) if rs else ""
    check("chain_fused: column pruning (no n_chars/embedding read)",
          "n_chars" not in read_cols, f"ReadSchema={read_cols[:90]}")
    check("chain_fused: whole-stage codegen (all SMT stages in one span)",
          "codegen id : 1" in p and "codegen id : 2" not in p.split("(1) Scan")[0])

    # 2. filter exact: predicate pushdown (the exact-match leg of the
    # composite gate entry, timed standalone)
    p = fmt(entrymod.q_filter_exact(spark, sf_dir))
    check("filter_exact: pushed filter on event_type",
          re.search(r"PushedFilters: \[[^\]]*event_type", p), "")

    # 3. join_agg: broadcast join of the small orders side (folded into
    # the relational_core gate composite in r04; audited standalone)
    p = fmt(entrymod.q_join_agg(spark, sf_dir))
    check("join_agg: BroadcastHashJoin", "BroadcastHashJoin" in p)
    check("join_agg: no SortMergeJoin", "SortMergeJoin" not in p)

    # 3b. asof_join: the union-trick plan has NO join node at all and
    # exactly one hash exchange on the key — the property that makes a
    # point-in-time join survive 100 TB
    p = plan_of(qs["asof_join"](spark, sf_dir))
    check("asof_join: no join node (union + window carry-forward)",
          all(b not in p for b in
              ("SortMergeJoin", "CartesianProduct", "BroadcastNestedLoop")))
    check("asof_join: single hash exchange on the key",
          p.count("Exchange hashpartitioning") == 1)

    # 3c. range_join: banded bucketing turns the inequality join into an
    # equi-join — no nested loop anywhere
    # r04f: qs["range_join"] became a composite whose stream leg RUNS a
    # Structured Streaming job — audit the banded plan in isolation
    p = plan_of(entrymod.q_range_join(spark, sf_dir))
    check("range_join: equi-join plan (no nested loop / cartesian)",
          "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p)

    # 3c2. interval join (streamjoin.py), batch shape: the key equality
    # makes it a hash/sort-merge join with the time band as a residual
    # condition — never a nested loop; pure Column expressions
    from pyspark.sql import functions as F

    from transforms_for_apache_kafka_connect_spark.streaming import (
        interval_join,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("timestamp"),
    )
    p = plan_of(interval_join(
        ev, ev.withColumnRenamed("event_id", "rid"),
        keys=["user_id"], lower_ms=0, upper_ms=3_600_000,
    ))
    check("interval join: equi-key join (no nested loop / cartesian)",
          "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p)
    check("interval join: no Python eval in plan", "Python" not in p)

    # 3d. scd2_history: lead/row_number/filter all ride ONE exchange +
    # one sort (Catalyst reuses the window frame)
    p = plan_of(qs["scd2_history"](spark, sf_dir))
    check("scd2_history: single exchange for all window exprs",
          p.count("Exchange hashpartitioning") == 1)

    # 3d2. maintained SCD2: the per-commit closed-version set is a pure
    # filter+projection of the batch changelog — no join, no window, no
    # read of the history or base table (the property that makes type-2
    # maintenance O(batch) at 10^10 events)
    from transforms_for_apache_kafka_connect_spark.streaming.scd2 import (
        SCD2Table as _SCD2T,
    )

    _scd2_chg = spark.createDataFrame(
        [("k1", 1.0, 1, "update_preimage", 5)],
        "k string, v double, _lsn long, _change_type string, _change_lsn long",
    )
    # the REAL code path (SCD2Table.apply_changes merges exactly this
    # frame) — a regression that adds a join/window/aggregate to the
    # closed-set derivation fails here
    p = plan_of(_SCD2T.closed_versions(_scd2_chg))
    check("scd2 maintenance: closed set is filter+project only "
          "(no join/window/agg)",
          all(x not in p for x in ("Join", "Window", "Aggregate", "Python")))

    # 3d3. patch fold: the sparse-update fold is ONE aggregate over the
    # batch (no join, no window, no Python); the overlay join is
    # bounded by touched buckets (audited separately via the changelog
    # capture checks it shares its shape with)
    from transforms_for_apache_kafka_connect_spark.streaming.patch import (
        fold_sparse as _fold_sparse,
    )

    _patch_env = spark.createDataFrame(
        [("t", 0, ("k1",), ("u", 1, 0, None, (1.0, "y")), 1, None)],
        "topic string, partition int, key struct<k:string>, "
        "value struct<op:string, lsn:long, ts_ms:long, "
        "before:struct<x:double,y:string>, after:struct<x:double,y:string>>, "
        "timestamp long, headers map<string,string>",
    )
    p = plan_of(_fold_sparse(_patch_env, ["k"]))
    check("patch fold: single aggregate, no join/window/Python",
          all(x not in p for x in ("Join", "Window", "Python"))
          and p.count("Aggregate") <= 2)

    # 3e. sessionize: per-event labels from ONE hash exchange on the
    # group key, lag + (index, start) in two collapsed Window nodes,
    # no join, no Python
    from pyspark.sql import functions as _SF
    from transforms_for_apache_kafka_connect_spark.functions import (
        sessionize as _sessionize,
    )

    sess_in = spark.read.parquet(os.path.join(sf_dir, "events.parquet")) \
        .select("user_id", "event_id",
                _SF.unix_millis(_SF.col("ts").cast("timestamp")).alias("t"))
    p = plan_of(_sessionize(
        sess_in, group_cols=["user_id"], time_col="t",
        gap="12 hours", order_cols=["event_id"],
    ))
    check("sessionize: single hash exchange on the group key",
          p.count("Exchange hashpartitioning") == 1)
    check("sessionize: two Window nodes (lag | index+start collapsed)",
          p.count("Window ") <= 2 and "Join" not in p)
    check("sessionize: no Python eval", "Python" not in p)

    # 4. ann brute force: corpus never shuffled before scoring
    p = fmt(qs["ann_topk"](spark, sf_dir))
    check("ann_topk: query side broadcast (BroadcastNestedLoopJoin)",
          "BroadcastNestedLoop" in p or "BroadcastExchange" in p)
    # local_topk=True default: the only row exchange is the final rank
    # shuffle over the Arrow-reduced candidate set (<= queries x k rows
    # per scan batch), partitioned by query_id — never by the corpus id
    check("ann_topk: exchange keyed on query_id only (local top-k cut)",
          not re.search(r"Exchange hashpartitioning\(neighbor_id", p))

    # 4b. ivf_topk: the index-build assignment is exchange-free — no
    # per-corpus-vector window (row_number over neighbor_id) and no
    # exchange keyed on the corpus id anywhere; corpus sims come from a
    # 1-row broadcast centroid array + slice(sort_array(...))
    from pyspark.sql import functions as SF
    from transforms_for_apache_kafka_connect_spark.functions.similarity import (
        ivf_topk,
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ivq = emb.limit(5).select(
        (SF.col("vec_id") + 100_000).alias("query_id"), "embedding"
    )
    p = fmt(ivf_topk(emb, ivq, k=5, n_lists=8, n_probe=2, n_assign=2))
    check("ivf_topk: no window over the corpus id (assignment is a "
          "projection)", "windowspecdefinition(neighbor_id" not in p)
    check("ivf_topk: no exchange keyed on the corpus id",
          not re.search(r"Exchange hashpartitioning\(neighbor_id", p))

    # 4c. bm25 ranked retrieval: everything JVM-side, joins all
    # broadcast (df table ≤|Q| rows, N/avgdl one row), final cut a
    # TakeOrdered — never a full sort of the scored corpus
    p = plan_of(entrymod.q_bm25_rank(spark, sf_dir))
    check("bm25: no Python eval, no SortMergeJoin",
          "Python" not in p and "SortMergeJoin" not in p)
    check("bm25: top-k is TakeOrderedAndProject (no full sort)",
          "TakeOrderedAndProject" in p)

    # 4d. paragraph dedup: first-occurrence pick is the skew-immune
    # map-side-combining min(struct) aggregate — no window over the
    # paragraph hash (a 10^9-copy boilerplate paragraph would
    # serialize into one task), no Python, no cartesian
    p = plan_of(entrymod.q_para_dedup(spark, sf_dir))
    check("para dedup: aggregate-based first-occurrence (no Window)",
          "Window" not in p and "partial_min" in p)
    check("para dedup: no Python / no cartesian",
          "Python" not in p and "CartesianProduct" not in p)

    # 4e. repetition metrics: pure per-row expressions — the token
    # mode is a linear fold over the sorted array, never an exploded
    # (doc, token) shuffle
    p = plan_of(entrymod.q_repetition_stats(spark, sf_dir))
    check("repetition stats: zero exchanges, no Python",
          "Exchange" not in p and "Python" not in p)

    # 5. lww_dedupe: partial aggregation before the exchange (map-side
    # combine) — the plain leg of the composite gate entry
    df = entrymod.q_lww_dedupe(spark, sf_dir)
    simple = plan_of(df)
    first_agg = simple.find("HashAggregate")
    first_exch = simple.find("Exchange")
    # max_by is a declarative agg with a struct buffer -> Spark plans
    # SortAggregate (no hash form exists for immutable buffers); the
    # property that matters at scale is the map-side partial_max_by
    # BELOW the exchange (hot keys collapse before shuffling) and the
    # absence of a full Window sort over the payload
    check("lww_dedupe: aggregate-based (no Window sort of payload)",
          "Window" not in simple)
    check("lww_dedupe: map-side partial_max_by below the exchange",
          "partial_max_by" in simple
          and simple.find("partial_max_by") > simple.find("Exchange"))

    # 6. engine updates path: no Python UDF anywhere in the merge input plan
    from transforms_for_apache_kafka_connect_spark import Chain
    from transforms_for_apache_kafka_connect_spark.sources import change_stream
    from transforms_for_apache_kafka_connect_spark.streaming import LakeTable, Replayer
    import tempfile

    ev = change_stream(spark, 10_000, n_repos=50, paths_per_repo=5)
    chain = Chain([
        {"type": "tombstone_handler", "behavior": "drop_silent"},
        {"type": "hash", "field.name": "after.content", "function": "sha256",
         "skip.missing.or.null": True},
    ])
    rep = Replayer(
        table=LakeTable(tempfile.mkdtemp() + "/t"), chain=chain, epoch="audit"
    )
    from transforms_for_apache_kafka_connect_spark.record import ensure_error_col

    upd = rep.updates_for(chain.apply(ensure_error_col(ev)))
    p = plan_of(upd)
    check("replay updates plan: no Python UDF (all Column expressions)",
          "Python" not in p)
    check("replay updates plan: single shuffle for LWW (agg exchanges)",
          p.count("Exchange") <= 3, f"exchanges={p.count('Exchange')}")

    # 6b. merge-plan golden: the changelog-off update plan's operator
    # sequence is pinned in BENCH/merge_plan_golden.txt — any round-over-
    # round change to the headline replay dataflow shows up as a diff
    # here, separating engine plan regressions from VM-noise swings in
    # the bench numbers
    golden_check(check, "merge plan", "merge_plan_golden.txt", p)

    # 7. merge-on-read resolution: aggregate-based LWW with map-side combine
    import tempfile as _tf

    mor = LakeTable(
        _tf.mkdtemp() + "/t", n_buckets=4, discovery=False,
        merge_strategy="append",
    )
    Replayer(table=mor, chain=Chain([]), epoch="audit2").apply_batch(
        change_stream(spark, 5_000, n_repos=20, paths_per_repo=5), 0
    )
    p = plan_of(mor.read(spark))
    check("mor read: aggregate LWW resolution (no Window sort)",
          "max_by" in p and "Window" not in p)
    check("mor read: map-side partial_max_by below the exchange",
          "partial_max_by" in p
          and p.find("partial_max_by") > p.find("Exchange"))
    golden_check(check, "mor read plan", "mor_read_plan_golden.txt", p)

    # 7b. heavy-hitters probe: topk_values must plan a WindowGroupLimit
    # BELOW the exchange (each map task keeps its local top-k before the
    # shuffle) — the property that keeps the probe O(groups x k) when
    # the maintained value table is huge
    from pyspark.sql import types as _T
    from transforms_for_apache_kafka_connect_spark.streaming.rollup import TimeRollup

    _cenv_t = _T.StructType([
        _T.StructField("topic", _T.StringType(), False),
        _T.StructField("partition", _T.IntegerType(), False),
        _T.StructField("key", _T.StructType([_T.StructField("k", _T.StringType())])),
        _T.StructField("value", _T.StructType([
            _T.StructField("op", _T.StringType()),
            _T.StructField("lsn", _T.LongType()),
            _T.StructField("ts_ms", _T.LongType()),
            _T.StructField("before", _T.StructType([
                _T.StructField("cat", _T.StringType()),
                _T.StructField("ts_ms", _T.LongType())])),
            _T.StructField("after", _T.StructType([
                _T.StructField("cat", _T.StringType()),
                _T.StructField("ts_ms", _T.LongType())])),
        ])),
        _T.StructField("timestamp", _T.LongType()),
        _T.StructField("headers", _T.MapType(_T.StringType(), _T.StringType())),
    ])
    _base = 1_700_000_000_000
    _cenv = spark.createDataFrame(
        [("t", 0, (str(i),), ("u", i, _base + i, None,
                              ("abc"[i % 3], _base + i)), i, None)
         for i in range(1, 7)],
        _cenv_t,
    )
    _rroot = _tf.mkdtemp()
    _rt = LakeTable(_rroot + "/t", key_cols=["k"], n_buckets=2,
                    discovery=False, merge_strategy="broadcast",
                    changelog=True)
    _roll = TimeRollup(root=_rroot + "/roll", time_col="ts_ms",
                       granularities=["1 hour"], freq_cols=["cat"],
                       n_buckets=2)
    Replayer(table=_rt, chain=Chain([]), epoch="audit_tk",
             maintain=_roll.specs).replay(
        _cenv, batch_width=10, start_pos=0, max_pos=10)
    p = fmt(_roll.topk_values(spark, "1 hour", "cat", k=3))
    check("rollup topk_values: partial WindowGroupLimit below the exchange",
          re.search(r"row_number\(\), \d+, Partial", p) is not None,
          "map-side top-k cut")
    _n_ex = len(re.findall(r"\(\d+\) Exchange", p))
    check("rollup topk_values: single hash exchange",
          _n_ex == 1 and "hashpartitioning(bucket_ms" in p,
          f"exchanges={_n_ex}")

    # 7c. state-parity checksum: ONE exchange, partial bit_xor/count
    # below it (map-side combine) — the property that lets a 100 TB
    # table reduce to n_buckets checksum rows in a single pass
    from transforms_for_apache_kafka_connect_spark.streaming import (
        table_checksum,
    )

    p = fmt(table_checksum(spark, _rt))
    _n_ex = len(re.findall(r"\(\d+\) Exchange", p))
    check("table_checksum: single exchange",
          _n_ex == 1, f"exchanges={_n_ex}")
    check("table_checksum: map-side partial bit_xor (combine before shuffle)",
          "partial_bit_xor" in p, "partial aggregation in effect")
    check("table_checksum: no Python eval", "Python" not in p)

    # 8. ngram jaccard default path: band-blocked, never an all-pairs product
    p = plan_of(entrymod.q_ngram_jaccard(spark, sf_dir))  # folded into jaccard_dups in r04c
    check("ngram_jaccard default: no CartesianProduct / BNLJ",
          "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p)

    # 9. broadcast merge strategy: survivors stream scan->write with the
    # update keys broadcast — no shuffle exchange on the big (target) side
    bct = LakeTable(
        _tf.mkdtemp() + "/t", n_buckets=4, discovery=False,
        merge_strategy="broadcast",
    )
    ev2 = change_stream(spark, 5_000, n_repos=20, paths_per_repo=5)
    rep2 = Replayer(table=bct, chain=Chain([]), epoch="audit3")
    rep2.apply_batch(ev2, 0)
    upd2 = rep2.updates_for(ensure_error_col(ev2))
    from transforms_for_apache_kafka_connect_spark.streaming.sink import (
        BUCKET_COL,
        _bucket_expr,
    )
    import pyspark.sql.functions as _F

    tgt = bct.read(spark).withColumn(
        BUCKET_COL, _bucket_expr(bct.key_cols, bct.n_buckets)
    )
    survivors = tgt.join(
        _F.broadcast(upd2.select(*bct.key_cols)),
        on=bct.key_cols, how="left_anti",
    )
    p = plan_of(survivors)
    check("broadcast merge: survivors anti-join is BroadcastHashJoin",
          "BroadcastHashJoin" in p and "LeftAnti" in p)
    # shuffles render as "Exchange hashpartitioning(...)" in plan
    # strings. The broadcast BUILD side legitimately contains the
    # update-set dedupe exchange; the property that matters is that the
    # STREAMED target subtree (printed before the BroadcastExchange
    # node) has no exchange — survivors flow scan -> anti-join -> write
    target_side = p.split("BroadcastExchange")[0]
    check("broadcast merge: no exchange on the streamed target side",
          "BroadcastHashJoin" in target_side
          and "Exchange" not in target_side,
          f"exchanges={p.count('Exchange')}")

    # 10. predicate-guarded mutator: one fused plan, no join/cartesian,
    # no Python — the when-merge compiles to pure projections
    # r05: guarded_mask folded into tombstone_chain's mask leg; the
    # standalone function still exists for the audit
    p = fmt(entrymod.q_guarded_mask(spark, sf_dir))
    check("guarded_mask: no join in the guarded-mutator plan",
          "Join" not in p and "CartesianProduct" not in p)
    check("guarded_mask: no Python eval in plan", "Python" not in p)

    # 11. debezium unwrap+route chain: fused, UDF-free
    # r04e: gate key renamed to the cdc_envelopes composite; the audited
    # plan stays the original single-variant unwrap chain
    p = fmt(entrymod.q_debezium_unwrap(spark, sf_dir))
    check("debezium_unwrap: no Python eval in plan", "Python" not in p)
    # (formatted explain prints each operator twice: tree + detail)
    check("debezium_unwrap: single scan, no shuffle",
          p.count("Scan parquet") <= 2 and "Exchange" not in p)

    # 12. zone-map data skipping: the pruned read scans fewer files
    # than the table holds (driver-side manifest pruning, before Spark)
    import tempfile as _tf

    from transforms_for_apache_kafka_connect_spark.streaming import (
        LakeTable as _LT, Replayer as _Rep,
    )
    from transforms_for_apache_kafka_connect_spark import Chain as _Chain

    # MoR delta files each cover one batch's tight LSN range — the
    # clustered layout where zone maps actually pay; a "recent changes"
    # read (_lsn >= high) must skip the cold delta files entirely
    stream = entrymod._events_as_change_stream(spark, sf_dir)
    max_id = stream.agg(_F.max("timestamp")).first()[0] or 0
    skroot = _tf.mkdtemp(prefix="audit_skip_")
    skt = _LT(os.path.join(skroot, "t"), key_cols=["user_id"],
              n_buckets=16, discovery=True, merge_strategy="append")
    _Rep(table=skt, chain=_Chain([]), epoch="audit").replay(
        stream, batch_width=max(1, (max_id + 4) // 4), max_pos=max_id + 1
    )
    skt.read(spark, where=[("_lsn", ">=", max_id - max_id // 10)]).count()
    check("data skipping: recent-changes read prunes cold MoR delta files",
          skt.last_prune["files_read"] < skt.last_prune["files_total"],
          f"{skt.last_prune['files_read']}/{skt.last_prune['files_total']} files")

    # 13. key-clustered compaction: sortWithinPartitions on top of the
    # bucket repartition must add a Sort but NO second exchange (the
    # whole point of sorting within the already-shuffled partitions)
    cdf = skt.read(spark).withColumn(
        BUCKET_COL, _bucket_expr(skt.key_cols, skt.n_buckets)
    )
    unsorted = cdf.repartition(4, _F.col(BUCKET_COL))
    writer_df = unsorted.sortWithinPartitions(
        _F.col(BUCKET_COL), *[_F.col(c) for c in skt.key_cols]
    )
    p0, p = plan_of(unsorted), plan_of(writer_df)
    check("sorted compaction: the key sort adds zero exchanges",
          p.count("Exchange") == p0.count("Exchange")
          and "Sort" in p and ", false, " in p.split("Sort")[1][:120],
          f"exchanges={p0.count('Exchange')}->{p.count('Exchange')}")

    # 13b. z-order layout: the Morton key is a pure Column expression —
    # sorting by it must add zero exchanges and zero Python evals on
    # top of the same bucket repartition
    from transforms_for_apache_kafka_connect_spark.streaming.sink import (
        _zorder_key,
    )

    zw = unsorted.sortWithinPartitions(
        _F.col(BUCKET_COL), _zorder_key(cdf, ["_lsn", "val"], bits=6)
    )
    pz = plan_of(zw)
    check("zorder compaction: morton key adds zero exchanges, no Python",
          pz.count("Exchange") == p0.count("Exchange")
          and "EvalPython" not in pz,
          f"exchanges={p0.count('Exchange')}->{pz.count('Exchange')}")

    # 14. Bloom sidecars: a point lookup on hash-ordered MoR delta
    # files (identical zone-map ranges) reads fewer files than the
    # bucket holds — the prune zone maps cannot provide
    from transforms_for_apache_kafka_connect_spark.sources.changestream import (
        change_stream as _cs,
    )

    blroot = _tf.mkdtemp(prefix="audit_bloom_")
    blt = _LT(os.path.join(blroot, "t"), n_buckets=2,
              merge_strategy="append", collect_blooms=True)
    brep = _Rep(table=blt, chain=_Chain([]), epoch="audit", unique_lsn=True)
    bev = _cs(spark, 6_000, n_repos=12, paths_per_repo=6)
    bmin, bmax = bev.agg(
        _F.min("timestamp"), _F.max("timestamp")
    ).first()
    brep.replay(
        bev, batch_width=max(1, (bmax - bmin + 3) // 3),
        start_pos=bmin, max_pos=bmax + 1,
    )
    # a key absent from the table: zone maps keep every delta file
    # (ranges straddle it), the blooms prove it absent file-by-file
    blt.lookup(spark, {"repo": "repo-absent", "path": "src/absent.py"}).count()
    check("bloom sidecars: point lookup skips key-free delta files",
          blt.last_prune["files_read"] < blt.last_prune["files_total"],
          f"{blt.last_prune['files_read']}/{blt.last_prune['files_total']} files")

    # 17. changelog capture: pre-images come from the target scan joined
    # against the BROADCAST batch key set — cost bounded by batch size,
    # never a shuffle of the (100 TB) target
    chroot = _tf.mkdtemp(prefix="audit_chg_")
    clt = _LT(
        os.path.join(chroot, "chg"), n_buckets=8,
        merge_strategy="broadcast", changelog=True,
    )
    crep = _Rep(table=clt, chain=_Chain([]), epoch="audit")
    cev = _cs(spark, 4_000, n_repos=10, paths_per_repo=4)
    cmin, cmax = cev.agg(_F.min("timestamp"), _F.max("timestamp")).first()
    crep.replay(
        cev, batch_width=max(1, (cmax - cmin + 2) // 2),
        start_pos=cmin, max_pos=cmax + 1,
    )
    cm = clt.manifest()
    cupd = crep.updates_for(cev.filter(_F.col("value").isNotNull()))
    changes_df, cpre = clt._changes_for(
        spark, cm, cupd, touched=None, delete_col="__is_delete"
    )
    p = fmt(changes_df)
    check("changelog capture: pre-image join is BroadcastHashJoin",
          "BroadcastHashJoin" in p)
    check("changelog capture: no SortMergeJoin (target never shuffled)",
          "SortMergeJoin" not in p and "Exchange hashpartitioning" not in
          p.split("BroadcastHashJoin")[0])
    golden_check(check, "changelog capture plan",
                 "changelog_plan_golden.txt", plan_of(changes_df))
    if cpre is not None:
        cpre.unpersist()

    # 17b. routed merge (per-topic fan-out): one chain pass, then each
    # topic's update plan is the SAME shape as the single-table merge —
    # pin the per-topic update fingerprint so a regression in the
    # fan-out path (e.g. re-running the chain per topic) shows as a
    # diff, not a bench swing
    from transforms_for_apache_kafka_connect_spark.streaming import (
        TopicTableRouter as _TTR,
    )

    rroot = _tf.mkdtemp(prefix="audit_routed_")
    router = _TTR(
        root=rroot,
        chain=_Chain([
            {"type": "tombstone_handler", "behavior": "drop_silent"},
            {"type": "extract_topic", "field.name": "shard"},
        ]),
        epoch="audit",
        table_opts={"key_cols": ["repo", "path"], "n_buckets": 4,
                    "discovery": False, "merge_strategy": "broadcast"},
    )
    rev = _cs(spark, 4_000, n_repos=10, paths_per_repo=4)
    shard = _F.concat(
        _F.lit("s"),
        (_F.xxhash64(_F.col("key.repo")) % 2).cast("string"),
    )
    rev = rev.withColumn("value", _F.col("value").withField("shard", shard))
    rmin, rmax = rev.agg(_F.min("timestamp"), _F.max("timestamp")).first()
    rres = router.replay(rev, batch_width=rmax - rmin + 1,
                         start_pos=rmin, max_pos=rmax + 1)
    rtopic = sorted({t for r in rres for t in r["topics"]})[0]
    p = plan_of(router.table_for(rtopic).read(spark))
    golden_check(check, "routed table read plan",
                 "routed_read_plan_golden.txt", p)

    # 17c. windowed aggregation (batch shape = the streaming per-batch
    # plan): partial aggregation below the single exchange, no Python
    from transforms_for_apache_kafka_connect_spark.streaming import (
        windowed_aggregate as _wagg,
    )

    p = plan_of(_wagg(cev, window_duration="1 second",
                      group_cols=["value.op"]))
    check("windowed agg: map-side partial_count below the exchange",
          "partial_count" in p
          and p.find("partial_count") > p.find("Exchange"))
    check("windowed agg: single exchange, no Python",
          p.count("Exchange") <= 1 and "Python" not in p)
    p = plan_of(_wagg(cev, session_gap="1 second",
                      group_cols=["value.op"]))
    check("session windows: no Python eval in plan", "Python" not in p)

    # 18. incremental view maintenance: one aggregate over the (batch-
    # sized) changelog + a join whose left side is the agg table
    # (cardinality = #groups), never the base table
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        batch_changes as _bc,
        incremental_agg_update as _iau,
    )

    agg_t = _LT(
        os.path.join(chroot, "agg"), key_cols=["lang"], n_buckets=4,
        merge_strategy="broadcast",
    )
    _iau(agg_t, _bc(clt, spark, epoch="audit", batch_id=0),
         group_cols=["lang"], sum_cols=["_lsn"], epoch="audit", batch_id=0)
    chg1 = _bc(clt, spark, epoch="audit", batch_id=1)
    p = fmt(chg1)
    check("incremental agg: batch changelog read is path-scoped to its dir",
          "batch_id=1" in p and "batch_id=0" not in p)

    # 19. expectations are free on the data path: the gated update plan
    # has the SAME exchange count as the ungated one (predicates fold
    # into the projection; counts ride a CollectMetrics node) and no
    # Python eval
    from transforms_for_apache_kafka_connect_spark.streaming.expectations import (
        Expectation as _Exp,
        apply_expectations as _apply_exp,
    )

    plain_upd = crep.updates_for(cev.filter(_F.col("value").isNotNull()))
    gated_upd, _obs = _apply_exp(plain_upd, [
        _Exp("content_present", "content IS NOT NULL", "fail"),
        _Exp("commit_len", "length(commit) >= 8", "drop"),
    ])
    p0, p = plan_of(plain_upd), plan_of(gated_upd)
    check("expectations: zero extra exchanges on the update plan",
          p.count("Exchange") == p0.count("Exchange"),
          f"exchanges={p0.count('Exchange')}->{p.count('Exchange')}")
    check("expectations: no Python eval (pure Column predicates)",
          "Python" not in p)

    # 20. maintained join view: both delta paths must be
    # broadcast-shaped (the batch-bounded side broadcasts; neither base
    # table shuffles) and the dim-delta scan must prune files via the
    # multi-point 'in' zone maps on a fk-clustered fact table
    from transforms_for_apache_kafka_connect_spark.streaming.joinview import (
        MaintainedJoin as _MJ,
    )
    from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
        batch_changes as _bc2,
    )

    jvroot = _tf.mkdtemp(prefix="audit_jv_")
    jleft = _LT(os.path.join(jvroot, "facts"), key_cols=["order_id"],
                n_buckets=4, discovery=False, merge_strategy="broadcast",
                changelog=True, target_rows_per_file=200)
    jright = _LT(os.path.join(jvroot, "dims"), key_cols=["cust_id"],
                 n_buckets=4, discovery=False, merge_strategy="broadcast",
                 changelog=True)
    jmj = _MJ(root=os.path.join(jvroot, "mj"), left=jleft, right=jright,
              fk_cols=["cust_id"], how="inner", n_buckets=4)
    jright.merge(
        spark.range(40).select(
            _F.col("id").alias("cust_id"),
            _F.concat(_F.lit("n"), _F.col("id")).alias("name"),
            _F.col("id").alias("_lsn"),
            _F.lit(False).alias("__is_delete"),
        ), epoch="audit", batch_id=0)
    jleft.merge(
        spark.range(4000).select(
            _F.col("id").alias("order_id"),
            (_F.col("id") % 40).alias("cust_id"),
            (_F.col("id") * 1.5).alias("amount"),
            _F.col("id").alias("_lsn"),
            _F.lit(False).alias("__is_delete"),
        ), epoch="audit", batch_id=0)
    jl0 = _bc2(jleft, spark, epoch="audit", batch_id=0)
    p = plan_of(jmj._left_delta_updates(jl0))
    check("join view fact-delta: dim probe is broadcast, no shuffle",
          "BroadcastHashJoin" in p and "SortMergeJoin" not in p
          and "Exchange hashpartitioning" not in p)
    check("join view fact-delta: no Python eval", "Python" not in p)
    jmj.apply_changes(jl0, epoch="audit", batch_id=0)
    # cluster the fact table by fk so the 'in' zone maps have ranges
    jleft.compact(spark, all_buckets=True, sort_cols=["cust_id"])
    jright.merge(
        spark.range(2).select(
            (_F.col("id") + 7).alias("cust_id"),
            _F.lit("upd").alias("name"),
            (_F.col("id") + 100).alias("_lsn"),
            _F.lit(False).alias("__is_delete"),
        ), epoch="audit", batch_id=1)
    jr1 = _bc2(jright, spark, epoch="audit", batch_id=1)
    rdelta = jmj._right_delta_updates(jr1, None)
    p = plan_of(rdelta)
    check("join view dim-delta: changed-dim side broadcast, no shuffle "
          "of the fact scan",
          "BroadcastHashJoin" in p and "SortMergeJoin" not in p
          and "Exchange hashpartitioning" not in p)
    rdelta.count()  # materialize so last_prune reflects the scan
    check("join view dim-delta: 'in' zone maps prune the fk-clustered "
          "fact scan",
          jleft.last_prune["files_read"] < jleft.last_prune["files_total"],
          f"{jleft.last_prune['files_read']}/"
          f"{jleft.last_prune['files_total']} files")

    # 21. star view: the N-dim rebuild must be N broadcast joins with
    # zero hash exchanges (each dim probe is batch-bounded)
    from transforms_for_apache_kafka_connect_spark.streaming.starview import (
        DimSpec as _DS,
        MaintainedStar as _MS,
    )

    svroot = _tf.mkdtemp(prefix="audit_sv_")
    svd0 = _LT(os.path.join(svroot, "d0"), key_cols=["k0"], n_buckets=2,
               discovery=False, merge_strategy="broadcast", changelog=True)
    svd1 = _LT(os.path.join(svroot, "d1"), key_cols=["k1"], n_buckets=2,
               discovery=False, merge_strategy="broadcast", changelog=True)
    svf = _LT(os.path.join(svroot, "f"), key_cols=["oid"], n_buckets=2,
              discovery=False, merge_strategy="broadcast", changelog=True)
    svd0.merge(spark.range(20).select(
        _F.col("id").alias("k0"), _F.lit("a").alias("va"),
        _F.col("id").alias("_lsn"), _F.lit(False).alias("__is_delete")),
        epoch="audit", batch_id=0)
    svd1.merge(spark.range(20).select(
        _F.col("id").alias("k1"), _F.lit("b").alias("vb"),
        _F.col("id").alias("_lsn"), _F.lit(False).alias("__is_delete")),
        epoch="audit", batch_id=0)
    svf.merge(spark.range(500).select(
        _F.col("id").alias("oid"), (_F.col("id") % 20).alias("f0"),
        (_F.col("id") % 17).alias("f1"), _F.col("id").alias("_lsn"),
        _F.lit(False).alias("__is_delete")), epoch="audit", batch_id=0)
    star = _MS(root=os.path.join(svroot, "s"), left=svf,
               dims=[_DS(table=svd0, fk_cols=["f0"]),
                     _DS(table=svd1, fk_cols=["f1"])], n_buckets=2)
    sfl = _bc2(svf, spark, epoch="audit", batch_id=0)
    drop = [c for c in ("_change_type", "_change_lsn", "epoch", "batch_id")
            if c in sfl.columns]
    posts = sfl.filter(
        _F.col("_change_type").isin("insert", "update_postimage")
    ).drop(*drop)
    p = plan_of(star._build_rows(posts))
    # each dim contributes a broadcast probe join in both union
    # branches (plus lookup_many's broadcast semi-joins); what matters
    # is that EVERY join is broadcast-shaped and nothing shuffles
    check("star view rebuild: broadcast joins only, no shuffle",
          p.count("BroadcastHashJoin") >= 2 and "SortMergeJoin" not in p
          and "Exchange hashpartitioning" not in p)
    check("star view rebuild: no Python eval", "Python" not in p)

    # r05 gate entries
    p = plan_of(qs["pack_sequences"](spark, sf_dir))
    check("pack_sequences: exactly the one declared Arrow stage",
          p.count("FlatMapGroupsInPandas") == 1)
    check("pack_sequences: single shuffle (shard exchange only)",
          p.count("Exchange hashpartitioning") == 1,
          f"exchanges={p.count('Exchange hashpartitioning')}")
    p = plan_of(qs["cdc_serializers"](spark, sf_dir))
    check("cdc_serializers: serialize+decode stays JVM-side",
          "Python" not in p and "FlatMap" not in p)
    p = plan_of(qs["stock2"](spark, sf_dir))
    check("stock2: no Python eval", "Python" not in p)
    p = plan_of(qs["routing_ops"](spark, sf_dir))
    check("routing_ops: no Python eval", "Python" not in p)

    n_fail = sum(1 for _, ok, _ in checks if not ok)
    lines = [
        "# BENCH/PLANS.md — Catalyst plan audit",
        "",
        "`python BENCH/plan_audit.py` asserts the physical-plan properties a 100 TB",
        "deployment depends on. Latest run:",
        "",
        "| property | result |",
        "|---|---|",
    ]
    for name, ok, detail in checks:
        lines.append(f"| {name} | {'PASS' if ok else 'FAIL'} {detail} |")
    lines += [
        "",
        f"{len(checks) - n_fail}/{len(checks)} checks pass.",
    ]
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\n{len(checks) - n_fail}/{len(checks)} pass -> BENCH/PLANS.md")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
