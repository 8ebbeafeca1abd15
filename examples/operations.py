"""Runnable demo: the day-2 operations suite over one CDC pipeline.

- IncrementalSnapshot: bootstrap a LIVE table chunk by chunk (DBLog
  shape) while change batches keep landing — no stream pause, stale
  chunks refused.
- Replayer(track_gaps=...): a dropped offset aborts the batch
  pre-commit; the healed redelivery lands cleanly.
- table_checksum / table_diff: prove the final state equals an
  independently built replica — or list exactly how it doesn't
  (pt-table-checksum shape: bucket digests first, row digests only
  for disagreeing buckets).
- TimeRollup freq_cols: exact per-hour top event types, maintained
  from the changelog.

Run: python examples/operations.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
from transforms_for_apache_kafka_connect_spark.streaming import (
    IncrementalSnapshot,
    LakeTable,
    Replayer,
    SequenceTracker,
    hash_chunk,
    table_checksum,
    table_diff,
)

_VAL = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("cat", T.StringType()),
    T.StructField("v", T.StringType()),
])
_ENV = T.StructType([
    T.StructField("topic", T.StringType(), False),
    T.StructField("partition", T.IntegerType(), False),
    T.StructField("key", T.StructType([T.StructField("k", T.LongType())])),
    T.StructField("value", T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("before", _VAL),
        T.StructField("after", _VAL),
    ])),
    T.StructField("timestamp", T.LongType()),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
])


def _env(spark, events):
    rows = []
    for lsn, k, op, cat, v in events:
        after = None if op == "d" else (k, cat, v)
        rows.append(("orders", 0, (k,), (op, lsn, 0, None, after), lsn, None))
    return spark.createDataFrame(rows, _ENV)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="tkc_ops_")

    # -------- a live table with continuity tracking
    table = LakeTable(os.path.join(root, "orders"), key_cols=["k"],
                      n_buckets=4, merge_strategy="broadcast",
                      changelog=True, discovery=False)
    tracker = SequenceTracker(table=LakeTable(
        os.path.join(root, "orders", "_seq_state"),
        key_cols=["topic", "partition"], n_buckets=1, discovery=False,
        merge_strategy="broadcast"))
    rep = Replayer(table=table, chain=Chain([]), epoch="live",
                   track_gaps=tracker, gaps_policy="error")

    live = [(i, i % 40, "u", "web" if i % 3 else "app", f"v{i}")
            for i in range(1, 41)]
    rep.apply_batch(_env(spark, live), 0)
    print("live batch applied; watermark =",
          tracker.table.read(spark).first()["last_seq"])

    # -------- a dropped offset is caught BEFORE it can corrupt state
    from transforms_for_apache_kafka_connect_spark.errors import DataException

    holey = [(lsn, lsn % 40, "u", "web", f"h{lsn}")
             for lsn in (41, 42, 44, 45)]          # 43 lost in transit
    try:
        rep.apply_batch(_env(spark, holey), 1)
    except DataException as exc:
        print("gap caught pre-commit:", str(exc)[:72], "...")
    healed = [(lsn, lsn % 40, "u", "web", f"h{lsn}")
              for lsn in (41, 42, 43, 44, 45)]
    rep.apply_batch(_env(spark, healed), 1)
    print("healed redelivery committed; watermark =",
          tracker.table.read(spark).first()["last_seq"])

    # -------- incremental snapshot: late-arriving source rows land
    # chunk by chunk while the stream stays live (keys 100..139 were
    # never streamed — think "pre-existing source rows")
    source = spark.createDataFrame(
        [(100 + i, "legacy", f"s{i}") for i in range(40)],
        "k long, cat string, v string",
    )
    snap = IncrementalSnapshot(replayer=rep)
    for chunk_id in range(4):
        snap.apply_chunk(
            hash_chunk(source, ["k"], 4, chunk_id),
            chunk_id=chunk_id, low_lsn=45,
        )
    print("chunks committed:", snap.progress(),
          "| table rows:", table.read(spark).count())

    # -------- state parity vs an independently built replica
    replica = LakeTable(os.path.join(root, "replica"), key_cols=["k"],
                        n_buckets=4, merge_strategy="broadcast",
                        discovery=False)
    rep2 = Replayer(table=replica, chain=Chain([]), epoch="replica")
    rep2.apply_batch(_env(spark, live), 0)
    rep2.apply_batch(_env(spark, healed), 1)
    # the replica gets the source rows as one plain snapshot batch
    from transforms_for_apache_kafka_connect_spark.sources.changestream import (
        snapshot_envelope,
    )

    rep2.apply_batch(snapshot_envelope(source, ["k"], lsn=45), 2)
    n_sums = table_checksum(spark, table).count()
    diff = table_diff(spark, table, replica.read(spark))
    print(f"checksum rows: {n_sums} (one per bucket); diff rows:",
          diff.count(), "(0 = states provably equal)")

    # tamper with the replica, catch it, repair it
    from transforms_for_apache_kafka_connect_spark.streaming import repair_state

    replica.delete_where(spark, "k = 7")
    diff2 = table_diff(spark, table, replica.read(spark))
    print("after tampering: diff =",
          [(r["side"], r["k"]) for r in diff2.collect()])
    r = repair_state(spark, replica, table.read(spark), epoch="heal")
    print("repair:", {k: r[k] for k in ("repaired", "deleted") if k in r},
          "| post-repair diff =",
          table_diff(spark, replica, table.read(spark)).count())

    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
