"""Runnable demo: several pipelines feeding ONE lake table safely.

Multi-writer optimistic concurrency (streaming/sink.py OCC protocol):

- two Replayers (two CDC sources, two epochs) ingest into the same
  table from concurrent threads — conflicts rebase or re-run
  automatically, nothing is lost, the (epoch, batch_id) ledger stays
  exactly-once;
- a maintenance thread compacts WHILE they write (a conflicted round
  skips, a clean one lands);
- a LakeCatalog keeps a SQL view tracking both writers via on_commit;
- table_checksum proves the final state equals a serial replay of the
  same batches — the OCC interleaving is invisible in the data.

Run: python examples/multi_writer.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import threading
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.errors import (
    CommitConflictException,
)
from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
from transforms_for_apache_kafka_connect_spark.sources import change_stream
from transforms_for_apache_kafka_connect_spark.streaming import (
    LakeCatalog,
    LakeTable,
    Replayer,
    table_checksum,
    verify_state,
)

N_PER_WRITER = 30_000
BATCHES = 3


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("tkc-multi-writer")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="tkc_multi_writer_")
    print(f"workdir: {work}")

    # two "sources": disjoint repo namespaces (two upstream databases),
    # same destination table — the consolidation topology Kafka Connect
    # runs with several source connectors feeding one sink
    streams = {
        "dbA": change_stream(spark, N_PER_WRITER, n_repos=60,
                             paths_per_repo=8, seed=1).withColumn(
            "key", F.col("key").withField(
                "repo", F.concat(F.lit("a/"), F.col("key.repo")))
        ),
        "dbB": change_stream(spark, N_PER_WRITER, n_repos=60,
                             paths_per_repo=8, seed=2).withColumn(
            "key", F.col("key").withField(
                "repo", F.concat(F.lit("b/"), F.col("key.repo")))
        ),
    }
    for name, df in streams.items():
        streams[name] = df.withColumn(
            "value",
            F.when(
                F.col("value").isNotNull(),
                F.col("value").withField(
                    "after",
                    F.when(
                        F.col("value.after").isNotNull(),
                        F.col("value.after").withField(
                            "repo", F.col("key.repo")),
                    ).otherwise(F.col("value.after")),
                ),
            ).otherwise(F.col("value")),
        ).cache()

    chain = Chain([
        {"type": "tombstone_handler", "behavior": "drop_silent"},
        {"type": "hash", "field.name": "after.content",
         "function": "sha256", "skip.missing.or.null": True},
    ])

    # ---------------------------------------------------- concurrent run
    root = os.path.join(work, "repos")
    catalog = LakeCatalog(spark)
    catalog.register("repos", LakeTable(root, n_buckets=16))

    barrier = threading.Barrier(3)

    def writer(name: str) -> None:
        table = LakeTable(root, n_buckets=16)
        rep = Replayer(table=table, chain=chain, epoch=name,
                       unique_lsn=True, on_commit=[catalog])
        barrier.wait()
        rep.replay(streams[name], batch_width=N_PER_WRITER // BATCHES,
                   max_pos=N_PER_WRITER, slice_col="value.lsn")
        print(f"  writer {name}: {BATCHES} batches committed")

    def maintainer() -> dict:
        table = LakeTable(root, n_buckets=16)
        barrier.wait()
        landed = skipped = 0
        for _ in range(4):
            try:
                table.compact(spark, max_files_per_bucket=4)
                landed += 1
            except CommitConflictException:
                skipped += 1  # writers were in those buckets; next round
        return {"landed": landed, "skipped": skipped}

    with ThreadPoolExecutor(max_workers=3) as ex:
        fa = ex.submit(writer, "dbA")
        fb = ex.submit(writer, "dbB")
        fm = ex.submit(maintainer)
        fa.result(timeout=1200)
        fb.result(timeout=1200)
        compactions = fm.result(timeout=1200)
    print(f"  concurrent compactions: {compactions}")

    table = LakeTable(root, n_buckets=16)
    m = table.manifest()
    for name in streams:
        for bid in range(BATCHES):
            assert [name, bid] in m["committed"], (name, bid)
    print(f"  head version {m['version']}, "
          f"{len(m['committed'])} ledger entries, all exactly-once")

    # SQL view tracked both writers without a manual refresh
    per_ns = {
        r["ns"]: r["n"]
        for r in spark.sql(
            "SELECT substring(repo, 1, 1) AS ns, count(*) AS n "
            "FROM repos GROUP BY ns"
        ).collect()
    }
    print(f"  SQL view sees both namespaces: {per_ns}")
    assert set(per_ns) == {"a", "b"}

    # ------------------------------------------------- serial re-derivation
    serial_root = os.path.join(work, "repos_serial")
    serial = LakeTable(serial_root, n_buckets=16)
    for name in streams:
        Replayer(table=serial, chain=chain, epoch=name,
                 unique_lsn=True).replay(
            streams[name], batch_width=N_PER_WRITER // BATCHES,
            max_pos=N_PER_WRITER, slice_col="value.lsn")

    report = verify_state(spark, table, serial.read(spark))
    assert report["match"], report
    a = table_checksum(spark, table)
    b = table_checksum(spark, serial)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    print("  state parity vs serial replay: MATCH (bucket checksums equal)")

    print("multi-writer demo complete.")
    spark.stop()


if __name__ == "__main__":
    main()
