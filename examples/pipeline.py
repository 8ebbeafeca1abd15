#!/usr/bin/env python
"""End-to-end CDC pipeline example: everything the engine does, in one
runnable script against a synthetic change stream.

    python examples/pipeline.py [workdir]

Stages (each prints a one-line summary):

1.  **Bootstrap** — Debezium-style initial snapshot at LSN S, recorded
    in the manifest; later replay fences events <= S automatically.
2.  **Incremental replay** — SMT chain (ExtractTimestamp + ConcatFields
    from the reference catalog) -> LWW dedupe -> bucketed MERGE ->
    commit ledger, with data-quality expectations (drop + warn) and
    row-level change capture on.
3.  **Maintained aggregate** — a per-lang COUNT/SUM view folded from
    each batch's changelog by the Replayer itself.
4.  **Second hop** — a silver replica built purely from the changelog.
5.  **Serving** — batched point lookups (one bucket-pruned scan), a
    snapshot tag pinned against vacuum, table stats.
6.  **Retention** — delete_where erases one lang; the changelog keeps
    the erased rows' pre-images as the audit trail.

Everything is exactly-once under crash/replay: re-running this script
on the same workdir is a pile of ledger no-ops.
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transforms_for_apache_kafka_connect_spark import Chain
from transforms_for_apache_kafka_connect_spark.sources.changestream import (
    change_stream,
    repositories_snapshot,
)
from transforms_for_apache_kafka_connect_spark.streaming import (
    Expectation,
    LakeTable,
    MaintainedAggregate,
    Replayer,
)
from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
    apply_changes_to_table,
    batch_changes,
)

BASE = 1_600_000_000_000
N, CUT, BATCHES = 6_000, 2_000, 4


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="tkc_pipeline_"
    )
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("tkc-example-pipeline")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    events = change_stream(spark, N, n_repos=20, paths_per_repo=5)

    # 1. bootstrap from a consistent snapshot at LSN CUT-1
    bronze = LakeTable(
        os.path.join(work, "bronze"), n_buckets=16,
        merge_strategy="broadcast", changelog=True,
    )
    silver_agg = LakeTable(
        os.path.join(work, "lang_stats"), key_cols=["lang"], n_buckets=4,
        merge_strategy="broadcast",
    )
    rep = Replayer(
        table=bronze,
        chain=Chain([
            {"type": "extract_timestamp", "field.name": "ts_ms"},
            {"type": "concat_fields", "field.names": ["op", "lsn"],
             "output.field.name": "op_lsn", "delimiter": "@"},
        ]),
        epoch="prod",
        expectations=[
            Expectation("content_present", "content IS NOT NULL", "drop"),
            Expectation("commit_hexish", "length(commit) >= 8", "warn"),
        ],
        maintain=[MaintainedAggregate(
            table=silver_agg, group_cols=["lang"], sum_cols=["_lsn"],
        )],
    )
    snapshot = repositories_snapshot(
        spark, events.filter(F.col("value.lsn") < CUT)
    )
    r = rep.bootstrap(snapshot, snapshot_lsn=CUT - 1)
    print(f"1. bootstrap: {'skipped' if r.get('skipped') else 'seeded'} "
          f"(snapshot_lsn={bronze.extra().get('snapshot_lsn')})")

    # 2. incremental replay of the WHOLE stream (pre-CUT events are
    # fenced by the engine)
    results = rep.replay(events, batch_width=-(-N // BATCHES),
                         start_pos=BASE, max_pos=BASE + N)
    applied = sum(1 for x in results if not x.get("skipped"))
    print(f"2. replay: {applied}/{len(results)} batches applied, "
          f"{bronze.read(spark).count()} live rows")

    # 3. the maintained aggregate kept itself consistent per batch
    top = (silver_agg.read(spark)
           .orderBy(F.desc("n_rows")).limit(3).collect())
    print("3. maintained agg (top langs):",
          [(x["lang"], x["n_rows"]) for x in top])

    # 4. second hop: silver replica from the changelog only
    silver = LakeTable(os.path.join(work, "silver"), n_buckets=8,
                       merge_strategy="append")
    for b in range(-1, len(results)):  # -1 = the bootstrap batch
        if bronze.has_changes("prod", b):
            apply_changes_to_table(
                silver, batch_changes(bronze, spark, epoch="prod",
                                      batch_id=b),
                epoch="prod", batch_id=b,
            )
    print(f"4. second hop: silver replica rows ="
          f" {silver.read(spark).count()} "
          f"(bronze = {bronze.read(spark).count()})")

    # 5. serving: multi-get + tag + stats
    keys = [{"repo": f"repo-{i}", "path": "src/f0.py"} for i in range(5)]
    hits = bronze.lookup_many(spark, keys).count()
    bronze.tag("example-run")
    s = bronze.stats()
    print(f"5. serving: {hits} of {len(keys)} probed keys live; "
          f"tagged v{s['version']}; {s['total_files']} files, "
          f"{s['nonempty_buckets']} buckets")

    # 6. retention: erase one lang, audit trail in the changelog
    gone = bronze.read(spark).filter("lang = 'md'").count()
    bronze.delete_where(spark, "lang = 'md'")
    audit = (bronze.read_changelog(spark, epoch="__maintenance__")
             .filter("_change_type = 'delete'").count())
    print(f"6. retention: erased {gone} 'md' rows; "
          f"audit trail holds {audit} pre-images")

    # 7. CDC relay: publish bronze's changelog as Confluent-framed Avro
    # bytes, then consume them back through the stock boundary into a
    # fresh table — the engine as a CDC source
    from transforms_for_apache_kafka_connect_spark.record import enforce
    from transforms_for_apache_kafka_connect_spark.sources import (
        envelope_from_avro,
    )
    from transforms_for_apache_kafka_connect_spark.streaming import (
        publish_changelog,
        relay_schemas,
    )

    raw = publish_changelog(bronze, spark, format="avro", epoch="prod",
                            confluent_framing=True, use_jvm=False)
    schemas = relay_schemas(bronze, spark, epoch="prod")
    replica = LakeTable(os.path.join(work, "relay_replica"), n_buckets=8)
    consumed = enforce(envelope_from_avro(
        raw, **schemas, confluent_framing=True, use_jvm=False,
    ))
    Replayer(table=replica, chain=Chain([]), epoch="relay",
             unique_lsn=True).apply_batch(consumed, 0)
    print(f"7. relay: published {raw.count()} Avro change events; "
          f"replica rows = {replica.read(spark).count()} "
          f"(bronze pre-retention state)")

    spark.stop()
    print(f"done — table root: {work}")


if __name__ == "__main__":
    main()
