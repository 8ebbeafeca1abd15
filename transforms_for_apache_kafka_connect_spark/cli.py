"""spark-submit entrypoint for the CDC replay engine.

north_rule: "run via spark-submit --py-files on a multi-executor
cluster". Usage (cluster):

    spark-submit --py-files tkc_spark.zip -m ... \
        -c 'python -m transforms_for_apache_kafka_connect_spark' -- \
        --events s3://.../changelog --table s3://.../repositories \
        --chain chain.json --batches 64

or locally:

    python -m transforms_for_apache_kafka_connect_spark \
        --events /data/events --table /data/table --chain chain.json

The chain spec file is the same list-of-dicts the ``Chain`` compiler
takes (one entry per SMT, reference-identical config keys). Prints one
JSON summary line per batch and a final summary to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="transforms_for_apache_kafka_connect_spark",
        description="PySpark CDC replay: chain -> LWW dedupe -> MERGE -> ledger",
    )
    ap.add_argument("--events", default=None,
                    help="parquet dir of envelope change events "
                         "(required unless --maintenance)")
    ap.add_argument("--table", required=True, help="lake table root dir")
    ap.add_argument("--chain", default=None,
                    help="chain spec: JSON list of SMT config dicts, or a Kafka "
                         "Connect .properties file (transforms=a,b + "
                         "per-alias config; default: empty chain)")
    ap.add_argument("--key-cols", default="repo,path")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--epoch", default=None,
                    help="replay epoch name (default: 'default'); for "
                         "--maintenance relay, unset means ALL epochs")
    ap.add_argument("--slice-col", default="timestamp",
                    help="monotone batching column (e.g. timestamp or __slice)")
    ap.add_argument("--start-pos", type=int, default=None)
    ap.add_argument("--max-pos", type=int, default=None)
    ap.add_argument("--merge-strategy",
                    choices=["shuffle", "broadcast", "append"],
                    default="shuffle",
                    help="append = merge-on-read (delta files + LWW reads)")
    ap.add_argument("--merge-semantics", choices=["lww", "patch"],
                    default="lww",
                    help="patch = partial-column updates (NULL means "
                         "'not provided': per column the last provided "
                         "value wins, deletes clear, unmentioned columns "
                         "survive — streaming/patch.py). Incompatible "
                         "with --routed/--bootstrap/--expectations/"
                         "--error-mode dlq")
    ap.add_argument("--no-discovery", action="store_true",
                    help="dense updates: skip touched-bucket discovery")
    ap.add_argument("--target-rows-per-file", type=int, default=2_000_000)
    ap.add_argument("--compact-every", type=int, default=0,
                    help="run bucket compaction every K committed batches")
    ap.add_argument("--error-mode", choices=["fail", "dlq"], default=None,
                    help="fail = first errored record aborts the batch "
                         "(reference DataException model, the default); "
                         "dlq = quarantine errored records to --dlq-dir and "
                         "merge the rest. Unset, a .properties --chain may "
                         "supply it via errors.tolerance/deadletterqueue")
    ap.add_argument("--dlq-key-type", default=None,
                    help="with --maintenance retry-dlq: DDL field list for "
                         "the envelope key (e.g. 'repo string, path string')")
    ap.add_argument("--dlq-value-type", default=None,
                    help="with --maintenance retry-dlq: DDL field list for "
                         "the envelope value (op/lsn/ts_ms/before/after)")
    ap.add_argument("--dlq-dir", default=None,
                    help="dead-letter directory (required with "
                         "--error-mode dlq)")
    ap.add_argument("--streaming", action="store_true",
                    help="tail --events as a file-source stream (foreachBatch)")
    ap.add_argument("--checkpoint", default=None,
                    help="Structured Streaming checkpoint dir (with --streaming)")
    ap.add_argument("--suppress-stale-ms", type=int, default=None,
                    help="streaming: drop redelivered/stale LSNs via managed "
                         "state (0 = no state timeout, for availableNow "
                         "backfills)")
    ap.add_argument("--raw-json", action="store_true",
                    help="streaming: events are raw JSON bytes/strings; "
                         "requires --value-schema")
    ap.add_argument("--raw-avro", action="store_true",
                    help="streaming: events are raw Avro binary; requires "
                         "--value-schema (Avro JSON, inline or a .avsc "
                         "file path)")
    ap.add_argument("--cdc-envelope", choices=["maxwell", "canal", "dms"],
                    default=None,
                    help="treat the value column as a third-party CDC "
                         "wire envelope (Maxwell / Canal FlatMessage / "
                         "AWS DMS JSON) and normalize it to the change "
                         "envelope: --value-schema types the row "
                         "payload, --key-cols names its primary key "
                         "(streaming mode)")
    ap.add_argument("--confluent-framing", action="store_true",
                    help="with --raw-avro: strip + validate the Confluent "
                         "5-byte wire frame (magic + schema id)")
    ap.add_argument("--key-schema", default=None,
                    help="key schema: DDL with --raw-json, Avro JSON or "
                         ".avsc path with --raw-avro")
    ap.add_argument("--value-schema", default=None,
                    help="value schema: DDL with --raw-json, Avro JSON or "
                         ".avsc path with --raw-avro")
    ap.add_argument("--master", default=None,
                    help="override master for local runs (spark-submit sets its own)")
    ap.add_argument("--maintenance",
                    choices=["compact", "vacuum", "rescale", "lookup",
                             "publish", "stats", "delete-where",
                             "tag", "drop-tag", "relay", "retry-dlq",
                             "checksum", "diff", "repair", "query"],
                    default=None,
                    help="run a table op instead of a replay "
                         "(--events is ignored)")
    ap.add_argument("--sql", default=None,
                    help="with --maintenance query: SQL over the lake — "
                         "the table registers as view `t` (or, with "
                         "--routed, every table under the root as its "
                         "sanitized topic name); rows print as JSON "
                         "lines")
    ap.add_argument("--sql-limit", type=int, default=1000,
                    help="with --maintenance query: cap printed rows "
                         "(0 = no cap)")
    ap.add_argument("--catalog-store", default=None,
                    help="with --maintenance query: persistent catalog "
                         "spec (JSON path) — views registered there by "
                         "earlier sessions restore before the query, "
                         "and this session's registrations persist")
    ap.add_argument("--routed", action="store_true",
                    help="treat --table as a ROUTER ROOT: the chain's "
                         "final topic picks the destination table "
                         "(root/<topic>, one ledger each) instead of "
                         "merging everything into one table")
    ap.add_argument("--expectations", default=None,
                    help="JSON file: list of data-quality expectations "
                         '[{"name": ..., "expr": "<SQL boolean over the '
                         'update row>", "action": "fail|drop|warn"}]')
    ap.add_argument("--schema-mode", choices=["evolve", "strict"],
                    default="evolve",
                    help="strict = a batch whose rows carry columns the "
                         "table lacks fails pre-write (Delta schema "
                         "enforcement); evolve = additive evolution "
                         "(default)")
    ap.add_argument("--changelog", action="store_true",
                    help="capture row-level changes (pre/post images) "
                         "per batch under <table>/_changes (Delta CDF "
                         "analog; feeds incremental view maintenance)")
    ap.add_argument("--collect-blooms", action="store_true",
                    help="build per-file key Bloom sidecars at each "
                         "commit (speeds --maintenance lookup on "
                         "un-compacted tables)")
    ap.add_argument("--compact-sort-cols", default=None,
                    help="with --maintenance compact: comma-separated "
                         "columns to cluster files by instead of the key "
                         "(zone maps then prune on predicates over them)")
    ap.add_argument("--compact-no-sort", action="store_true",
                    help="with --maintenance compact: skip the key "
                         "clustering sort while rewriting buckets")
    ap.add_argument("--compact-layout", default="linear",
                    choices=["linear", "zorder"],
                    help="with --maintenance compact: in-bucket file "
                         "layout — 'zorder' Morton-interleaves >= 2 "
                         "--compact-sort-cols so zone maps prune on "
                         "every clustered dimension (Delta OPTIMIZE "
                         "ZORDER analog)")
    ap.add_argument("--compact-all-buckets", action="store_true",
                    help="with --maintenance compact: rewrite every bucket "
                         "(graduates a merge-on-read table to plain reads)")
    ap.add_argument("--vacuum-keep-versions", type=int, default=2)
    ap.add_argument("--vacuum-orphan-grace", type=float, default=3600.0,
                    help="seconds: keep unreferenced data files younger "
                         "than this (protects concurrent in-flight "
                         "writers under multi-writer OCC; 0 = strict "
                         "quiesced-table vacuum)")
    ap.add_argument("--vacuum-changelog-keep-batches", type=int, default=None,
                    help="with --maintenance vacuum: also expire committed "
                         "changelog entries beyond the last N batches per "
                         "epoch (default: keep all)")
    ap.add_argument("--rescale-buckets", type=int, default=None,
                    help="target bucket count (with --maintenance rescale)")
    ap.add_argument("--relay-out", default=None,
                    help="with --maintenance relay: output parquet dir for "
                         "the published converter-bytes stream")
    ap.add_argument("--relay-format",
                    choices=["json", "avro", "maxwell", "canal", "dms"],
                    default="json",
                    help="with --maintenance relay: converter serialization "
                         "(avro implies Confluent framing)")
    ap.add_argument("--key", default=None,
                    help="with --maintenance lookup: JSON object binding "
                         'every key column, e.g. \'{"repo": "r1", '
                         '"path": "a.py"}\'')
    ap.add_argument("--keys", default=None,
                    help="with --maintenance lookup: JSON ARRAY of key "
                         "objects — resolved in ONE bucket-pruned scan "
                         "(multi-get) instead of N reads")
    ap.add_argument("--predicate", default=None,
                    help="with --maintenance delete-where: SQL boolean "
                         "over table rows; matching rows are deleted via "
                         "a ledgered merge (changelog tables keep the "
                         "erased rows' pre-images as the audit trail)")
    ap.add_argument("--tag-name", default=None,
                    help="with --maintenance tag/drop-tag: snapshot tag "
                         "name (tagged versions survive vacuum)")
    ap.add_argument("--tag-version", type=int, default=None,
                    help="with --maintenance tag: version to pin "
                         "(default: current)")
    ap.add_argument("--expected", default=None,
                    help="with --maintenance diff: parquet dir or lake "
                         "table root holding the expected state")
    ap.add_argument("--diff-cols", default=None,
                    help="with --maintenance checksum/diff: comma-"
                         "separated columns to digest (default: every "
                         "key+payload column)")
    ap.add_argument("--diff-limit", type=int, default=1000,
                    help="with --maintenance diff: max difference rows "
                         "printed")
    ap.add_argument("--track-gaps", choices=["dense", "monotonic"],
                    default=None,
                    help="continuity-check every batch's value.lsn per "
                         "(topic, partition) against a tracked watermark "
                         "(state table at <table>/_seq_state); dense = "
                         "offsets must be contiguous, monotonic = only "
                         "duplicates/rewinds flagged")
    ap.add_argument("--gaps-seq", default="timestamp",
                    help="with --track-gaps: envelope expression giving "
                         "each record's sequence number (default "
                         "'timestamp' — the offset slot, which every "
                         "record including tombstones carries; "
                         "'value.lsn' checks source LSNs instead but "
                         "skips tombstone records)")
    ap.add_argument("--gaps-by", default="topic,partition",
                    help="with --track-gaps: comma-separated envelope "
                         "columns defining a sequence domain (default "
                         "topic,partition for Kafka offsets; use "
                         "'topic' for a binlog whose LSNs are dense "
                         "per topic, not per partition)")
    ap.add_argument("--gaps-policy", choices=["error", "warn"],
                    default="error",
                    help="with --track-gaps: abort the batch pre-commit "
                         "on anomalies, or log and proceed")
    ap.add_argument("--gaps-report-dir", default=None,
                    help="with --track-gaps: append per-batch anomaly "
                         "rows under this parquet root")
    ap.add_argument("--staged-token", default=None,
                    help="with --maintenance publish: the staged commit "
                         "token returned by merge(publish=False)")
    ap.add_argument("--bootstrap", default=None,
                    help="parquet dir of a TABLE-SHAPED consistent source "
                         "snapshot (key cols + payload); seeds an empty "
                         "table before replay (Debezium initial snapshot). "
                         "Requires --snapshot-lsn; later batches drop "
                         "events at or below that LSN")
    ap.add_argument("--snapshot-lsn", type=int, default=None,
                    help="source position the --bootstrap snapshot is "
                         "consistent with")
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from transforms_for_apache_kafka_connect_spark import Chain
    from transforms_for_apache_kafka_connect_spark.streaming import (
        LakeTable,
        Replayer,
    )

    builder = SparkSession.builder.appName("tkc-spark-cdc-replay")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()

    if args.chain and args.chain.endswith(".properties"):
        # Kafka Connect connector-properties declaration (the
        # reference's native format): transforms=a,b + per-alias config
        from transforms_for_apache_kafka_connect_spark.plans.properties import (
            chain_from_properties,
        )

        chain = chain_from_properties(args.chain)
    else:
        spec = []
        if args.chain:
            with open(args.chain) as f:
                spec = json.load(f)
        chain = Chain(spec)

    table_opts = dict(
        key_cols=args.key_cols.split(","),
        n_buckets=args.buckets,
        target_rows_per_file=args.target_rows_per_file,
        discovery=not args.no_discovery,
        merge_strategy=args.merge_strategy,
        collect_blooms=args.collect_blooms,
        changelog=args.changelog,
        schema_mode=args.schema_mode,
    )
    # routed mode treats --table as the router root (one table per
    # final topic); maintenance ops always target ONE concrete table —
    # except query, which registers the whole root as SQL views
    if args.routed and args.maintenance and args.maintenance != "query":
        print(
            "--maintenance targets one concrete table: pass the "
            "per-topic path (e.g. <root>/<topic>) as --table and drop "
            "--routed",
            file=sys.stderr,
        )
        return 2
    if not args.routed:
        table = LakeTable(args.table, **table_opts)
    if args.maintenance:
        if args.maintenance == "compact":
            r = table.compact(
                spark, all_buckets=args.compact_all_buckets,
                sort=not args.compact_no_sort,
                sort_cols=(
                    [c.strip() for c in args.compact_sort_cols.split(",")
                     if c.strip()]
                    if args.compact_sort_cols else None
                ),
                layout=args.compact_layout,
            )
        elif args.maintenance == "vacuum":
            r = table.vacuum(
                keep_versions=args.vacuum_keep_versions,
                changelog_keep_batches=args.vacuum_changelog_keep_batches,
                orphan_grace_seconds=args.vacuum_orphan_grace,
            )
        elif args.maintenance == "stats":
            r = table.stats()
        elif args.maintenance == "delete-where":
            if not args.predicate:
                print("--maintenance delete-where requires --predicate",
                      file=sys.stderr)
                return 2
            r = table.delete_where(spark, args.predicate)
        elif args.maintenance in ("tag", "drop-tag"):
            if not args.tag_name:
                print(f"--maintenance {args.maintenance} requires "
                      "--tag-name", file=sys.stderr)
                return 2
            try:
                if args.maintenance == "tag":
                    r = table.tag(args.tag_name, version=args.tag_version)
                else:
                    r = table.drop_tag(args.tag_name)
            except ValueError as exc:
                print(f"{args.maintenance}: {exc}", file=sys.stderr)
                return 2
        elif args.maintenance == "lookup":
            if not args.key and not args.keys:
                print("--maintenance lookup requires --key or --keys",
                      file=sys.stderr)
                return 2
            try:
                if args.keys:
                    keys = json.loads(args.keys)
                    if not isinstance(keys, list) or not all(
                        isinstance(k, dict) for k in keys
                    ):
                        raise ValueError(
                            "--keys must be a JSON array of objects"
                        )
                    rows = table.lookup_many(spark, keys).collect()
                else:
                    key = json.loads(args.key)
                    if not isinstance(key, dict):
                        raise ValueError("--key must be a JSON object")
                    rows = table.lookup(spark, key).collect()
            except (json.JSONDecodeError, ValueError) as exc:
                # user error (malformed JSON, wrong key columns, empty
                # table), not an engine failure: same exit-2 contract
                # as the missing-argument paths above
                print(f"lookup: {exc}", file=sys.stderr)
                return 2
            r = {"rows": [row.asDict(recursive=True) for row in rows]}
        elif args.maintenance == "retry-dlq":
            # after deploying a chain fix (--chain = the FIXED spec):
            # re-drive the quarantine exactly-once with the stale-LSN
            # guard (streaming/dlq.py)
            if not (args.dlq_dir and args.dlq_key_type
                    and args.dlq_value_type):
                print("--maintenance retry-dlq requires --dlq-dir, "
                      "--dlq-key-type and --dlq-value-type",
                      file=sys.stderr)
                return 2
            from pyspark.sql import types as T

            from transforms_for_apache_kafka_connect_spark.streaming.dlq import (
                retry_dlq,
            )
            from transforms_for_apache_kafka_connect_spark.streaming.engine import (
                Replayer,
            )

            rep = Replayer(table=table, chain=chain,
                           epoch=args.epoch or "dlq-retry")
            r = retry_dlq(
                spark, args.dlq_dir, replayer=rep,
                key_type=T.StructType.fromDDL(args.dlq_key_type),
                value_type=T.StructType.fromDDL(args.dlq_value_type),
                epoch=args.epoch or "dlq-retry",
            )
        elif args.maintenance == "relay":
            # CDC-source direction: committed changelog -> converter
            # bytes (Debezium-envelope shaped) written to --relay-out,
            # ready for a bytes-oriented producer / downstream engine
            if not args.relay_out:
                print("--maintenance relay requires --relay-out",
                      file=sys.stderr)
                return 2
            from transforms_for_apache_kafka_connect_spark.streaming.relay import (
                publish_changelog,
            )

            try:
                raw = publish_changelog(
                    table, spark, format=args.relay_format,
                    epoch=args.epoch,  # None = every committed epoch
                    confluent_framing=(args.relay_format == "avro"),
                )
            except ValueError as exc:
                print(f"relay: {exc}", file=sys.stderr)
                return 2
            raw.write.mode("overwrite").parquet(args.relay_out)
            r = {"out": args.relay_out, "format": args.relay_format,
                 "n_events": spark.read.parquet(args.relay_out).count()}
        elif args.maintenance == "checksum":
            # one table fingerprint from the per-bucket digests: two
            # runs print the same table_sha256 iff the states match on
            # the digested columns — compare across clusters/days
            # without moving row data (streaming/verify.py)
            from transforms_for_apache_kafka_connect_spark.streaming.verify import (
                table_checksum,
            )

            dcols = (
                [c.strip() for c in args.diff_cols.split(",") if c.strip()]
                if args.diff_cols else None
            )
            rows = sorted(
                table_checksum(spark, table, cols=dcols).collect(),
                key=lambda x: x["bucket"],
            )
            import hashlib

            h = hashlib.sha256()
            for row in rows:
                h.update(repr(tuple(row)).encode())
            r = {
                "n_rows": sum(row["n_rows"] for row in rows),
                "n_buckets_present": len(rows),
                "table_sha256": h.hexdigest(),
            }
        elif args.maintenance == "diff":
            # row-level difference vs an expected state: a parquet dir,
            # or another lake table root (detected by its CURRENT
            # manifest pointer — the expected side is read through its
            # own LakeTable so MoR deltas/deletes resolve first)
            if not args.expected:
                print("--maintenance diff requires --expected",
                      file=sys.stderr)
                return 2
            from transforms_for_apache_kafka_connect_spark.streaming.verify import (
                table_diff,
            )

            if os.path.exists(
                os.path.join(args.expected, "_manifest", "CURRENT")
            ):
                exp = LakeTable(args.expected, discovery=False).read(spark)
            else:
                exp = spark.read.parquet(args.expected)
            dcols = (
                [c.strip() for c in args.diff_cols.split(",") if c.strip()]
                if args.diff_cols else None
            )
            try:
                diff = table_diff(spark, table, exp, cols=dcols)
            except ValueError as exc:
                print(f"diff: {exc}", file=sys.stderr)
                return 2
            sample = diff.limit(args.diff_limit).collect()
            r = {
                "match": not sample,
                "rows": [row.asDict(recursive=True) for row in sample],
                "truncated_at": args.diff_limit,
            }
        elif args.maintenance == "repair":
            # apply the diff vs --expected as a corrective ledgered
            # merge: upsert expected's version of differing keys,
            # delete keys only the table has (streaming/verify.py)
            if not args.expected:
                print("--maintenance repair requires --expected",
                      file=sys.stderr)
                return 2
            from transforms_for_apache_kafka_connect_spark.streaming.verify import (
                repair_state,
            )

            if os.path.exists(
                os.path.join(args.expected, "_manifest", "CURRENT")
            ):
                exp = LakeTable(args.expected, discovery=False).read(spark)
            else:
                exp = spark.read.parquet(args.expected)
            dcols = (
                [c.strip() for c in args.diff_cols.split(",") if c.strip()]
                if args.diff_cols else None
            )
            try:
                r = repair_state(
                    spark, table, exp, cols=dcols,
                    epoch=args.epoch or "repair",
                )
            except ValueError as exc:
                print(f"repair: {exc}", file=sys.stderr)
                return 2
        elif args.maintenance == "query":
            if not args.sql:
                print("--maintenance query requires --sql",
                      file=sys.stderr)
                return 2
            from transforms_for_apache_kafka_connect_spark.streaming.catalog import (
                LakeCatalog,
            )

            cat = LakeCatalog(spark, store=args.catalog_store)
            if args.routed:
                views = cat.register_root(args.table)
                if not views:
                    print(f"--maintenance query: no lake tables under "
                          f"{args.table!r}", file=sys.stderr)
                    return 2
            else:
                if cat.register("t", table) is None:
                    print(f"--maintenance query: table {args.table!r} has "
                          f"no committed data yet", file=sys.stderr)
                    return 2
                views = ["t"]
            from pyspark.errors import AnalysisException

            try:
                out = spark.sql(args.sql)
                rows = (
                    out.limit(args.sql_limit) if args.sql_limit else out
                ).collect()
            except AnalysisException as e:
                print(f"--maintenance query: {e.getMessage() if hasattr(e, 'getMessage') else e}",
                      file=sys.stderr)
                return 2
            for row in rows:
                print(json.dumps(row.asDict(recursive=True), default=str))
            r = {"views": views, "rows_printed": len(rows)}
        elif args.maintenance == "publish":
            if not args.staged_token:
                print("--maintenance publish requires --staged-token",
                      file=sys.stderr)
                return 2
            try:
                r = table.publish(args.staged_token)
            except FileNotFoundError:
                print(f"publish: no staged commit {args.staged_token!r} "
                      f"(already published, vacuumed, or mistyped)",
                      file=sys.stderr)
                return 2
        else:
            if args.rescale_buckets is None:
                print("--maintenance rescale requires --rescale-buckets",
                      file=sys.stderr)
                return 2
            r = table.rescale(spark, args.rescale_buckets)
        print(json.dumps({"mode": "maintenance", "op": args.maintenance, **r},
                         default=str))
        return 0

    if not args.events and not args.bootstrap:
        print("--events is required unless --maintenance or --bootstrap "
              "is given",
              file=sys.stderr)
        return 2
    if args.bootstrap and args.snapshot_lsn is None:
        print("--bootstrap requires --snapshot-lsn", file=sys.stderr)
        return 2
    if args.bootstrap and args.routed:
        print("--bootstrap targets one concrete table; drop --routed",
              file=sys.stderr)
        return 2

    expectations = []
    if args.expectations:
        from transforms_for_apache_kafka_connect_spark.streaming.expectations import (
            Expectation,
        )

        with open(args.expectations) as f:
            specs = json.load(f)
        if not isinstance(specs, list):
            print("--expectations must be a JSON list", file=sys.stderr)
            return 2
        try:
            expectations = [Expectation(**s) for s in specs]
        except (TypeError, ValueError) as exc:
            print(f"expectations: {exc}", file=sys.stderr)
            return 2

    # error policy: explicit flags win; otherwise a .properties chain
    # may declare errors.tolerance / errors.deadletterqueue.* (the
    # Connect worker surface); default = fail (reference model)
    error_mode, dlq_dir = args.error_mode, args.dlq_dir
    if error_mode is None and args.chain and args.chain.endswith(".properties"):
        from transforms_for_apache_kafka_connect_spark.errors import (
            ConfigException,
        )
        from transforms_for_apache_kafka_connect_spark.plans.properties import (
            error_policy_from_properties,
        )

        try:
            policy = error_policy_from_properties(args.chain)
        except ConfigException as exc:
            print(f"error policy: {exc}", file=sys.stderr)
            return 2
        if policy:
            error_mode = policy["error_mode"]
            # explicit --dlq-dir always wins over the declared topic/dir
            dlq_dir = dlq_dir or policy.get("dlq_dir")
    # declared continuity checking (engine extension keys) — the
    # explicit --track-gaps flags win over the properties file
    if (
        not args.track_gaps
        and args.chain
        and args.chain.endswith(".properties")
    ):
        from transforms_for_apache_kafka_connect_spark.errors import (
            ConfigException,
        )
        from transforms_for_apache_kafka_connect_spark.plans.properties import (
            sequence_policy_from_properties,
        )

        try:
            seq_policy = sequence_policy_from_properties(
                args.chain, os.path.join(args.table, "_seq_state")
            )
        except ConfigException as exc:
            print(f"sequence policy: {exc}", file=sys.stderr)
            return 2
        if seq_policy:
            args.track_gaps = seq_policy["track_gaps"].mode
            args.gaps_by = ",".join(seq_policy["track_gaps"].by)
            args.gaps_seq = seq_policy["track_gaps"].seq
            args.gaps_policy = seq_policy["gaps_policy"]
            args.gaps_report_dir = (
                args.gaps_report_dir
                or seq_policy.get("gaps_report_dir")
            )
    error_mode = error_mode or "fail"
    if error_mode == "dlq" and not dlq_dir:
        print("--error-mode dlq requires --dlq-dir", file=sys.stderr)
        return 2

    if args.merge_semantics == "patch":
        for bad, flag in (
            (args.routed, "--routed"),
            (args.bootstrap, "--bootstrap"),
            (expectations, "--expectations"),
            (error_mode == "dlq", "--error-mode dlq"),
        ):
            if bad:
                print(f"--merge-semantics patch is incompatible with "
                      f"{flag}", file=sys.stderr)
                return 2
        return _run_patch(spark, args, table, chain)

    if args.routed:
        from transforms_for_apache_kafka_connect_spark.streaming import (
            TopicTableRouter,
        )

        routed_tracker = None
        if args.track_gaps:
            # ONE tracker over the raw source batch (state beside the
            # router root): continuity is a transport property — after
            # the chain rewrites topics, per-destination sequences are
            # legitimately sparse
            from transforms_for_apache_kafka_connect_spark.streaming.gaps import (
                SequenceTracker,
            )

            by = [c.strip() for c in args.gaps_by.split(",") if c.strip()]
            routed_tracker = SequenceTracker(
                table=LakeTable(
                    os.path.join(args.table, "_seq_state"),
                    key_cols=by, n_buckets=1,
                    discovery=False, merge_strategy="broadcast",
                ),
                by=tuple(by),
                seq=args.gaps_seq,
                mode=args.track_gaps,
            )
        engine = TopicTableRouter(
            root=args.table, chain=chain, epoch=args.epoch or "default",
            table_opts=table_opts,
            replayer_opts={
                "error_mode": error_mode, "dlq_dir": dlq_dir,
                "expectations": expectations,
            },
            compact_every=args.compact_every,
            track_gaps=routed_tracker,
            gaps_policy=args.gaps_policy,
            gaps_report_dir=args.gaps_report_dir,
        )
    else:
        tracker = None
        if args.track_gaps:
            from transforms_for_apache_kafka_connect_spark.streaming.gaps import (
                SequenceTracker,
            )

            by = [c.strip() for c in args.gaps_by.split(",") if c.strip()]
            tracker = SequenceTracker(
                table=LakeTable(
                    os.path.join(args.table, "_seq_state"),
                    key_cols=by, n_buckets=1,
                    discovery=False, merge_strategy="broadcast",
                ),
                by=tuple(by),
                seq=args.gaps_seq,
                mode=args.track_gaps,
            )
        engine = Replayer(table=table, chain=chain,
                          epoch=args.epoch or "default",
                          compact_every=args.compact_every,
                          error_mode=error_mode, dlq_dir=dlq_dir,
                          expectations=expectations,
                          track_gaps=tracker,
                          gaps_policy=args.gaps_policy,
                          gaps_report_dir=args.gaps_report_dir)

    if args.bootstrap:
        snap = spark.read.parquet(args.bootstrap)
        try:
            r = engine.bootstrap(snap, snapshot_lsn=args.snapshot_lsn)
        except ValueError as exc:
            # user error (e.g. non-empty table): same exit-2 contract
            # as the other argument-validation paths
            print(f"bootstrap: {exc}", file=sys.stderr)
            return 2
        print(json.dumps({"mode": "bootstrap", "table": args.table,
                          "snapshot_lsn": args.snapshot_lsn, **r}))
        if not args.events:
            return 0

    if args.streaming:
        if not args.checkpoint:
            print("--streaming requires --checkpoint", file=sys.stderr)
            return 2
        if sum(map(bool, (args.raw_json, args.raw_avro,
                          args.cdc_envelope))) > 1:
            print("--raw-json / --raw-avro / --cdc-envelope are "
                  "exclusive", file=sys.stderr)
            return 2

        def _avro_schema(s):
            # inline Avro JSON or a path to a .avsc file
            if s is not None and os.path.exists(s):
                with open(s) as fh:
                    return fh.read()
            return s

        raw_format = (args.cdc_envelope if args.cdc_envelope
                      else "avro" if args.raw_avro
                      else "json" if args.raw_json else None)
        key_schema, value_schema = args.key_schema, args.value_schema
        confluent_framing = args.confluent_framing
        writer_schemas = None
        key_fields = (args.key_cols.split(",") if args.cdc_envelope
                      else None)
        if raw_format == "avro":
            key_schema = _avro_schema(key_schema)
            value_schema = _avro_schema(value_schema)
        if (raw_format is None and args.chain
                and args.chain.endswith(".properties")):
            # the connector file may declare its converters too
            # (key.converter/value.converter + pinned schema keys) —
            # the full Connect deployment surface from ONE file
            from transforms_for_apache_kafka_connect_spark.plans.properties import (
                converters_from_properties,
            )

            conv = converters_from_properties(args.chain)
            if conv.get("raw_format"):
                raw_format = conv["raw_format"]
                key_schema = conv.get("key_schema")
                value_schema = conv.get("value_schema")
                confluent_framing = conv.get("confluent_framing", False)
                writer_schemas = conv.get("writer_schemas")
                key_fields = conv.get("key_fields") or (
                    args.key_cols.split(",")
                    if raw_format in ("maxwell", "canal", "dms")
                    else None
                )
        kafka_kwargs = {}
        if args.chain and args.chain.endswith(".properties"):
            # the connector file may declare a LIVE topic source
            # (engine extension source.kafka.* keys) — gated on the
            # spark-sql-kafka class probe, same pattern as spark-avro
            from transforms_for_apache_kafka_connect_spark.sources import (
                kafka_options_from_properties,
            )

            kafka_kwargs = kafka_options_from_properties(args.chain)
        if kafka_kwargs:
            from transforms_for_apache_kafka_connect_spark.sources import (
                kafka_stream,
            )

            try:
                stream = kafka_stream(spark, **kafka_kwargs)
            except RuntimeError as exc:
                print(f"kafka source: {exc}", file=sys.stderr)
                return 2
        else:
            batch_df = spark.read.parquet(args.events)
            stream = (
                spark.readStream.schema(batch_df.schema).parquet(args.events)
            )
        q = engine.stream(
            stream, args.checkpoint, available_now=True,
            raw_format=raw_format,
            key_schema=key_schema,
            value_schema=value_schema,
            confluent_framing=confluent_framing,
            writer_schemas=writer_schemas,
            suppress_stale_ms=args.suppress_stale_ms,
            key_fields=key_fields,
        )
        q.awaitTermination()
        print(json.dumps({"mode": "streaming", "table": args.table,
                          "routed": args.routed}))
        return 0

    events = spark.read.parquet(args.events)
    sliced = _slice_bounds(events, args)
    if isinstance(sliced, int):
        return sliced
    lo, hi, width = sliced

    results = engine.replay(
        events, batch_width=width, max_pos=hi, start_pos=lo,
        slice_col=args.slice_col,
    )
    for r in results:
        print(json.dumps({k: v for k, v in r.items() if k != "transform_metrics"}))
    if args.routed:
        topics = sorted({t for r in results for t in r.get("topics", {})})
        print(
            json.dumps(
                {
                    "mode": "batch",
                    "routed": True,
                    "root": args.table,
                    "n_batches": len(results),
                    "topics": topics,
                }
            )
        )
        return 0
    print(
        json.dumps(
            {
                "mode": "batch",
                "table": args.table,
                "n_batches": len(results),
                "applied": sum(1 for r in results if not r.get("skipped")),
                "skipped": sum(1 for r in results if r.get("skipped")),
                "final_version": table.manifest()["version"],
            }
        )
    )
    return 0




def _slice_bounds(events, args):
    """(lo, hi, width) for position-sliced batch replay, or an exit
    code on argument/validation errors (shared by the LWW and patch
    batch paths)."""
    from pyspark.sql import functions as F

    lo = args.start_pos
    hi = args.max_pos
    if lo is None or hi is None:
        dtype = dict(events.dtypes).get(args.slice_col)
        if dtype is None:
            print(
                f"--slice-col {args.slice_col!r} not found in events "
                f"schema (columns: {', '.join(events.columns)})",
                file=sys.stderr,
            )
            return 2
        numeric = {"tinyint", "smallint", "int", "bigint", "float", "double"}
        if dtype not in numeric and not dtype.startswith("decimal"):
            print(
                f"--slice-col {args.slice_col!r} has type {dtype}; batching "
                "needs a numeric position column (e.g. an epoch-millis "
                "long — cast timestamps via unix_millis first)",
                file=sys.stderr,
            )
            return 2
        bounds = events.agg(
            F.min(args.slice_col).alias("lo"), F.max(args.slice_col).alias("hi")
        ).first()
        if bounds["hi"] is None:
            print(f"no events found under {args.events}", file=sys.stderr)
            return 2
        if lo is None:
            lo = bounds["lo"]
        if hi is None:
            hi = bounds["hi"] + 1
    return lo, hi, max(1, -(-(hi - lo) // args.batches))


def _run_patch(spark, args, table, chain) -> int:
    """--merge-semantics patch: position-sliced batches (or the
    streaming entry) through the SMT chain into patch_apply — partial-
    column updates with the table's ledger for exactly-once. The
    restricted surface (no routing/bootstrap/expectations/DLQ) is
    validated by the caller."""
    from transforms_for_apache_kafka_connect_spark.record import ensure_error_col
    from transforms_for_apache_kafka_connect_spark.streaming.patch import (
        patch_apply,
        stream_patch_into,
    )

    from pyspark.sql import functions as F

    def through_chain(df):
        out = chain.apply(ensure_error_col(df)) if chain.stages else df
        return out

    if args.streaming:
        if not args.checkpoint:
            print("--streaming requires --checkpoint", file=sys.stderr)
            return 2
        batch_df = spark.read.parquet(args.events)
        stream = (
            spark.readStream.schema(batch_df.schema).parquet(args.events)
        )
        q = stream_patch_into(
            table, stream, args.checkpoint,
            epoch=args.epoch or "default",
            available_now=True, prepare=through_chain,
        )
        q.awaitTermination()
        print(json.dumps({"mode": "streaming", "semantics": "patch",
                          "table": args.table}))
        return 0

    events = spark.read.parquet(args.events)
    sliced = _slice_bounds(events, args)
    if isinstance(sliced, int):
        return sliced
    lo, hi, width = sliced
    results = []
    for b, start in enumerate(range(lo, hi, width)):
        batch = events.filter(
            (F.col(args.slice_col) >= start)
            & (F.col(args.slice_col) < min(start + width, hi))
        )
        r = patch_apply(
            table, through_chain(batch),
            epoch=args.epoch or "default", batch_id=b,
        )
        results.append(r)
        print(json.dumps({"batch_id": b, **{
            k: v for k, v in r.items() if isinstance(v, (int, str, bool))
        }}))
    print(json.dumps({
        "mode": "batch",
        "semantics": "patch",
        "table": args.table,
        "n_batches": len(results),
        "applied": sum(1 for r in results if not r.get("skipped")),
        "skipped": sum(1 for r in results if r.get("skipped")),
        "final_version": table.manifest()["version"],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
