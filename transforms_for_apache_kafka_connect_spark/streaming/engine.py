"""The CDC replay loop: for each batch — chain → LWW dedupe → MERGE →
commit ledger (north_rule; SURVEY.md §7.6).

Batching is by LSN range, so a batch is a pure function of the stream —
resume after a crash replays the same batches, and the ledger (inside
the table manifest) makes re-application a no-op. Drop/route/mutate
metrics come from ``Observation`` hooks on the chain (north_star:
"transform-level drop/route/mutate metrics").

The same ``apply_batch`` works under Structured Streaming
``foreachBatch`` — batch replay and live tailing share one code path.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Observation

from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
from transforms_for_apache_kafka_connect_spark.streaming.dedupe import (
    _op_rank as _op_rank_expr,
    lww_dedupe,
)
from transforms_for_apache_kafka_connect_spark.streaming.sink import LakeTable

_log = logging.getLogger(__name__)

#: reserved ledger batch id for the initial-snapshot load (Debezium
#: snapshot phase) — ordinary replay batch ids start at 0
BOOTSTRAP_BATCH_ID = -1


def prepare_stream_events(
    events: DataFrame,
    *,
    raw_format: str | None = None,
    raw_json: bool = False,
    key_schema=None,
    value_schema=None,
    confluent_framing: bool = False,
    writer_schemas: dict | None = None,
    suppress_stale_ms: int | None = None,
    key_fields: list[str] | None = None,
) -> DataFrame:
    """Pre-fan-out stream preparation shared by Replayer.stream and
    TopicTableRouter.stream: the converter boundary (explicit schemas
    required — a stream cannot be sampled for inference) and the
    stateful stale-LSN suppressor. Both are table-agnostic.

    ``raw_format``: None (already an envelope), ``"json"``
    (JsonConverter boundary; schemas are Spark DDL/StructType),
    ``"avro"`` (AvroConverter boundary; schemas are Avro JSON,
    ``confluent_framing`` strips the registry wire frame, and
    ``writer_schemas`` ({schema_id: avro schema}) resolves an evolving
    topic onto the reader ``value_schema``), or ``"protobuf"``
    (ProtobufConverter boundary; schemas are message dicts/JSON —
    evolution is by field number so no writer-schema snapshot applies).
    ``raw_json=True`` is the back-compat spelling of
    ``raw_format="json"``."""
    if raw_json and raw_format is None:
        raw_format = "json"
    if raw_format not in (
        None, "json", "avro", "protobuf", "maxwell", "canal", "dms"
    ):
        raise ValueError(f"unknown raw_format: {raw_format!r}")
    if raw_format is not None and value_schema is None:
        raise ValueError(
            f"raw_format={raw_format!r} streaming requires an explicit "
            "value_schema (a stream cannot be sampled for inference)"
        )
    if raw_format == "json":
        from transforms_for_apache_kafka_connect_spark.sources.json_boundary import (
            envelope_from_json,
        )

        events = envelope_from_json(
            events, key_schema=key_schema, value_schema=value_schema
        )
    elif raw_format == "avro":
        from transforms_for_apache_kafka_connect_spark.sources.avro_boundary import (
            envelope_from_avro,
        )

        events = envelope_from_avro(
            events,
            key_schema=key_schema,
            value_schema=value_schema,
            confluent_framing=confluent_framing,
            writer_schemas=writer_schemas,
        )
    elif raw_format == "protobuf":
        if writer_schemas:
            raise ValueError(
                "writer_schemas does not apply to the protobuf "
                "boundary: proto evolution resolves by field number in "
                "the codec itself"
            )
        from transforms_for_apache_kafka_connect_spark.sources.protobuf_boundary import (
            envelope_from_protobuf,
        )

        events = envelope_from_protobuf(
            events,
            key_schema=key_schema,
            value_schema=value_schema,
            confluent_framing=confluent_framing,
        )
    elif raw_format in ("maxwell", "canal", "dms"):
        # third-party CDC wire envelopes (sources/cdc_envelopes.py):
        # the boundary produces the FULL change envelope directly —
        # value_schema types the row payload, key_fields names its
        # primary key, the Kafka offset column is the LSN
        if not key_fields:
            raise ValueError(
                f"raw_format={raw_format!r} requires key_fields= (the "
                "payload's primary-key columns)"
            )
        if confluent_framing or writer_schemas or key_schema:
            raise ValueError(
                "confluent_framing/writer_schemas/key_schema do not "
                f"apply to the {raw_format} envelope boundary"
            )
        from transforms_for_apache_kafka_connect_spark.sources import (
            cdc_envelopes,
        )

        fn = {
            "maxwell": cdc_envelopes.envelope_from_maxwell,
            "canal": cdc_envelopes.envelope_from_canal,
            "dms": cdc_envelopes.envelope_from_dms,
        }[raw_format]
        events = fn(events, data_schema=value_schema, key_fields=key_fields)
    if suppress_stale_ms is not None:
        # live-tailing input bound: drop redelivered/stale LSNs via
        # managed state BEFORE the per-batch chain/dedupe/merge
        # (at-least-once sources redeliver; the ledger makes whole
        # batches idempotent, this suppresses single stale events)
        from transforms_for_apache_kafka_connect_spark.streaming.stateful import (
            suppress_stale_envelope,
        )

        events = suppress_stale_envelope(
            events, state_timeout_ms=suppress_stale_ms
        )
    return events


@dataclass
class Replayer:
    table: LakeTable
    chain: Chain = field(default_factory=lambda: Chain([]))
    epoch: str = "default"
    payload_fields: list[str] | None = None  # default: all of value.after.*
    #: LWW pushdown (the engine's one planner rule): run the chain's
    #: leading row-filter stages on all events, pick LWW winners on a
    #: NARROW (key, lsn, ts, op) projection — tiny shuffle, column-pruned
    #: scan — then run mutator stages (hash/concat/...) only on the
    #: winner rows (bounded by key count, not event count). Identical
    #: final state: filters commute with winner selection, and mutators
    #: never change (key, lsn). At 10^9-event batches this is the
    #: difference between shuffling payload terabytes and megabytes.
    lww_pushdown: bool = True
    #: broadcast the winner set for the payload-row join (right for
    #: batches whose distinct-key count fits in memory; disable to
    #: shuffle-join winners instead)
    winners_broadcast: bool = True
    #: declare that LSNs are unique per key within a batch (the normal
    #: binlog/WAL contract). The winner ordering then collapses from a
    #: struct(lsn, ts, op_rank) to the bare lsn long: Spark plans the
    #: winner aggregate as a map-side-combining HashAggregate instead of
    #: the SortAggregate a struct-max forces (struct agg buffers are
    #: immutable -> no hash form), removing a full per-partition sort of
    #: the batch. Exact duplicate deliveries (same key AND same lsn) are
    #: still collapsed by the final LWW aggregate in updates_for.
    unique_lsn: bool = False
    #: two-phase salted LWW aggregate (dedupe.py) for pathologically hot
    #: keys — spreads a single key over n_salt reducers in phase 1.
    #: Applies to the final LWW (and the whole dedupe when pushdown is
    #: off); the pushdown winner aggregate needs no salting — its
    #: map-side combine already collapses hot keys per task.
    dedupe_salt: int = 0
    #: run table.compact() every K committed batches (0 = never). The
    #: broadcast merge strategy appends ~1 small upsert file per bucket
    #: per batch; periodic compaction bounds live-file count the same
    #: way Iceberg's rewrite_data_files does for its COW tables.
    compact_every: int = 0
    compact_max_files_per_bucket: int = 8
    #: per-record error handling. "fail" = the reference's DataException
    #: model: the first errored record aborts the batch pre-commit
    #: (default). "dlq" = Kafka Connect's errors.tolerance=all analog:
    #: errored records are quarantined to ``dlq_dir`` (JSON-serialized
    #: envelope + error message, one directory per (epoch, batch) —
    #: overwrite-idempotent under replay) and the REST of the batch
    #: merges normally. The DLQ write job runs only when a batch
    #: actually contains errors.
    error_mode: str = "fail"
    dlq_dir: str | None = None
    #: MaintainedAggregate specs (incremental.py) folded in after every
    #: committed batch — downstream COUNT/SUM views kept consistent
    #: with the table from its changelog, exactly-once end-to-end
    #: (requires the table to run with changelog=True)
    maintain: list = field(default_factory=list)
    #: data-quality Expectation specs (expectations.py) over the
    #: table-shaped update rows: fail aborts the batch pre-commit,
    #: drop filters violating rows (counted), warn counts and logs.
    #: Compiled into the merge plan; counts ride the same Observation
    #: machinery as the error contract — no extra job
    expectations: list = field(default_factory=list)
    #: publish=False stages the merge (write-audit-publish) instead of
    #: making it live: apply_batch returns the staged token and the
    #: batch is NOT yet in the ledger — a transaction coordinator
    #: (txn.py) publishes it later, atomically with its sibling tables
    publish: bool = True
    #: optional SequenceTracker (gaps.py): every batch's RAW envelope
    #: is continuity-checked against the tracked per-group watermark
    #: BEFORE the merge, and the watermark advances exactly-once AFTER
    #: the commit (so a failed batch re-checks identically on replay).
    #: Opt-in because the check is one extra aggregation job per batch
    #: (a window pass cannot ride the merge's Observation).
    track_gaps: object | None = None
    #: 'error' aborts the batch pre-commit on any anomaly (replayable,
    #: same contract as the per-record error path); 'warn' logs the
    #: anomaly count and proceeds
    gaps_policy: str = "error"
    #: optional parquet root: each batch's anomaly rows are appended
    #: under epoch=<epoch>/batch_id=<id> for later audit
    gaps_report_dir: str | None = None
    #: callables invoked with the batch result dict after a batch is
    #: durably applied — fresh commit AND verified ledger skip, so a
    #: crash-replay still fires them; hooks must therefore be
    #: idempotent (same contract as maintained aggregates). Staged
    #: merges (publish=False) never fire: the state is not live until
    #: the transaction coordinator publishes it. Typical hooks: a
    #: LakeCatalog (SQL views track ingest), metrics export, alerting.
    on_commit: list = field(default_factory=list)

    def __post_init__(self):
        if self.error_mode not in ("fail", "dlq"):
            raise ValueError("error_mode must be 'fail' or 'dlq'")
        if self.gaps_policy not in ("error", "warn"):
            raise ValueError("gaps_policy must be 'error' or 'warn'")
        if self.error_mode == "dlq" and not self.dlq_dir:
            raise ValueError("error_mode='dlq' requires dlq_dir")
        if self.maintain and not getattr(self.table, "changelog", False):
            raise ValueError(
                "maintained aggregates need row-level change capture: "
                "create the table with changelog=True"
            )
        if not self.publish and self.maintain:
            # a maintained aggregate folds read_changelog(batch), which
            # only exists once the batch is LIVE; the coordinator that
            # owns publish must also own the post-publish maintenance
            raise ValueError(
                "publish=False (staged merges) cannot run maintained "
                "aggregates — fold them after the coordinator publishes"
            )
        if not self.publish and self.track_gaps is not None:
            # the watermark must only advance for LIVE batches: a
            # staged batch the coordinator later abandons would leave
            # the tracker ahead of the table
            raise ValueError(
                "publish=False (staged merges) cannot track sequence "
                "gaps — the watermark would advance for unpublished "
                "batches"
            )

    def _run_maintenance(self, spark: SparkSession, batch_id: int) -> None:
        """Fold this batch's changelog into every attached aggregate.

        Runs for fresh AND ledger-skipped batches: a crash between the
        source merge and the aggregate update replays as (skip source,
        apply aggregate) — each side's own ledger makes the composition
        exactly-once. Batches that wrote no changelog entry (verifiably
        empty) have nothing to fold.
        """
        from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
            fold_maintenance,
        )

        fold_maintenance(
            self.table, self.maintain, spark,
            epoch=self.epoch, batch_id=batch_id,
        )

    def _dlq_serialize(self, df: DataFrame) -> DataFrame:
        """Errored envelope rows -> flat JSON-string form (key/value
        structs may differ across chain stages, so serialize before any
        union) + the error message."""
        from transforms_for_apache_kafka_connect_spark.record import ERROR_COL

        return df.select(
            "topic",
            "partition",
            F.to_json(F.struct(F.col("key").alias("k"))).alias("key_json"),
            F.to_json(F.struct(F.col("value").alias("v"))).alias("value_json"),
            "timestamp",
            F.col(ERROR_COL).alias("error"),
        )

    def _split_chain(self) -> tuple[Chain, Chain]:
        """Longest prefix of row-filter stages, and the rest."""
        stages = self.chain.stages
        i = 0
        while i < len(stages) and getattr(stages[i], "is_row_filter", False):
            i += 1
        pre, post = Chain([]), Chain([])
        pre.stages = list(stages[:i])
        post.stages = list(stages[i:])
        return pre, post

    #: canonical Debezium envelope fields; anything else on `value` was
    #: added by an SMT (e.g. ConcatFields) and becomes a table column —
    #: north_star: "added columns ... propagate ... automatically"
    CANONICAL_VALUE_FIELDS = frozenset({"op", "lsn", "ts_ms", "before", "after"})

    def updates_for(self, batch: DataFrame) -> DataFrame:
        """Envelope batch -> merge input: key cols + payload + delete flag."""
        deduped = lww_dedupe(batch, n_salt=self.dedupe_salt)
        vdt = deduped.schema["value"].dataType
        after_fields = (
            self.payload_fields
            or [f.name for f in vdt["after"].dataType.fields]
        )
        extra_fields = [
            f.name for f in vdt.fields if f.name not in self.CANONICAL_VALUE_FIELDS
        ]
        return deduped.select(
            *[F.col(f"key.{c}").alias(c) for c in self.table.key_cols],
            *[
                F.col(f"value.after.{c}").alias(c)
                for c in after_fields
                if c not in self.table.key_cols
            ],
            *[F.col(f"value.{c}").alias(c) for c in extra_fields],
            F.col("value.lsn").alias("_lsn"),
            (F.col("value.op") == "d").alias("__is_delete"),
        )

    def _snapshot_lsn(self) -> int | None:
        """Snapshot LSN recorded by ``bootstrap`` (None = never
        bootstrapped, or the sink doesn't expose engine extras)."""
        extra_fn = getattr(self.table, "extra", None)
        if extra_fn is None:
            return None
        v = extra_fn().get("snapshot_lsn")
        return int(v) if v is not None else None

    def bootstrap(
        self,
        snapshot: DataFrame,
        *,
        snapshot_lsn: int,
        is_envelope: bool = False,
        topic: str = "snapshot",
    ) -> dict:
        """Debezium initial-snapshot analog: seed the table from a
        consistent source snapshot, then hand off to incremental replay.

        ``snapshot`` is a table-shaped DataFrame (key columns + payload
        columns, ≤1 row per key — e.g. the source table read at a
        single consistent position), or, with ``is_envelope=True``, an
        already-built op='r' envelope stream. ``snapshot_lsn`` is the
        source position the snapshot is consistent with; it is recorded
        in the table manifest (``extra.snapshot_lsn``, carried forward
        by every later commit) and every subsequent ``apply_batch``
        drops events at or below it — see the correctness note in
        ``apply_batch``. Snapshot records flow through the SMT chain
        exactly like streamed events (Debezium snapshot semantics).

        Ledgered under ``BOOTSTRAP_BATCH_ID`` → idempotent under
        crash/retry like any batch. Refuses a table that already has
        other commits: re-seeding over applied increments would regress
        newer rows (the merge is source-wins).
        """
        if self.table.committed(self.epoch, BOOTSTRAP_BATCH_ID):
            # same catch-up contract as apply_batch's skip path: a
            # crash between the bootstrap commit and the aggregate fold
            # replays here, and replay() only iterates batch ids >= 0 —
            # this is the ONLY chance to repair the bootstrap batch's
            # maintained aggregates
            self._run_maintenance(
                snapshot.sparkSession, BOOTSTRAP_BATCH_ID
            )
            result = {"skipped": True, "batch_id": BOOTSTRAP_BATCH_ID}
            self._fire_on_commit(result)
            return result
        manifest_fn = getattr(self.table, "manifest", None)
        if manifest_fn is not None and manifest_fn()["committed"]:
            raise ValueError(
                "bootstrap requires an empty table (no committed "
                "batches): seeding over applied increments would "
                "regress newer rows"
            )
        if not is_envelope:
            from transforms_for_apache_kafka_connect_spark.sources.changestream import (
                snapshot_envelope,
            )

            snapshot = snapshot_envelope(
                snapshot, list(self.table.key_cols),
                lsn=snapshot_lsn, topic=topic,
            )
        return self.apply_batch(
            snapshot,
            BOOTSTRAP_BATCH_ID,
            manifest_extra={"snapshot_lsn": int(snapshot_lsn)},
        )

    def apply_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        manifest_extra: dict | None = None,
    ) -> dict:
        """chain → dedupe → merge → commit; idempotent on (epoch, batch_id).

        ONE Spark action per batch (the merge write): input/error/drop
        metrics ride on ``observe`` nodes inside the same plan, and the
        reference's batch-fail error contract is enforced by a
        pre-commit check — a per-record error aborts the manifest swap,
        leaving the batch uncommitted exactly as a thrown DataException
        would have (SURVEY.md §4.3), without the extra enforce() pass.
        """
        from transforms_for_apache_kafka_connect_spark.errors import DataException
        from transforms_for_apache_kafka_connect_spark.record import (
            ERROR_COL,
            ensure_error_col,
        )

        if self.table.committed(self.epoch, batch_id):
            # still fold the (already-committed) batch's changelog into
            # attached aggregates: a crash between the source merge and
            # the aggregate update lands here on replay, and the agg
            # table's own ledger dedupes the other direction
            self._run_maintenance(batch.sparkSession, batch_id)
            if self.track_gaps is not None:
                # same catch-up contract: a crash between the source
                # commit and the watermark advance lands here
                self.track_gaps.advance(
                    batch.sparkSession, batch,
                    epoch=self.epoch, batch_id=batch_id,
                )
            result = {"skipped": True, "batch_id": batch_id}
            self._fire_on_commit(result)
            return result
        gaps_n = None
        if self.track_gaps is not None:
            # continuity check on the RAW envelope (transport-level —
            # before the fence or chain can drop anything), against the
            # NOT-yet-advanced watermark so a replayed failed batch
            # re-checks identically
            rep_df = self.track_gaps.report(batch.sparkSession, batch)
            if self.gaps_report_dir:
                rep_df.write.mode("overwrite").parquet(
                    os.path.join(
                        self.gaps_report_dir,
                        f"epoch={self.epoch}", f"batch_id={batch_id}",
                    )
                )
                gaps_n = (
                    batch.sparkSession.read.parquet(
                        os.path.join(
                            self.gaps_report_dir,
                            f"epoch={self.epoch}", f"batch_id={batch_id}",
                        )
                    ).count()
                )
            else:
                gaps_n = rep_df.count()
            if gaps_n:
                if self.gaps_policy == "error":
                    raise DataException(
                        f"sequence continuity violated: {gaps_n} "
                        f"anomalies in batch {batch_id} (lost, duplicated "
                        "or out-of-order events) — batch aborted "
                        "pre-commit and stays replayable"
                    )
                _log.warning(
                    "sequence continuity: %s anomalies in batch %s "
                    "(gaps_policy='warn' — proceeding)", gaps_n, batch_id,
                )
        snap_lsn = self._snapshot_lsn()
        if snap_lsn is not None:
            # bootstrapped table: events at or below the snapshot LSN
            # are already reflected in the seeded state. Dropping them
            # is REQUIRED for correctness, not just speed — the merge is
            # source-wins (no target-LSN comparison), so a pre-snapshot
            # event replayed afterwards (e.g. a delete whose undo the
            # snapshot already contains) would regress the table.
            # Tombstone records carry no LSN and pass through (their
            # downstream handling is idempotent). A DATA row with a
            # NULL lsn also passes: it must reach the chain's error
            # contract (fail/DLQ) exactly as it would on a
            # never-bootstrapped table — the fence only drops rows it
            # can PROVE are pre-snapshot.
            batch = batch.filter(
                F.col("value").isNull()
                | F.col("value.lsn").isNull()
                | (F.col("value.lsn") > F.lit(snap_lsn))
            )
        obs = Observation(f"chain_{self.epoch}_{batch_id}")

        pre, post = self._split_chain()
        obs_pre = None
        if self.lww_pushdown and post.stages:
            if self.unique_lsn:
                ordering = F.col("value.lsn")
            else:
                ordering = F.struct(
                    F.col("value.lsn").alias("lsn"),
                    F.col("value.ts_ms").alias("ts_ms"),
                    _op_rank_expr().alias("op_rank"),
                )
            # the filter prefix is applied independently per subtree so
            # each stage's drop Observation counts rows exactly once
            # (the PROBE-side apply runs last and wins stage.last_observation)
            live_narrow = pre.apply(ensure_error_col(batch)).filter(
                F.col("value").isNotNull()
            )
            # narrow winner selection: scan prunes to key + ordering cols
            winners = (
                live_narrow.select(F.col("key").alias("__k"), ordering.alias("__ord"))
                .groupBy("__k")
                .agg(F.max("__ord").alias("__ord"))
            )
            if self.winners_broadcast:
                winners = F.broadcast(winners)
            filtered = pre.apply(ensure_error_col(batch))
            # pre-stage errors (e.g. fail-mode tombstones) live on rows
            # the winner machinery drops — observe them before that
            obs_pre = Observation(f"pre_{self.epoch}_{batch_id}")
            filtered = filtered.observe(
                obs_pre, F.max(F.col(ERROR_COL)).alias("first_error")
            )
            live = filtered.filter(F.col("value").isNotNull())
            if self.error_mode == "dlq":
                # quarantined records leave the stream BEFORE winner
                # selection (Connect errors.tolerance=all: the record is
                # skipped, the rest proceeds)
                live_narrow = live_narrow.filter(F.col(ERROR_COL).isNull())
                live = live.filter(F.col(ERROR_COL).isNull())
                winners = (
                    live_narrow.select(
                        F.col("key").alias("__k"), ordering.alias("__ord")
                    )
                    .groupBy("__k")
                    .agg(F.max("__ord").alias("__ord"))
                )
                if self.winners_broadcast:
                    winners = F.broadcast(winners)
            winner_rows = live.join(
                winners,
                (F.col("key") == F.col("__k")) & (ordering == F.col("__ord")),
            ).drop("__k", "__ord")
            transformed = post.apply(winner_rows).observe(
                obs,
                F.count(F.lit(1)).alias("n_out"),
                F.max(F.col(ERROR_COL)).alias("first_error"),
            )
            dlq_sources = [filtered, transformed]
        else:
            transformed = self.chain.apply(ensure_error_col(batch)).observe(
                obs,
                F.count(F.lit(1)).alias("n_out"),
                F.max(F.col(ERROR_COL)).alias("first_error"),
            )
            dlq_sources = [transformed]
        if self.error_mode == "dlq":
            updates = self.updates_for(
                transformed.filter(F.col(ERROR_COL).isNull())
            )
        else:
            updates = self.updates_for(transformed)

        exp_obs = None
        if self.expectations:
            from transforms_for_apache_kafka_connect_spark.streaming.expectations import (
                apply_expectations,
            )

            updates, exp_obs = apply_expectations(
                updates, self.expectations,
                obs_name=f"exp_{self.epoch}_{batch_id}",
            )

        # source DataFrame behind each observation, for the explicit
        # fallback below (obs_pre watches the pre-chain rows INCLUDING
        # ones the winner machinery later drops)
        obs_src = {id(obs): transformed}
        if obs_pre is not None:
            obs_src[id(obs_pre)] = filtered

        def _explicit_first_error(o):
            """A pruned/empty-update observation proves nothing about
            per-record errors: errored rows (e.g. fail-mode tombstones)
            are dropped BEFORE the update set, so an all-errored batch
            has n_updates == 0 and an eliminated metrics node. Pay one
            explicit reduced job over the observation's source on this
            rare path — it is the only way to distinguish 'verifiably
            empty' from 'everything errored'."""
            return (
                obs_src[id(o)].agg(F.max(F.col(ERROR_COL))).first()[0]
            )

        def check_errors(n_updates=None):
            """Error gate run as the merge's pre_commit (n_updates =
            update-row count the merge saw; None = unknown/dense mode).

            When metric retrieval fails with the empty-batch signature
            (n_updates == 0, or the pruned-CollectMetrics signature —
            AQE eliminated the observed subtree) the gate does NOT
            assume no errors: it re-checks explicitly via
            _explicit_first_error. Any other failure (JVM/py4j error,
            unknown count) re-raises so an errored batch can never
            silently commit."""
            from transforms_for_apache_kafka_connect_spark.streaming.sink import (
                observation_pruned,
            )

            def metrics_of(o) -> dict:
                try:
                    return o.get
                except Exception as exc:
                    if n_updates == 0 or observation_pruned(exc):
                        err = _explicit_first_error(o)
                        if err is not None:
                            raise DataException(err) from None
                        return {}
                    raise

            if obs_pre is not None:
                pre_metrics = metrics_of(obs_pre)
                if pre_metrics.get("first_error") is not None:
                    raise DataException(pre_metrics["first_error"])
            metrics = metrics_of(obs)
            if metrics.get("first_error") is not None:
                raise DataException(metrics["first_error"])

        dlq_written = {"n": 0}

        def quarantine_errors(n_updates=None):
            """DLQ-mode pre_commit: never raises — errored records are
            written (JSON envelope + message) to
            dlq_dir/epoch=../batch_id=.. with mode=overwrite, so a
            replayed batch rewrites the same quarantine idempotently.
            The extra job runs only when the observations actually saw
            an error."""

            def first_error_of(o) -> bool:
                from transforms_for_apache_kafka_connect_spark.streaming.sink import (
                    observation_pruned,
                )

                try:
                    return o.get.get("first_error") is not None
                except Exception as exc:
                    # the metrics node only disappears when the observed
                    # subtree was eliminated as empty (statically, or by
                    # AQE at runtime — observation_pruned matches that
                    # exact signature) — a batch WITH rows (errored or
                    # not) keeps its CollectMetrics and o.get succeeds.
                    # The empty signature alone proves nothing: an
                    # all-errored batch also has zero updates and a
                    # pruned node — re-check explicitly so quarantine
                    # rows are never silently dropped. (Re-raising
                    # blindly instead would wedge a streaming query in
                    # a permanent replay loop on truly empty batches.)
                    if n_updates == 0 or observation_pruned(exc):
                        return _explicit_first_error(o) is not None
                    raise

            has_err = any(
                first_error_of(o) for o in (obs_pre, obs) if o is not None
            )
            if not has_err:
                return
            import os as _os

            errored = None
            for src in dlq_sources:
                part = self._dlq_serialize(
                    src.filter(F.col(ERROR_COL).isNotNull())
                )
                errored = part if errored is None else errored.unionByName(part)
            path = _os.path.join(
                self.dlq_dir, f"epoch={self.epoch}", f"batch_id={batch_id}"
            )
            errored.write.mode("overwrite").parquet(path)
            dlq_written["n"] = (
                errored.sparkSession.read.parquet(path).count()
            )

        exp_counts: dict = {}

        def check_expectations(n_updates=None):
            """Expectation gate (composed after the error gate): fail
            actions abort the batch pre-commit; drop/warn counts are
            collected for the result. A verifiably-empty update set
            (n_updates == 0 or AQE-pruned metrics node) has nothing to
            violate."""
            if exp_obs is None:
                return
            from transforms_for_apache_kafka_connect_spark.streaming.sink import (
                observation_pruned,
            )

            try:
                counts = exp_obs.get
            except Exception as exc:
                if n_updates == 0 or observation_pruned(exc):
                    return
                raise
            for e in self.expectations:
                n = int(counts.get(e.name) or 0)
                if not n:
                    continue
                exp_counts[e.name] = n
                if e.action == "fail":
                    raise DataException(
                        f"expectation '{e.name}' ({e.expr}) violated "
                        f"by {n} row(s)"
                    )
                if e.action == "warn":
                    _log.warning(
                        "expectation %r violated by %s row(s) in batch %s",
                        e.name, n, batch_id,
                    )

        base_gate = (
            quarantine_errors if self.error_mode == "dlq" else check_errors
        )

        def gate(n_updates=None):
            base_gate(n_updates)
            check_expectations(n_updates)

        merge_kwargs = {}
        if manifest_extra:
            merge_kwargs["manifest_extra"] = manifest_extra
        if not self.publish:
            merge_kwargs["publish"] = False
        result = self.table.merge(
            updates,
            epoch=self.epoch,
            batch_id=batch_id,
            pre_commit=gate,
            **merge_kwargs,
        )
        result["batch_id"] = batch_id
        if exp_counts:
            result["expectation_violations"] = dict(exp_counts)
        if self.error_mode == "dlq" and dlq_written["n"]:
            result["n_dlq"] = dlq_written["n"]
        try:
            result["n_chain_out"] = obs.get["n_out"]
        except Exception as e:  # metrics are advisory here, but don't hide it
            _log.warning("n_chain_out unavailable for batch %s: %s", batch_id, e)
        # transform-level metrics (drop counters from observe_name stages)
        metrics = {}
        for stage in self.chain.stages:
            name = getattr(stage, "observe_name", None)
            last = getattr(stage, "last_observation", None)
            if name and last is not None:
                try:
                    metrics[name] = dict(last.get)
                except Exception as e:
                    _log.warning(
                        "transform metric %r unavailable for batch %s: %s",
                        name, batch_id, e,
                    )
        if metrics:
            result["transform_metrics"] = metrics
        self._run_maintenance(batch.sparkSession, batch_id)
        if self.track_gaps is not None:
            # advance AFTER the commit (its own ledger dedupes replays;
            # the committed-skip path above repairs a crash in between)
            self.track_gaps.advance(
                batch.sparkSession, batch,
                epoch=self.epoch, batch_id=batch_id,
            )
            if gaps_n is not None:
                result["gap_anomalies"] = int(gaps_n)
        self._fire_on_commit(result)
        return result

    def _fire_on_commit(self, result: dict) -> None:
        if self.on_commit and self.publish:
            for hook in self.on_commit:
                hook(result)

    def replay(
        self,
        events: DataFrame,
        *,
        batch_width: int,
        max_pos: int,
        start_pos: int = 0,
        slice_col: str = "timestamp",
    ) -> list[dict]:
        """Replay ``events`` in deterministic position-range batches.

        ``slice_col`` must be monotone with LSN and non-null for every
        record INCLUDING tombstones — the envelope ``timestamp`` is
        (tombstone records have value IS NULL, hence no value.lsn).
        """
        results = []
        batch_id = 0
        lo = start_pos
        while lo < max_pos:
            hi = min(lo + batch_width, max_pos)
            batch = events.filter(
                (F.col(slice_col) >= lo) & (F.col(slice_col) < hi)
            )
            results.append(self.apply_batch(batch, batch_id))
            if (
                self.compact_every
                and not results[-1].get("skipped")
                and (batch_id + 1) % self.compact_every == 0
            ):
                from transforms_for_apache_kafka_connect_spark.errors import (
                    CommitConflictException,
                )

                try:
                    self.table.compact(
                        batch.sparkSession,
                        max_files_per_bucket=self.compact_max_files_per_bucket,
                    )
                except CommitConflictException:
                    # another writer landed in the buckets being folded:
                    # compaction is amortized maintenance, never worth
                    # failing the ingest loop over — the next interval
                    # retries against fresher state
                    _log.warning(
                        "auto-compaction skipped after commit conflict "
                        "on %s (batch %s)", self.table.root, batch_id,
                    )
            batch_id += 1
            lo = hi
        return results

    def stream(
        self,
        events: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int = 10,
        available_now: bool = False,
        raw_json: bool = False,
        key_schema=None,
        value_schema=None,
        suppress_stale_ms: int | None = None,
        # new keyword args strictly AFTER the pre-existing ones so
        # positional callers of the old signature keep working
        raw_format: str | None = None,
        confluent_framing: bool = False,
        writer_schemas: dict | None = None,
        key_fields: list[str] | None = None,
    ):
        """Structured Streaming entry: same apply_batch via foreachBatch.

        ``events`` must be a streaming DataFrame with the envelope
        schema — or, with ``raw_format="json"`` (back-compat spelling
        ``raw_json=True``) / ``raw_format="avro"``, a raw stream of
        converter bytes (``key``/``value`` columns) that is passed
        through the matching converter boundary first; ``value_schema``
        (and usually ``key_schema``) are then required, since a stream
        cannot be sampled for inference — DDL/StructType for JSON,
        Avro JSON for Avro (``confluent_framing`` strips the registry
        wire frame). Exactly-once = Spark's checkpoint (source
        offsets) + our ledger (idempotent re-application of replayed
        batch ids — the double-bookkeeping that makes foreachBatch
        exactly-once instead of at-least-once). ``available_now=True``
        drains what exists and stops (backfill mode).
        """
        events = prepare_stream_events(
            events,
            raw_format=raw_format,
            raw_json=raw_json,
            key_schema=key_schema,
            value_schema=value_schema,
            confluent_framing=confluent_framing,
            writer_schemas=writer_schemas,
            suppress_stale_ms=suppress_stale_ms,
            key_fields=key_fields,
        )
        from transforms_for_apache_kafka_connect_spark.streaming.writers import (
            start_foreach_batch,
        )

        return start_foreach_batch(
            events, lambda df, bid: self.apply_batch(df, bid),
            checkpoint_dir, available_now=available_now,
            trigger_seconds=trigger_seconds,
        )
