"""Physical topic routing — the engine's analog of Kafka Connect's
source-bound chains landing records in different topics.

In the reference, ExtractTopic / ExtractTopicFromSchemaName /
RegexRouter rewrite ``record.topic`` and the Connect runtime then
physically routes the record to that Kafka topic (reference
IntegrationTest.java:174-183, 288-301 asserts per-topic offsets).
Here the SMT chain rewrites the ``topic`` column and this writer makes
the routing physical: one partitioned directory (or one foreachBatch
fan-out) per topic value.

Scale shape: ``partitionBy("topic")`` is a single write job — each
task appends to the directories of the topics it holds; no shuffle
unless ``repartition_by_topic`` is requested (useful when a downstream
consumer wants one file per topic per batch).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from dataclasses import field as dataclass_field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)


def route_write(
    df: DataFrame,
    root: str,
    *,
    fmt: str = "parquet",
    mode: str = "append",
    repartition_by_topic: bool = False,
    flatten_value: bool = True,
) -> list[str]:
    """Write an envelope batch fanned out by ``topic``; returns the
    topics written.

    ``flatten_value=True`` writes ``topic`` + the value struct's fields
    as columns (what a per-topic consumer expects); otherwise the raw
    envelope row is written.
    """
    if flatten_value and "value" in df.columns:
        envelope_cols = ("topic", "timestamp", "key")
        value_fields = [f.name for f in df.schema["value"].dataType.fields]
        # a value field named topic/timestamp/key would collide with the
        # envelope columns after flattening — prefix it instead of
        # failing the write with a duplicate-column error
        out = df.select(
            *envelope_cols,
            *[
                F.col(f"value.{f}").alias(
                    f"value_{f}" if f in envelope_cols else f
                )
                for f in value_fields
            ],
        )
    else:
        out = df
    if repartition_by_topic:
        out = out.repartition(F.col("topic"))
    # the topic list rides on the write job via an Observation —
    # re-running the input for a distinct() would pay a second full job
    from pyspark.sql import Observation

    obs = Observation("route_topics")
    out = out.observe(obs, F.collect_set("topic").alias("topics"))
    (
        out.write.mode(mode)
        .partitionBy("topic")
        .format(fmt)
        .save(root)
    )
    # a zero-row batch completes the observation with an empty set (no
    # exception), so a failure here is a real metric-retrieval error —
    # returning [] would misreport a committed write as "no topics"
    return sorted(obs.get["topics"])


def _topic_dir(topic: str) -> str:
    """Reversible, filesystem-safe directory name for a topic value
    (percent-encoding — two distinct topics can never collide).

    ``quote`` leaves '.' bare, so the path-traversal names '.' and
    '..' (which would resolve to the router root / its PARENT and let
    a data-derived topic write outside the root) get their dots
    explicitly encoded — still reversible via unquote. Empty topics
    are rejected outright (no directory name can round-trip them)."""
    from urllib.parse import quote

    if topic == "":
        raise ValueError("empty topic cannot be routed to a table")
    q = quote(topic, safe="")
    if q in (".", ".."):
        q = q.replace(".", "%2E")
    return q


@dataclass
class TopicTableRouter:
    """Route one change stream into one LakeTable PER TOPIC — the full
    Connect delivery model: the SMT chain rewrites ``record.topic``
    (ExtractTopic / RegexRouter / EventRouter) and the runtime then
    lands each record in the table of its final topic (reference
    IntegrationTest.java:174-183 asserts exactly this per-topic
    delivery; here 'topic' = one lake table under ``root/<topic>``).

    Semantics: the chain runs ONCE over the whole batch; rows are then
    fanned out by their post-chain ``topic`` and each slice goes
    through the standard Replayer machinery (LWW dedupe → merge →
    ledger) against its own table. Keys are scoped per topic, exactly
    like Kafka Connect sink tables.

    Exactly-once under crash/replay: each table carries its OWN
    (epoch, batch_id) ledger, so a crash between topic commits replays
    the batch and the already-committed tables skip idempotently —
    same contract as the single-table engine, per destination.

    Per-record errors abort ONLY the topic slices that contain them
    (each sub-Replayer enforces the batch-fail contract on its slice):
    every topic is ATTEMPTED regardless of earlier topics' failures,
    then one exception summarizing the failed topics is raised so the
    caller (or the streaming restart loop) replays the batch — the
    committed topics skip via their ledgers, only the failed ones
    re-run. A poison topic therefore never starves its siblings. In
    DLQ mode each topic quarantines under its own subdirectory of
    ``dlq_dir`` (a shared directory would let one topic's
    overwrite-idempotent batch dir clobber another's).

    A row whose post-chain topic is NULL has no destination: that is a
    chain bug, and the batch fails (no topic committed its slice of a
    NULL-topic batch id yet on first attempt — and on any replay the
    same DataException fires before the fan-out) rather than silently
    dropping rows the single-table engine would have merged.

    Scale shape: one chain evaluation, one persist of the transformed
    batch, one tiny distinct() on the topic column (O(#topics) rows to
    the driver), then #topics independent merges — each a bucketed
    merge over its own table, shuffling only that topic's rows.
    """

    root: str
    chain: object = None  # transforms Chain; None = identity
    epoch: str = "default"
    #: kwargs forwarded to every per-topic LakeTable
    table_opts: dict = dataclass_field(default_factory=dict)
    #: kwargs forwarded to every per-topic Replayer (dedupe knobs etc.)
    replayer_opts: dict = dataclass_field(default_factory=dict)
    #: run compact() on each batch's touched topic tables every K
    #: committed batches (0 = never) — the routed analog of
    #: Replayer.compact_every
    compact_every: int = 0
    compact_max_files_per_bucket: int = 8
    #: optional SequenceTracker (gaps.py) over the RAW batch — checked
    #: BEFORE the chain runs, because continuity is a property of the
    #: SOURCE transport: the chain splits one partition's offsets
    #: across destinations, so per-destination sequences are
    #: legitimately sparse and must NOT be checked. The watermark
    #: advances only after EVERY topic commits (a partially-failed
    #: batch re-checks identically on replay).
    track_gaps: object | None = None
    gaps_policy: str = "error"
    gaps_report_dir: str | None = None
    #: callables invoked with the batch result dict once EVERY topic of
    #: the batch has durably committed (same idempotence contract as
    #: Replayer.on_commit; never fired for a partially-failed batch —
    #: its committed topics replay-skip and the hook fires on the
    #: successful retry). Typical: a LakeCatalog over register_root.
    on_commit: list = dataclass_field(default_factory=list)

    def __post_init__(self):
        if self.gaps_policy not in ("error", "warn"):
            raise ValueError("gaps_policy must be 'error' or 'warn'")

    def _table(self, topic: str):
        from transforms_for_apache_kafka_connect_spark.streaming.sink import (
            LakeTable,
        )

        return LakeTable(
            os.path.join(self.root, _topic_dir(topic)), **self.table_opts
        )

    def table_for(self, topic: str):
        """The LakeTable a topic's records land in (read surface)."""
        return self._table(topic)

    def apply_batch(self, batch: DataFrame, batch_id: int) -> dict:
        """chain once → fan out by final topic → per-table replay."""
        from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
        from transforms_for_apache_kafka_connect_spark.record import (
            ensure_error_col,
        )
        from transforms_for_apache_kafka_connect_spark.streaming.engine import (
            Replayer,
        )

        from transforms_for_apache_kafka_connect_spark.errors import (
            DataException,
        )

        gaps_n = None
        if self.track_gaps is not None:
            already_done = self.track_gaps.table.committed(
                self.epoch, batch_id
            )
            if not already_done:
                # continuity on the RAW batch, against the
                # not-yet-advanced watermark (advance happens only
                # after every topic commits, so a replayed
                # partially-failed batch re-checks identically)
                rep_df = self.track_gaps.report(batch.sparkSession, batch)
                if self.gaps_report_dir:
                    out = os.path.join(
                        self.gaps_report_dir,
                        f"epoch={self.epoch}", f"batch_id={batch_id}",
                    )
                    rep_df.write.mode("overwrite").parquet(out)
                    gaps_n = batch.sparkSession.read.parquet(out).count()
                else:
                    gaps_n = rep_df.count()
                if gaps_n:
                    from transforms_for_apache_kafka_connect_spark.errors import (
                        DataException as _DE,
                    )

                    if self.gaps_policy == "error":
                        raise _DE(
                            f"sequence continuity violated: {gaps_n} "
                            f"anomalies in batch {batch_id} — no topic "
                            "slice applied; batch stays replayable"
                        )
                    _log.warning(
                        "sequence continuity: %s anomalies in batch %s "
                        "(gaps_policy='warn' — proceeding)",
                        gaps_n, batch_id,
                    )
        chain = self.chain if self.chain is not None else Chain([])
        transformed = chain.apply(ensure_error_col(batch)).persist()
        try:
            raw_topics = [
                r["topic"]
                for r in transformed.select("topic").distinct().collect()
            ]
            if any(t is None for t in raw_topics):
                raise DataException(
                    "rows with NULL topic cannot be routed to a table "
                    "(the chain must leave every record with a topic)"
                )
            results: dict[str, dict] = {}
            failures: dict[str, Exception] = {}
            for t in sorted(raw_topics):
                opts = dict(self.replayer_opts)
                if opts.get("dlq_dir"):
                    # per-topic quarantine: the DLQ batch dir is
                    # overwrite-idempotent per (epoch, batch), so two
                    # topics sharing one dir would clobber each other
                    opts["dlq_dir"] = os.path.join(
                        opts["dlq_dir"], _topic_dir(t)
                    )
                rep = Replayer(
                    table=self._table(t),
                    chain=Chain([]),  # already transformed; errors ride
                    epoch=self.epoch,  # the error column into the slice
                    **opts,
                )
                try:
                    results[t] = rep.apply_batch(
                        transformed.filter(F.col("topic") == t), batch_id
                    )
                except Exception as exc:  # isolate poison topics
                    failures[t] = exc
            result = {"batch_id": batch_id, "topics": results}
            metrics = {}
            for stage in getattr(chain, "stages", []):
                name = getattr(stage, "observe_name", None)
                last = getattr(stage, "last_observation", None)
                if name and last is not None:
                    try:
                        metrics[name] = dict(last.get)
                    except Exception:
                        pass  # advisory; per-record errors gate above
            if metrics:
                result["transform_metrics"] = metrics
            if failures:
                first = next(iter(sorted(failures)))
                raise DataException(
                    f"batch {batch_id}: {len(failures)} topic(s) failed "
                    f"({', '.join(sorted(failures))}); "
                    f"{len(results)} committed and will skip on replay"
                ) from failures[first]
            if self.track_gaps is not None:
                # every topic committed: advance exactly-once (its own
                # ledger makes replayed catch-ups no-ops)
                self.track_gaps.advance(
                    batch.sparkSession, batch,
                    epoch=self.epoch, batch_id=batch_id,
                )
                if gaps_n is not None:
                    result["gap_anomalies"] = int(gaps_n)
            for hook in self.on_commit:
                hook(result)
            return result
        finally:
            transformed.unpersist()

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
    ):
        """Structured Streaming entry: same per-topic apply_batch via
        foreachBatch (mirror of Replayer.stream, including the
        raw-JSON/raw-Avro converter boundaries and the stateful
        stale-LSN suppressor — all table-agnostic, run before the
        fan-out). Exactly-once = Spark's checkpoint (source offsets) +
        each topic table's OWN ledger — a batch replayed after a crash
        skips the topics it already committed and re-attempts the
        rest."""
        from transforms_for_apache_kafka_connect_spark.streaming.engine import (
            prepare_stream_events,
        )

        events = prepare_stream_events(
            events,
            raw_format=raw_format,
            raw_json=raw_json,
            key_schema=key_schema,
            value_schema=value_schema,
            confluent_framing=confluent_framing,
            writer_schemas=writer_schemas,
            suppress_stale_ms=suppress_stale_ms,
        )
        from transforms_for_apache_kafka_connect_spark.streaming.writers import (
            start_foreach_batch,
        )

        return start_foreach_batch(
            events, lambda df, bid: self.apply_batch(df, bid),
            checkpoint_dir, available_now=available_now,
            trigger_seconds=trigger_seconds,
        )

    def replay(
        self,
        events: DataFrame,
        *,
        batch_width: int,
        max_pos: int,
        start_pos: int = 0,
        slice_col: str = "timestamp",
    ) -> list[dict]:
        """Deterministic position-range batching (same contract as
        Replayer.replay), fanned out per topic; ``compact_every``
        compacts each batch's touched topic tables on the same cadence
        as the single-table engine."""
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
                and (batch_id + 1) % self.compact_every == 0
            ):
                for t, r in results[-1]["topics"].items():
                    if not r.get("skipped"):
                        self._table(t).compact(
                            events.sparkSession,
                            max_files_per_bucket=self.compact_max_files_per_bucket,
                        )
            batch_id += 1
            lo = hi
        return results
