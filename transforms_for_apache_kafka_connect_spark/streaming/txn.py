"""Multi-table transactional apply — tx-boundary-atomic CDC delivery.

A binlog/WAL transaction usually touches SEVERAL tables (Debezium
emits one topic per table plus transaction-boundary metadata; its
docs call consuming them together "buffering until the transaction's
end event"). ``TopicTableRouter`` (router.py) delivers per-topic
exactly-once but commits each table INDEPENDENTLY: a reader joining
two of its tables mid-batch — or after a crash between two per-topic
commits — observes one table with the batch applied and the other
without, i.e. a torn transaction.

``TransactionalRouter`` closes that gap with the classic two-phase
write the lake layer already supports:

1. **Stage** every topic's merge with write-audit-publish
   (``merge(publish=False)`` via ``Replayer(publish=False)``): data
   files + staged manifests are fully written, nothing is visible.
   ANY per-record error aborts the whole batch — no table published,
   unlike the router's per-topic isolation (atomicity is the point).
2. **Decide**: one atomic rename publishes the decision record
   ``_txn/<epoch>-<batch_id>.json`` (status ``commit`` + the staged
   tokens). This is the commit point — presumed abort before it,
   roll-forward after it (textbook presumed-abort 2PC with the
   coordinator log on the table filesystem; no prepare round-trip is
   needed because the participants are our own staged manifests).
3. **Publish** each staged token (the sink's optimistic
   ``publish()``), then mark the decision ``done`` and advance the
   ``_txn/LAST`` snapshot pointer — a carried-forward
   ``{topic: version}`` map.

Crash anywhere:

- before the decision record → nothing is visible; replaying the
  batch re-stages (orphaned staged files are vacuumable), commits.
- after the decision record → ``recover()`` (or the replay path) rolls
  the publishes forward idempotently: a token whose staged manifest is
  gone but whose (epoch, batch_id) is in the table ledger was already
  published by the crashed attempt and is adopted.

Read surfaces:

- ``table_for(topic).read(spark)`` — read-committed per table (a
  concurrent reader may see table A's publish before B's for a few
  milliseconds while step 3 walks the topics).
- ``snapshot()`` / ``read_consistent(spark, topic)`` — cross-table
  SNAPSHOT isolation: the version map only advances after EVERY table
  of a transaction batch is live, so a reader pinning its joins to one
  ``snapshot()`` can never observe a torn transaction, crash or not.
  (Same idea as multi-table transactions through an Iceberg catalog:
  visibility = one atomic pointer swap over per-table versions.)

Scale shape: identical to TopicTableRouter — one chain evaluation,
one persist, #topics independent bucketed merges; the transaction
machinery adds only driver-side manifest/JSON work (no extra Spark
job), so it costs the same at 10^10 events as at 10^4. Reference
parity note: Kafka Connect itself offers no cross-topic atomicity —
this is engine-level capability the north_star's "idempotent commit
sequencing" asks us to extend to the multi-table delivery model.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from dataclasses import field as dataclass_field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.errors import DataException
from transforms_for_apache_kafka_connect_spark.streaming.router import _topic_dir


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


@dataclass
class TransactionalRouter:
    """Route one change-stream batch into one LakeTable per topic,
    committed atomically across ALL topics (see module docstring)."""

    root: str
    chain: object = None  # transforms Chain; None = identity
    epoch: str = "default"
    table_opts: dict = dataclass_field(default_factory=dict)
    replayer_opts: dict = dataclass_field(default_factory=dict)
    #: callables invoked with the batch result dict AFTER the whole
    #: transaction is live (decision rolled forward, snapshot pointer
    #: advanced) — a LakeCatalog here keeps register_snapshot views
    #: tracking ingest with cross-table consistency per refresh
    on_commit: list = dataclass_field(default_factory=list)

    def __post_init__(self):
        os.makedirs(self._txn_dir, exist_ok=True)
        if self.replayer_opts.get("error_mode") == "dlq":
            # DLQ mode quarantines per-record errors and commits the
            # rest — legal under atomicity (the quarantine write is
            # idempotent per (epoch, batch) and replays rewrite it),
            # but each topic needs its own quarantine dir exactly as
            # in router.py
            if not self.replayer_opts.get("dlq_dir"):
                raise ValueError("error_mode='dlq' requires dlq_dir")

    # ------------------------------------------------------------ paths

    @property
    def _txn_dir(self) -> str:
        return os.path.join(self.root, "_txn")

    def _decision_path(self, batch_id: int) -> str:
        return os.path.join(self._txn_dir, f"{self.epoch}-{batch_id}.json")

    @property
    def _last_path(self) -> str:
        return os.path.join(self._txn_dir, "LAST")

    def _read_json(self, path: str) -> dict | None:
        try:
            with open(path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    # ------------------------------------------------------------ tables

    def _table(self, topic: str):
        from transforms_for_apache_kafka_connect_spark.streaming.sink import (
            LakeTable,
        )

        return LakeTable(
            os.path.join(self.root, _topic_dir(topic)), **self.table_opts
        )

    def table_for(self, topic: str):
        """Read-committed surface for one topic's table."""
        return self._table(topic)

    # ------------------------------------------------------------ write

    def apply_batch(self, batch: DataFrame, batch_id: int) -> dict:
        """Stage every topic's merge, write the commit decision, then
        publish all — exactly-once on (epoch, batch_id), atomic across
        topics. Idempotent under replay at every crash point."""
        from transforms_for_apache_kafka_connect_spark.plans.chain import Chain
        from transforms_for_apache_kafka_connect_spark.record import (
            ensure_error_col,
        )
        from transforms_for_apache_kafka_connect_spark.streaming.engine import (
            Replayer,
        )

        decision = self._read_json(self._decision_path(batch_id))
        if decision is not None:
            if decision["status"] != "done":
                # crashed after the commit point: roll forward first —
                # the transaction becomes VISIBLE here, so on_commit
                # hooks must fire (a catalog wired via register_snapshot
                # would otherwise stay stale until some later batch)
                versions = self._roll_forward(decision)
                result = {
                    "skipped": True,
                    "batch_id": batch_id,
                    "topics": sorted(decision.get("tokens", {})),
                    "versions": versions,
                }
                for hook in self.on_commit:
                    hook(result)
                return result
            return {"skipped": True, "batch_id": batch_id}

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
            tokens: dict[str, str] = {}
            already: list[str] = []
            for t in sorted(raw_topics):
                table = self._table(t)
                if table.committed(self.epoch, batch_id):
                    # a previous attempt's roll-forward published this
                    # topic before crashing pre-"done"; adopted as-is
                    already.append(t)
                    continue
                opts = dict(self.replayer_opts)
                if opts.get("dlq_dir"):
                    opts["dlq_dir"] = os.path.join(
                        opts["dlq_dir"], _topic_dir(t)
                    )
                rep = Replayer(
                    table=table,
                    chain=Chain([]),  # already transformed; errors ride
                    epoch=self.epoch,  # the error column into the slice
                    publish=False,
                    **opts,
                )
                # ANY failure here (per-record error in fail mode,
                # expectation, schema enforcement) propagates: no
                # decision record exists yet, so the whole transaction
                # is presumed aborted — zero topics become visible
                res = rep.apply_batch(
                    transformed.filter(F.col("topic") == t), batch_id
                )
                tokens[t] = res["staged"]
            decision = {
                "status": "commit",
                "epoch": self.epoch,
                "batch_id": batch_id,
                "tokens": tokens,
                "adopted": already,
            }
            # THE commit point: one atomic rename
            _atomic_write_json(self._decision_path(batch_id), decision)
            versions = self._roll_forward(decision)
            result = {
                "batch_id": batch_id,
                "topics": sorted(set(tokens) | set(already)),
                "versions": versions,
            }
            for hook in self.on_commit:
                hook(result)
            return result
        finally:
            transformed.unpersist()

    def _roll_forward(self, decision: dict) -> dict[str, int]:
        """Publish every staged token of a committed decision (idempotent),
        then mark the decision done and advance the snapshot pointer."""
        batch_id = decision["batch_id"]
        versions: dict[str, int] = dict(decision.get("versions") or {})
        for t, token in sorted(decision["tokens"].items()):
            table = self._table(t)
            staged_path = os.path.join(
                table.root, "_manifest", f"{token}.json"
            )
            if not os.path.exists(staged_path):
                # already published (crash between publish and "done")
                if not table.committed(self.epoch, batch_id):
                    raise DataException(
                        f"transaction {self.epoch}/{batch_id}: staged "
                        f"token for topic {t!r} vanished without its "
                        f"batch reaching the ledger — manual repair "
                        f"needed (was the table vacuumed mid-commit?)"
                    )
                versions[t] = self._ledger_version(table, batch_id)
                continue
            pub = table.publish(token)
            versions[t] = pub["version"]
        for t in decision.get("adopted", []):
            versions[t] = self._ledger_version(self._table(t), batch_id)
        done = dict(decision)
        done["status"] = "done"
        done["versions"] = versions
        _atomic_write_json(self._decision_path(batch_id), done)
        self._advance_last(batch_id, versions)
        return versions

    def _ledger_version(self, table, batch_id: int) -> int:
        """Earliest live version whose ledger contains (epoch, batch_id)
        — the version this transaction's publish created (later commits
        carry the entry forward, so walk up from the oldest)."""
        m = table.manifest()
        for v in range(1, m["version"] + 1):
            p = table._manifest_path(v)
            if not os.path.exists(p):
                continue
            with open(p) as f:
                mv = json.load(f)
            if [self.epoch, batch_id] in mv["committed"]:
                return v
        raise DataException(
            f"ledger says {self.epoch}/{batch_id} committed but no live "
            f"manifest carries it (vacuumed beyond the txn log?)"
        )

    def _advance_last(self, batch_id: int, versions: dict[str, int]) -> None:
        """Carry the snapshot pointer forward: topics untouched by this
        transaction keep their previous pinned version."""
        prev = self._read_json(self._last_path) or {"versions": {}}
        if prev.get("batch_id") is not None and prev["batch_id"] >= batch_id:
            # replay of an older batch after a newer one advanced the
            # pointer (ledger-skip path): never move the snapshot back
            return
        merged = dict(prev["versions"])
        merged.update(versions)
        _atomic_write_json(
            self._last_path,
            {"epoch": self.epoch, "batch_id": batch_id, "versions": merged},
        )

    # ------------------------------------------------------------ recover

    def recover(self) -> dict:
        """Finish every decided-but-unpublished transaction (crash
        recovery for a coordinator that died after its commit point).
        Undecided staged manifests are presumed aborted and left for
        ``vacuum``. Returns {batch_id: versions} for each rolled
        transaction."""
        rolled: dict[int, dict[str, int]] = {}
        for fn in sorted(os.listdir(self._txn_dir)):
            if fn == "LAST" or not fn.endswith(".json"):
                continue
            d = self._read_json(os.path.join(self._txn_dir, fn))
            if d and d.get("status") == "commit" and d.get("epoch") == self.epoch:
                rolled[d["batch_id"]] = self._roll_forward(d)
                # same visibility rule as the replay path: a recovery
                # that publishes a transaction fires the hooks
                result = {
                    "skipped": True,
                    "batch_id": d["batch_id"],
                    "topics": sorted(d.get("tokens", {})),
                    "versions": rolled[d["batch_id"]],
                }
                for hook in self.on_commit:
                    hook(result)
        return {"rolled_forward": rolled}

    # ------------------------------------------------------------ read

    def snapshot(self) -> dict[str, int]:
        """{topic: version} of the last fully-published transaction —
        the cross-table consistent view."""
        last = self._read_json(self._last_path)
        return dict(last["versions"]) if last else {}

    def read_consistent(self, spark: SparkSession, topic: str) -> DataFrame:
        """Read one topic's table pinned at the consistent snapshot:
        joins across topics read with this never see a torn
        transaction. Raises KeyError for a topic no completed
        transaction has touched."""
        snap = self.snapshot()
        return self._table(topic).read(spark, version=snap[topic])

    def stream(
        self,
        events: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int = 10,
        available_now: bool = False,
        **prepare_kwargs,
    ):
        """Structured Streaming entry: each micro-batch is one
        cross-table transaction via foreachBatch (same converter
        boundaries as TopicTableRouter.stream — raw_json/raw_format/
        key_schema/value_schema/... ride ``prepare_kwargs``).
        Exactly-once = Spark's checkpoint (source offsets) + the
        transaction log: a batch replayed after a crash either
        re-stages from scratch (no decision yet) or rolls the decided
        publish forward — never half-applies."""
        from transforms_for_apache_kafka_connect_spark.streaming.engine import (
            prepare_stream_events,
        )

        from transforms_for_apache_kafka_connect_spark.streaming.writers import (
            start_foreach_batch,
        )

        events = prepare_stream_events(events, **prepare_kwargs)
        return start_foreach_batch(
            events, lambda df, bid: self.apply_batch(df, bid),
            checkpoint_dir, available_now=available_now,
            trigger_seconds=trigger_seconds,
        )

    def vacuum(self, **vacuum_kwargs) -> dict:
        """Transaction-safe garbage collection: roll every DECIDED
        transaction forward first (recover()), so the only staged
        manifests left in participant tables are presumed-abort
        leftovers — then vacuum each table with ``drop_staged=True``
        to reclaim them. Never run concurrently with apply_batch
        (single-coordinator contract, same as LakeTable's
        single-writer rule)."""
        recovered = self.recover()
        # the LAST snapshot's per-table versions are a live read surface
        # (read_consistent time-travels to them) — pin each against the
        # retention window, or out-of-band maintenance commits (compact,
        # rescale) could expire the manifest a snapshot reader needs
        snap = self.snapshot()
        per_table: dict[str, dict] = {}
        for d in sorted(os.listdir(self.root)):
            if d == "_txn":
                continue
            table_root = os.path.join(self.root, d)
            if not os.path.isdir(os.path.join(table_root, "_manifest")):
                continue
            from transforms_for_apache_kafka_connect_spark.streaming.router import (
                _topic_dir,
            )
            from transforms_for_apache_kafka_connect_spark.streaming.sink import (
                LakeTable,
            )

            pinned = [
                v for t, v in snap.items() if _topic_dir(t) == d
            ]
            table = LakeTable(table_root, **self.table_opts)
            per_table[d] = table.vacuum(
                drop_staged=True, pin_versions=pinned, **vacuum_kwargs
            )
        return {**recovered, "tables": per_table}

    def replay(
        self,
        events: DataFrame,
        *,
        batch_width: int,
        max_pos: int,
        start_pos: int = 0,
        slice_col: str = "timestamp",
    ) -> list[dict]:
        """Deterministic position-range replay (engine.py contract),
        each batch one cross-table transaction."""
        results: list[dict] = []
        batch_id = 0
        lo = start_pos
        while lo < max_pos:
            hi = min(lo + batch_width, max_pos)
            batch = events.filter(
                (F.col(slice_col) >= lo) & (F.col(slice_col) < hi)
            )
            results.append(self.apply_batch(batch, batch_id))
            batch_id += 1
            lo = hi
        return results
