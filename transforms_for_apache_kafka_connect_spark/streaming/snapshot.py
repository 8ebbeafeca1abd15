"""Incremental (chunked) snapshot: bootstrap a table from the source
WITHOUT pausing the incremental stream.

``Replayer.bootstrap`` (engine.py) is the classic initial-snapshot
shape: one consistent source read, an LSN fence, and it REFUSES a table
that already has commits. Real deployments often cannot take a single
consistent snapshot of a huge source, and cannot stop the stream while
one loads. The public solution is watermark-based chunked snapshotting
(the DBLog paper, Netflix; the same algorithm backs Debezium's
incremental snapshots): read the source one key-chunk at a time,
interleaved with live change events, and resolve the races per chunk.

DBLog's low/high watermark window exists because its chunk SELECT races
an asynchronous log writer. In this engine a chunk lands atomically
between applied batches, so the window reconciliation collapses to one
precondition, enforced here: **a chunk must be at least as fresh as
everything already applied** (``low_lsn`` — the source position the
chunk read is consistent with — must be >= the max applied event LSN,
checked against the manifest's per-batch lineage, driver-side). In
practice this is free: chunk reads are live reads of the source, and
the source's position only grows. With the precondition held:

* a key dead at ``low_lsn`` is absent from the chunk — a delete that
  collapsed with its insert inside one applied batch (which leaves NO
  changelog trace) cannot be resurrected, because every applied event
  is ≤ ``low_lsn`` and the chunk read reflects all of them;
* a key alive at ``low_lsn`` lands with ``_lsn = low_lsn``; later
  stream events (> ``low_lsn``) supersede it by ordinary ordered
  application.

A stale chunk (read below the applied position) is REFUSED loudly —
applying it could silently resurrect deletes or regress updates.

Chunks are ledgered one batch per chunk under a dedicated
``<epoch>#snap`` epoch: a crashed snapshot RESUMES by re-offering
chunks (committed ones are ledger no-ops), chunk ids never collide with
stream batch ids, and maintained aggregates/views fold each chunk
commit like any other batch (the chunk rows traverse the SMT chain,
expectations and error contract exactly like streamed events — Debezium
snapshot semantics).

Scale shape: nothing global — the freshness check reads the manifest
(driver-side, no job), each chunk is one ordinary ledgered merge, and
chunks are independent and restartable.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame

from transforms_for_apache_kafka_connect_spark.streaming.engine import Replayer


def _snap_epoch(epoch: str) -> str:
    return f"{epoch}#snap"


@dataclass
class IncrementalSnapshot:
    """Chunk-by-chunk bootstrap driver around a configured Replayer.

    The table must run with ``changelog=True`` so downstream maintained
    views see chunk commits as ordinary row-level changes."""

    replayer: Replayer

    def __post_init__(self):
        if not getattr(self.replayer.table, "changelog", False):
            raise ValueError(
                "incremental snapshot requires changelog=True on the "
                "table: chunk commits must be visible to downstream "
                "maintenance as row-level changes"
            )
        if not self.replayer.publish:
            raise ValueError("incremental snapshot requires publish=True")
        # chunk commits ride a dedicated epoch so chunk ids and stream
        # batch ids are independent ledger namespaces. Sequence-gap
        # tracking is stripped: chunk records all carry the chunk's ONE
        # read position, which is snapshot semantics, not a transport
        # anomaly — continuity applies to the live stream only
        self._snap = replace(
            self.replayer,
            epoch=_snap_epoch(self.replayer.epoch),
            track_gaps=None,
        )

    def applied_max_lsn(self) -> int | None:
        """Highest event LSN any committed batch has applied (manifest
        lineage, driver-side — no Spark job)."""
        lsns = [
            r["max_lsn"]
            for r in self.replayer.table.manifest().get("lineage", [])
            if r.get("max_lsn") is not None
        ]
        return max(lsns) if lsns else None

    def apply_chunk(
        self,
        chunk: DataFrame,
        *,
        chunk_id: int,
        low_lsn: int,
        topic: str = "snapshot",
    ) -> dict:
        """Land one source chunk (table-shaped: key + payload columns,
        ≤1 row per key, consistent with source position ``low_lsn``).
        Idempotent on ``chunk_id`` — a resumed snapshot re-offers every
        chunk and the ledger skips the committed ones. Raises if the
        chunk is STALE relative to what the table has already applied
        (see the module docstring for why that would be unsafe)."""
        table = self.replayer.table
        if table.committed(_snap_epoch(self.replayer.epoch), chunk_id):
            return self._snap.apply_batch(
                _empty_like_envelope(chunk, table, topic), chunk_id
            )
        applied = self.applied_max_lsn()
        if applied is not None and low_lsn < applied:
            raise ValueError(
                f"stale chunk: read at source position {low_lsn} but "
                f"events up to {applied} are already applied — a stale "
                "chunk could resurrect deleted keys or regress updates; "
                "re-read the chunk at the current source position"
            )
        from transforms_for_apache_kafka_connect_spark.sources.changestream import (
            snapshot_envelope,
        )

        env = snapshot_envelope(
            chunk, list(table.key_cols), lsn=low_lsn, topic=topic
        )
        r = self._snap.apply_batch(env, chunk_id)
        r["chunk_id"] = chunk_id
        return r

    def progress(self) -> list[int]:
        """Chunk ids already committed (the resume set)."""
        epoch = _snap_epoch(self.replayer.epoch)
        return sorted(
            b for e, b in self.replayer.table.manifest()["committed"]
            if e == epoch
        )


def hash_chunk(
    df: DataFrame, key_cols: list[str], n_chunks: int, chunk: int
) -> DataFrame:
    """Deterministic source chunking for the snapshot driver: rows
    whose key hashes into chunk ``chunk`` of ``n_chunks``. Hash
    chunking needs no range statistics, covers every key type, and
    yields uniform chunk sizes even on skewed key spaces — each chunk
    is one pushed-down filter over the source scan. (DBLog chunks by
    PK range because its sources are OLTP indexes; a lake/file source
    has no index to exploit, so uniformity wins.)"""
    from pyspark.sql import functions as F

    if not 0 <= chunk < n_chunks:
        raise ValueError(f"chunk must be in [0, {n_chunks}), got {chunk}")
    return df.filter(
        F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_chunks))
        == chunk
    )


def _empty_like_envelope(chunk: DataFrame, table, topic: str) -> DataFrame:
    """An empty envelope frame for the committed-skip path: apply_batch
    only needs the schema to run its maintenance catch-up."""
    from transforms_for_apache_kafka_connect_spark.sources.changestream import (
        snapshot_envelope,
    )

    return snapshot_envelope(
        chunk.limit(0), list(table.key_cols), lsn=0, topic=topic
    )
