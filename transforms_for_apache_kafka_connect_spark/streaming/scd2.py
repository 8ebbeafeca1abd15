"""SCD type-2 history from a CDC changelog, plus point-in-time reads.

The LWW lake sink (streaming/sink.py) keeps the CURRENT state of each
key — the type-1 answer. The other table every CDC consumer eventually
asks for is the type-2 one: every version each key ever had, with
[valid_from, valid_to) intervals, so "what did this row say when the
event happened" and "reconstruct the table as of T" are plain filters.

``scd2_history`` derives that table from the changelog in one pass:
a single hash exchange on the key, one sort per partition, and three
window expressions over the SAME (partition, order) frame — Catalyst
reuses the one sort for all of them, so the whole build costs exactly
what a groupBy over the changelog costs. No self-join, no per-row
Python. At 10^10 events this is one shuffle of the changelog, which is
the lower bound for any per-key ordered computation.

Delete semantics (matching the sink's tombstone contract,
sink.py merge rules / SURVEY.md §2.1 MakeTombstone+TombstoneHandler):
a delete event emits NO version row of its own but CLOSES the previous
version — its position becomes the predecessor's ``valid_to``. A key
whose last event is a delete therefore has no ``is_current`` row, same
as it has no row in the LWW table.

``as_of`` turns the history into the table state at any position —
the query-layer twin of ``LakeTable.read(version=...)`` (file-level
time travel): file-level suits replays from a known commit, SCD2 suits
arbitrary positions between commits.

``SCD2Table`` is the MAINTAINED variant: attach it to
``Replayer(maintain=[...])`` and the type-2 table stays consistent
with the base table per commit — without ever rescanning the
changelog. The trick that makes maintenance O(|batch|) with ZERO
state reads: a closed version is immutable, and every batch's
retraction rows already carry everything a closed version needs —
an ``update_preimage``/``delete`` changelog row holds the displaced
row's full payload, its ``_lsn`` (= the version's ``valid_from``) and
``_change_lsn`` (the LSN of the event that displaced it = the
version's ``valid_to``). So per commit the maintainer appends exactly
those rows to a ledgered lake table and does nothing else; OPEN
versions are never stored — they ARE the base table's current rows
(``valid_from = _lsn``, ``valid_to = NULL``), unioned in at read time.
Grain note: the changelog nets each batch (one winner per key), so
the maintained history is BATCH-grain — identical to running
``scd2_history`` over ``read_changelog()`` output, which is the
parity law the tests pin. Event-grain history of intra-batch
versions calls ``scd2_history`` on the raw stream instead.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["SCD2Table", "scd2_history", "as_of"]


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    *,
    op_col: str | None = None,
    delete_ops: Sequence[str] = ("d",),
) -> DataFrame:
    """Build the type-2 dimension from a changelog.

    ``changes``: one row per change event — key columns, a strictly
    increasing per-key ``order_col`` (LSN / event id; ties within a key
    are a data error upstream, resolve them before calling), an
    optional ``op_col`` marking deletes, and any payload columns.

    Returns every surviving version with:

    * ``valid_from`` — the event's own position (inclusive),
    * ``valid_to`` — the NEXT event's position for that key
      (exclusive), NULL for the open current version,
    * ``is_current`` — ``valid_to IS NULL``,
    * ``version`` — 1-based per-key ordinal counting every event
      (deletes included, so version numbers align with the changelog
      even though delete rows themselves are dropped).
    """
    key_cols = list(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    payload = [
        c
        for c in changes.columns
        if c not in set(key_cols) and c != order_col and c != op_col
    ]
    out = changes.select(
        *key_cols,
        *payload,
        F.col(order_col).alias("valid_from"),
        F.lead(F.col(order_col)).over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
        *( [F.col(op_col).alias("__op")] if op_col else [] ),
    )
    if op_col:
        out = out.filter(~F.col("__op").isin(list(delete_ops))).drop("__op")
    return out.withColumn("is_current", F.col("valid_to").isNull())


def as_of(history: DataFrame, position: Column | int | float | str) -> DataFrame:
    """Table state at ``position`` from an ``scd2_history`` output:
    the version whose [valid_from, valid_to) interval contains it.
    A plain filter — with the history stored sorted/zone-mapped on
    ``valid_from`` this prunes to the matching file slice.
    """
    pos = position if isinstance(position, Column) else F.lit(position)
    return history.filter(
        (F.col("valid_from") <= pos)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > pos))
    ).drop("is_current")


@dataclass
class SCD2Table:
    """Changelog-maintained SCD type-2 history (module docstring).

    ``root`` holds a ``LakeTable`` of CLOSED versions keyed by
    ``(key_cols..., valid_from)`` — append-only in practice (a closed
    version never changes), ledgered per source batch for exactly-once
    under crash/replay. Attach to ``Replayer(maintain=[...])`` (the
    general maintenance protocol: ``apply_changes`` is called with each
    committed batch's changelog).

    Scale shape: maintenance is one filter over the batch-sized
    changelog plus one ledgered merge — no join, no window, no read of
    the history or the base table. At 10^10 events the history table
    grows with the number of REPLACED versions, and each commit touches
    only the buckets its closed versions hash to. Time-slice reads
    (``as_of``) prune via zone maps once the table is compacted with
    ``sort_cols=["valid_from"]``.
    """

    root: str
    key_cols: list[str]
    n_buckets: int = 16
    table: "LakeTable" = field(init=False)

    def __post_init__(self):
        from transforms_for_apache_kafka_connect_spark.streaming.sink import (
            LakeTable,
        )

        if not self.key_cols:
            raise ValueError("key_cols must be non-empty")
        self.table = LakeTable(
            os.path.join(self.root, "closed"),
            key_cols=[*self.key_cols, "valid_from"],
            n_buckets=self.n_buckets,
            discovery=False,
            merge_strategy="broadcast",
        )

    @staticmethod
    def closed_versions(changes: DataFrame) -> DataFrame:
        """One batch's changelog -> the closed-version rows it implies
        (pure filter + projection — the plan audit pins that this
        carries no join/window/aggregate, which is what keeps type-2
        maintenance O(batch))."""
        drop = {"_change_type", "_change_lsn", "_lsn", "epoch", "batch_id"}
        return (
            changes.filter(
                F.col("_change_type").isin("update_preimage", "delete")
            )
            .select(
                *[c for c in changes.columns if c not in drop],
                F.col("_lsn").alias("valid_from"),
                F.col("_change_lsn").alias("valid_to"),
                # closed versions are upserts, never tombstones
                F.lit(False).alias("__is_delete"),
            )
        )

    def apply_changes(
        self, changes: DataFrame, *, epoch: str, batch_id: int
    ) -> dict:
        """Fold one committed batch's changelog in: every retraction
        row (update_preimage / delete) IS a closed version — payload +
        ``_lsn``→``valid_from`` + ``_change_lsn``→``valid_to``. An
        empty batch (pure inserts) still writes a ledger entry, so
        replay skips it exactly-once like any other."""
        return self.table.merge(
            self.closed_versions(changes), epoch=epoch, batch_id=batch_id
        )

    def read(
        self,
        spark: SparkSession,
        base: "LakeTable",
        *,
        with_versions: bool = False,
    ) -> DataFrame:
        """The full type-2 history: closed versions from this table ∪
        the base table's current rows as open versions (``valid_to``
        NULL, ``is_current`` true). ``base`` must be the LakeTable this
        maintainer was replayed alongside.

        ``with_versions=True`` adds a per-key 1-based ``version``
        ordinal over ``valid_from`` (one window pass over the history —
        pay it only when asked). NOTE: the ordinal is DENSE over
        surviving versions; ``scd2_history``'s ``version`` counts every
        changelog event including deletes, so the two numberings
        diverge for keys that were deleted and re-inserted (intervals,
        payloads and ``is_current`` always agree — that is the
        parity law tests/test_scd2.py pins).
        """
        closed = self.table.read(spark)
        open_ = base.read(spark).select(
            *[c for c in closed.columns if c not in ("valid_from", "valid_to")],
            F.col("_lsn").alias("valid_from"),
            F.lit(None).cast("long").alias("valid_to"),
        )
        # base rows carry _lsn as a payload column too (closed rows do
        # not): align on the closed schema + interval columns
        out = (
            closed.withColumn("is_current", F.lit(False))
            .unionByName(open_.withColumn("is_current", F.lit(True)))
        )
        if with_versions:
            w = Window.partitionBy(*self.key_cols).orderBy(
                F.col("valid_from").asc()
            )
            out = out.withColumn("version", F.row_number().over(w))
        return out
