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
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["scd2_history", "as_of"]


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
