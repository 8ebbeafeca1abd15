"""Partial-column (patch) updates: sparse CDC events merged by overlay.

Whole-row CDC (Debezium's default) ships every column in each
post-image, and the engine's merge is correctly last-writer-wins at row
grain. Plenty of real feeds are SPARSE instead — MongoDB $set patches,
app-level "only the changed fields" topics, wide tables where producers
can't afford full rows. For those, row-grain LWW silently nulls every
column the last writer didn't mention. This module supplies the other
contract: per COLUMN, the last provided (non-NULL) value wins, deletes
clear the row, and unmentioned columns survive.

Semantics (per key, events ordered by LSN): apply each event in order —
``u`` overlays its non-NULL columns, ``d`` clears the row. Equivalently
(the form both the implementation and the SQL oracle use — the fold is
associative, so any batching of the stream composes to the same state):

* the row exists iff the LAST event is not a delete;
* column ``c`` = the value at the greatest LSN where ``c`` was
  provided, if that LSN is after the key's last delete — else NULL —
  else (no batch value and no delete in the batch) the CURRENT table
  value.

NULL means "not provided": a sparse source cannot set a column TO NULL
through patch semantics (the standard limitation — sources that need
explicit unset ship a sentinel or a whole-row image; document it on the
topic contract).

Scale shape: one aggregate over the batch (column-conditional
struct-max per payload column — a per-partition sort-aggregate, same
cost family as the non-unique-LSN LWW path), one bucket-pruned read of
the touched buckets joined against the folded key set (the same bounded
join the changelog capture already pays), then the ordinary ledgered
merge — so changelog capture, MoR, WAP and exactly-once all see full
post-image rows and need no changes. O(|batch| + touched buckets) per
commit, independent of table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.streaming.sink import (
    _bucket_expr,
    LakeTable,
)

__all__ = ["fold_sparse", "overlay_current", "patch_apply", "stream_patch_into"]


def fold_sparse(
    batch: DataFrame,
    key_cols: list[str],
    payload_fields: list[str] | None = None,
) -> DataFrame:
    """Envelope batch -> per-key column-folded update set.

    Output: key cols + payload cols (each the last-provided value after
    the key's last in-batch delete, NULL otherwise) + ``_lsn`` (the
    key's greatest LSN) + ``__is_delete`` (last event is a delete) +
    ``__had_delete`` (any in-batch delete — the overlay must NOT reach
    back to the table for such keys: the delete cleared it).
    """
    vdt = batch.schema["value"].dataType
    payload = [
        f.name
        for f in vdt["after"].dataType.fields
        if f.name not in set(key_cols)
    ]
    if payload_fields is not None:
        payload = [c for c in payload if c in set(payload_fields)]
    live = batch.filter(F.col("value").isNotNull())
    lsn = F.col("value.lsn")
    is_del = F.col("value.op") == "d"
    flat = live.select(
        *[F.col(f"key.{c}").alias(c) for c in key_cols],
        lsn.alias("__lsn"),
        is_del.alias("__d"),
        *[F.col(f"value.after.{c}").alias(c) for c in payload],
    )
    agg = flat.groupBy(*key_cols).agg(
        F.max("__lsn").alias("_lsn"),
        # struct-max orders by the leading lsn: the op at the key's
        # last event / the last provided value per column
        F.max(F.struct(F.col("__lsn"), F.col("__d")))["__d"]
        .alias("__is_delete"),
        F.max(F.when(F.col("__d"), F.col("__lsn"))).alias("__del_lsn"),
        *[
            e
            for c in payload
            for e in (
                F.max(
                    F.when(
                        ~F.col("__d") & F.col(c).isNotNull(),
                        F.struct(F.col("__lsn"), F.col(c).alias("v")),
                    )
                )["v"].alias(f"__v_{c}"),
                F.max(
                    F.when(
                        ~F.col("__d") & F.col(c).isNotNull(), F.col("__lsn")
                    )
                ).alias(f"__l_{c}"),
            )
        ],
    )
    return agg.select(
        *key_cols,
        *[
            F.when(
                F.col(f"__l_{c}") > F.coalesce(F.col("__del_lsn"), F.lit(-1)),
                F.col(f"__v_{c}"),
            ).alias(c)
            for c in payload
        ],
        "_lsn",
        "__is_delete",
        F.col("__del_lsn").isNotNull().alias("__had_delete"),
    )


def overlay_current(
    table: LakeTable, folded: DataFrame, spark: SparkSession
) -> DataFrame:
    """Fill each folded row's still-NULL payload columns from the
    table's current row for that key — except keys whose batch held a
    delete (the delete cleared the base; unprovided columns stay NULL)
    and delete rows themselves. Bucket-pruned: only the buckets the
    batch's keys hash to are read."""
    m = table.manifest()
    payload = [
        c for c in folded.columns
        if c not in set(table.key_cols)
        and c not in ("_lsn", "__is_delete", "__had_delete")
    ]
    if m["schema"] is None or not m["buckets"]:
        return folded.drop("__had_delete")
    touched = [
        r["__b"]
        for r in folded.select(
            _bucket_expr(list(table.key_cols), table.n_buckets).alias("__b")
        ).distinct().collect()
    ]
    live = [b for b in touched if str(b) in m["buckets"]]
    if not live:
        return folded.drop("__had_delete")
    old = table.read(spark, buckets=live).select(
        *table.key_cols,
        *[F.col(c).alias(f"__old_{c}") for c in payload
          if c in {f["name"] for f in m["schema"]["fields"]}],
    )
    j = folded.join(old, on=list(table.key_cols), how="left")
    return j.select(
        *table.key_cols,
        *[
            (
                F.when(
                    F.col("__is_delete") | F.col("__had_delete"), F.col(c)
                ).otherwise(
                    F.coalesce(F.col(c), F.col(f"__old_{c}"))
                ).alias(c)
                if f"__old_{c}" in j.columns
                else F.col(c).alias(c)
            )
            for c in payload
        ],
        "_lsn",
        "__is_delete",
    )


def patch_apply(
    table: LakeTable,
    batch: DataFrame,
    *,
    epoch: str,
    batch_id: int,
    payload_fields: list[str] | None = None,
) -> dict:
    """fold -> overlay -> ledgered merge: one committed batch of sparse
    updates applied with patch semantics, exactly-once under the
    table's (epoch, batch_id) ledger like any other merge. Run the SMT
    chain on ``batch`` first if one applies — the fold consumes the
    canonical envelope shape.

    The fold output feeds two jobs (overlay bucket discovery, then the
    merge), so it is persisted across them — same policy as the merge's
    own touched-bucket discovery; a replay of an already-committed
    batch short-circuits through the ledger BEFORE the overlay's eager
    discovery job runs."""
    committed = getattr(table, "committed", None)
    if committed is not None and committed(epoch, batch_id):
        return {"skipped": True, "batch_id": batch_id}
    folded = fold_sparse(batch, list(table.key_cols), payload_fields)
    folded.persist()
    try:
        upd = overlay_current(table, folded, batch.sparkSession)
        return table.merge(upd, epoch=epoch, batch_id=batch_id)
    finally:
        folded.unpersist()


def stream_patch_into(
    table: LakeTable,
    envelopes: DataFrame,
    checkpoint_dir: str,
    *,
    epoch: str = "patch",
    payload_fields: list[str] | None = None,
    available_now: bool = False,
    trigger_seconds: int = 10,
    prepare=None,
):
    """Maintain a patch-semantics table from a streaming envelope
    source: each micro-batch folds its sparse updates, overlays the
    touched buckets and merges under the table's ledger — redelivery
    after a crash/restart is a ledger no-op, same contract as the
    Replayer's streaming entry. ``prepare`` (optional) runs on the raw
    stream first (converter boundary / SMT chain).

    Per-batch ordering caveat (shared with every patch consumer): the
    fold orders by LSN within a micro-batch, and micro-batches arrive
    in source order, so cross-batch ordering holds as long as the
    source respects it — the usual binlog-tail contract.
    """
    from transforms_for_apache_kafka_connect_spark.streaming.writers import (
        start_foreach_batch,
    )

    if prepare is not None:
        envelopes = prepare(envelopes)

    def sink(df: DataFrame, batch_id: int) -> None:
        patch_apply(
            table, df, epoch=epoch, batch_id=batch_id,
            payload_fields=payload_fields,
        )

    return start_foreach_batch(
        envelopes, sink, checkpoint_dir, output_mode="append",
        available_now=available_now, trigger_seconds=trigger_seconds,
    )
