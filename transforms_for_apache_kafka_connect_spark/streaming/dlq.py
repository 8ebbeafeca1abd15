"""Dead-letter queue reprocessing: read quarantined records back as
envelopes and re-drive them through a (fixed) chain with stale-LSN
protection.

The engine's ``error_mode='dlq'`` (Kafka Connect's
``errors.tolerance=all`` + ``errors.deadletterqueue.*`` analog,
engine.py) quarantines errored records as flat JSON under
``dlq_dir/epoch=../batch_id=..`` and keeps the pipeline moving. The
operational other half — what a real operator does after deploying the
chain fix — is here:

* ``read_dlq`` — parse the quarantine back into the canonical envelope
  shape (caller supplies the key/value types: the DLQ is
  schema-on-read by design, records may have been serialized mid-chain
  with SMT-added fields; ``from_json`` ignores fields the type omits).
* ``retry_dlq`` — re-run the fixed chain over the quarantined
  envelopes and merge the survivors EXACTLY ONCE (the table's own
  ledger, under a retry epoch) with a **stale-LSN guard**: the live
  pipeline kept running while the records sat in quarantine, so a
  retried row whose LSN is at-or-below its key's current winner must
  NOT regress the key — the guard point-looks-up the touched keys
  (bucket-pruned ``lookup_many``, Blooms/zone maps — never a table
  scan) and drops stale rows. Records that STILL error under the
  retry chain stay quarantined (they are simply not covered by the
  retry marker) — fail-fast surfaces them instead of silently
  re-quarantining forever.

Scale shape: the retry batch is the quarantine (small by definition —
if it isn't, the fix belongs in a full replay, not a DLQ retry); the
only table-sized cost is the bucket-pruned point lookup. Retried
(epoch, batch_id) provenance is recorded in a marker file so
``read_dlq(include_retried=False)`` (the default) never offers the
same records twice.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_dlq", "retry_dlq"]

_MARKER_DIR = "_retried"


def _retried_set(dlq_dir: str) -> set[tuple[str, int]]:
    d = os.path.join(dlq_dir, _MARKER_DIR)
    out: set[tuple[str, int]] = set()
    if not os.path.isdir(d):
        return out
    for name in os.listdir(d):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(d, name)) as fh:
            for e, b in json.load(fh)["covered"]:
                out.add((e, int(b)))
    return out


def _mark_retried(dlq_dir: str, covered: list[tuple[str, int]], commit: dict) -> None:
    d = os.path.join(dlq_dir, _MARKER_DIR)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump({"covered": covered, "commit": {
            k: v for k, v in commit.items() if isinstance(v, (str, int, bool))
        }}, fh)
    os.replace(tmp, os.path.join(d, f"retry-{uuid.uuid4().hex}.json"))


def read_dlq(
    spark: SparkSession,
    dlq_dir: str,
    *,
    key_type: T.DataType,
    value_type: T.DataType,
    include_retried: bool = False,
) -> DataFrame:
    """Quarantined records as canonical envelopes + provenance:
    (topic, partition, key, value, timestamp, headers, error,
    dlq_epoch, dlq_batch_id). Empty-quarantine reads return an empty
    frame of that schema rather than failing on parquet inference."""
    env_schema = T.StructType([
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("key", key_type),
        T.StructField("value", value_type),
        T.StructField("timestamp", T.LongType()),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
        T.StructField("error", T.StringType()),
        T.StructField("dlq_epoch", T.StringType()),
        T.StructField("dlq_batch_id", T.LongType()),
    ])
    has_data = any(
        name.startswith("epoch=") for name in (
            os.listdir(dlq_dir) if os.path.isdir(dlq_dir) else []
        )
    )
    if not has_data:
        return spark.createDataFrame([], env_schema)
    raw = spark.read.parquet(dlq_dir)
    k_wrap = T.StructType([T.StructField("k", key_type)])
    v_wrap = T.StructType([T.StructField("v", value_type)])
    out = raw.select(
        "topic",
        "partition",
        F.from_json(F.col("key_json"), k_wrap)["k"].alias("key"),
        F.from_json(F.col("value_json"), v_wrap)["v"].alias("value"),
        "timestamp",
        F.lit(None).cast("map<string,string>").alias("headers"),
        F.col("error"),
        F.col("epoch").cast("string").alias("dlq_epoch"),
        F.col("batch_id").cast("long").alias("dlq_batch_id"),
    )
    if not include_retried:
        done = _retried_set(dlq_dir)
        if done:
            cond = None
            for e, b in done:
                c = (F.col("dlq_epoch") == e) & (F.col("dlq_batch_id") == b)
                cond = c if cond is None else (cond | c)
            out = out.filter(~cond)
    return out


def retry_dlq(
    spark: SparkSession,
    dlq_dir: str,
    *,
    replayer,
    key_type: T.DataType,
    value_type: T.DataType,
    epoch: str = "dlq-retry",
    batch_id: int | None = None,
    max_lookup_keys: int = 100_000,
    retry_chain=None,
) -> dict[str, Any]:
    """Re-run ``replayer``'s (fixed) chain over the un-retried
    quarantine and merge survivors, guarded against LSN regression.

    The replayer should be constructed with ``error_mode='fail'``
    (default): a record that STILL errors aborts the retry pre-commit —
    nothing is marked retried, fix again and re-run. Exactly-once: the
    merge ledger under (``epoch``, ``batch_id``). When ``batch_id`` is
    None (the default, and the CLI path) it is derived from the set of
    quarantine (epoch, batch_id) partitions being retried, so crash-
    rerunning the SAME wave is a ledger no-op that still records the
    marker, while a LATER quarantine wave gets its own ledger entry
    instead of being silently swallowed by the first retry's commit.

    What the quarantine holds: the record AS SERIALIZED AT ERROR
    DETECTION. Errors raised by row-FILTER stages (tombstone handler,
    value filters — the common quarantine causes) carry the ORIGINAL
    record, because filters never mutate. Errors raised by a MUTATOR
    stage carry the prefix-applied record, so re-running the full fixed
    chain would double-apply any non-idempotent mutator before the
    failing one — pass ``retry_chain`` (e.g. only the remaining or
    corrective stages) in that case; default ``None`` = the replayer's
    own chain.

    Deleted-key protection: the current-state lookup cannot see keys
    the live pipeline DELETED after quarantine (they have no row), so
    on ``changelog=True`` tables the guard also folds in each touched
    key's newest delete position from the row-level changelog — a
    retried upsert older than its key's delete can then never
    resurrect it. Tables without a changelog keep the documented
    weaker guard (current winners only); run retries against
    changelog-enabled tables when deletes matter. One boundary remains
    even then: a delete of a key that never materialized (its only
    upserts sat in quarantine) is a net no-op the changelog does not
    record, so nothing in the system can prove the retried upsert is
    stale — if absolute LWW over quarantine windows is required,
    replay the affected positions from the source instead of retrying.

    Returns the merge commit dict + ``n_retried`` (quarantined records
    offered to the retry) / ``n_stale_dropped``.
    """
    env = read_dlq(
        spark, dlq_dir, key_type=key_type, value_type=value_type,
    )
    covered = [
        (r["dlq_epoch"], int(r["dlq_batch_id"]))
        for r in env.select("dlq_epoch", "dlq_batch_id").distinct().collect()
    ]
    if not covered:
        return {"skipped": True, "reason": "empty quarantine",
                "n_retried": 0, "n_stale_dropped": 0}
    if batch_id is None:
        # stable id of THIS quarantine wave: identical covered set ->
        # identical ledger entry (crash-rerun stays a no-op); a new
        # wave -> a new entry (never swallowed by a prior retry commit,
        # and never colliding with the live replay's small batch ids)
        digest = hashlib.sha256(
            json.dumps(sorted(covered)).encode()
        ).digest()
        batch_id = int.from_bytes(digest[:8], "big") >> 1
    n_retried = env.count()
    table = replayer.table
    # the fixed chain re-runs; run() enforces the fail-on-first-record
    # contract, so a still-erroring record aborts BEFORE any merge and
    # nothing is marked retried
    chain = retry_chain if retry_chain is not None else replayer.chain
    chained = chain.run(
        env.drop("error", "dlq_epoch", "dlq_batch_id")
    )
    # the retry frame is re-derived for the guard counts AND the merge —
    # cache it once (the quarantine is small by contract)
    base = replayer.updates_for(chained).cache()
    upd = base

    # stale-LSN guard: quarantined records aged while the live pipeline
    # advanced their keys — bucket-pruned point lookup of ONLY the
    # touched keys, then drop rows at-or-below the current winner
    n_stale = 0
    try:
        m = table.manifest()
        keys = [
            {c: r[c] for c in table.key_cols}
            for r in upd.select(*table.key_cols).distinct()
            .limit(max_lookup_keys + 1).collect()
        ]
        if len(keys) > max_lookup_keys:
            raise ValueError(
                f"retry touches more than {max_lookup_keys} keys — "
                "that is a replay, not a DLQ retry (raise "
                "max_lookup_keys to force it)"
            )
        floor = None
        if keys:
            if m["schema"] is not None and m["buckets"]:
                floor = table.lookup_many(spark, keys).select(
                    *table.key_cols, F.col("_lsn").alias("__floor_lsn")
                )
            if getattr(table, "changelog", False):
                # deleted keys have no current row (and a fully-emptied
                # table has no files to look up at all): fold in each
                # touched key's newest DELETE position so a stale
                # retried upsert cannot resurrect it
                kdf = upd.select(*table.key_cols).distinct()
                dels = (
                    table.read_changelog(spark)
                    .filter(F.col("_change_type") == "delete")
                    .join(F.broadcast(kdf), list(table.key_cols),
                          "leftsemi")
                    .groupBy(*table.key_cols)
                    .agg(F.max("_change_lsn").alias("__del_lsn"))
                )
                if floor is None:
                    floor = dels.select(
                        *table.key_cols,
                        F.col("__del_lsn").alias("__floor_lsn"),
                    )
                else:
                    floor = (
                        floor.join(dels, list(table.key_cols), "full_outer")
                        .select(
                            *table.key_cols,
                            F.greatest(
                                F.coalesce("__floor_lsn", F.lit(-(2**62))),
                                F.coalesce("__del_lsn", F.lit(-(2**62))),
                            ).alias("__floor_lsn"),
                        )
                    )
        if floor is not None:
            before = upd.count()
            upd = (
                upd.join(F.broadcast(floor), list(table.key_cols), "left")
                .filter(
                    F.col("__floor_lsn").isNull()
                    | (F.col("_lsn") > F.col("__floor_lsn"))
                )
                .drop("__floor_lsn")
            )
            n_stale = before - upd.count()

        commit = table.merge(upd, epoch=epoch, batch_id=batch_id)
    finally:
        base.unpersist()
    _mark_retried(dlq_dir, covered, commit)
    commit = dict(commit)
    commit["n_retried"] = n_retried
    commit["n_batches_retried"] = len(covered)
    commit["n_stale_dropped"] = n_stale
    return commit
