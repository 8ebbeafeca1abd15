"""Last-writer-wins dedupe by (key, lsn).

north_rule: "deduplicated by (key, LSN) with last-writer-wins" with
"salted repartitioning on skewed repos".

Spark-first design (SURVEY.md §2.3 "window functions" row): NOT a
row_number() window (which would sort every partition); a single
hash-aggregate with ``max_by(struct(...), ord)`` — algebraic, so Spark
performs map-side partial aggregation before the shuffle. That partial
combine is already strong skew mitigation: a hot key (zipf repo)
collapses to ONE row per map task before shuffling.

For pathological skew (one key owning most of the stream AND huge map
partitions), ``n_salt > 1`` switches to an explicit two-phase salted
aggregate: phase 1 groups by (key, salt) — spreading the hot key over
``n_salt`` reducers — phase 2 combines the ≤n_salt survivors per key.
Salting must NEVER reorder per-key LSN comparison, which max_by's
total-order tuple preserves (SURVEY.md §7 hard part d).

Deterministic tie-break: (lsn, ts_ms, op_rank) lexicographic struct
ordering — op_rank prefers d > u > c > r so a same-lsn delete wins
(replay safety: re-applying is idempotent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _op_rank(op_col: Column | None = None) -> Column:
    op = op_col if op_col is not None else F.col("value.op")
    return (
        F.when(op == "d", 3)
        .when(op == "u", 2)
        .when(op == "c", 1)
        .otherwise(0)
    )


def _ordering(value: Column) -> Column:
    return F.struct(
        value.getField("lsn").alias("lsn"),
        value.getField("ts_ms").alias("ts_ms"),
        _op_rank(value.getField("op")).alias("op_rank"),
    )


def lww_dedupe(
    events: DataFrame,
    key_cols: list[str] | None = None,
    n_salt: int = 0,
) -> DataFrame:
    """One surviving envelope row per key: the max (lsn, ts_ms, op_rank).

    Tombstone records (value IS NULL) carry no LSN; they are dropped
    here — the delete they trail already carries op='d' (Debezium
    contract; the reference's TombstoneHandler drops them the same way).

    ``n_salt > 1`` uses the two-phase salted aggregate (see module doc).
    """
    key = [F.col(c) for c in key_cols] if key_cols else [F.col("key")]
    live = events.filter(F.col("value").isNotNull())
    packed = F.struct(
        F.col("topic"), F.col("partition"), F.col("key"), F.col("value"),
        F.col("timestamp"), F.col("headers"),
    )
    ordering = _ordering(F.col("value"))

    if n_salt > 1:
        salt = F.pmod(F.xxhash64(F.col("value.lsn")), F.lit(n_salt))
        partial = (
            live.groupBy(*key, salt.alias("__salt"))
            .agg(F.max_by(packed, ordering).alias("r"))
        )
        final = (
            partial.groupBy(*key)
            .agg(F.max_by(F.col("r"), _ordering(F.col("r.value"))).alias("r"))
        )
        return final.select("r.*")

    return (
        live.groupBy(*key)
        .agg(F.max_by(packed, ordering).alias("r"))
        .select("r.*")
    )
