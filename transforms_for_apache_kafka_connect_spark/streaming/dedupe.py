"""Last-writer-wins dedupe by (key, lsn).

north_rule: "deduplicated by (key, LSN) with last-writer-wins".

Spark-first design (SURVEY.md §2.3 "window functions" row): NOT a
row_number() window (which would sort every partition); a single
hash-aggregate with ``max_by(struct(...), ord)`` — algebraic, so Spark
performs map-side partial aggregation before the shuffle. That partial
combine is also the built-in skew mitigation: a hot key (zipf repo)
collapses to ONE row per map task before shuffling, so the reduce side
sees at most #map-tasks rows per key — no salting needed at this stage
(salting would break per-key ordering anyway; SURVEY.md §7 hard part d).

Deterministic tie-break: (lsn, ts_ms, op_rank) lexicographic struct
ordering — op_rank prefers d > u > c > r so a same-lsn delete wins
(replay safety: re-applying is idempotent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _op_rank():
    return (
        F.when(F.col("value.op") == "d", 3)
        .when(F.col("value.op") == "u", 2)
        .when(F.col("value.op") == "c", 1)
        .otherwise(0)
    )


def lww_dedupe(events: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """One surviving envelope row per key: the max (lsn, ts_ms, op_rank).

    Tombstone records (value IS NULL) carry no LSN; they are dropped
    here — the delete they trail already carries op='d' (Debezium
    contract; the reference's TombstoneHandler drops them the same way).
    """
    key = (
        [F.col(c) for c in key_cols]
        if key_cols
        else [F.col("key")]
    )
    live = events.filter(F.col("value").isNotNull())
    ordering = F.struct(
        F.col("value.lsn").alias("lsn"),
        F.col("value.ts_ms").alias("ts_ms"),
        _op_rank().alias("op_rank"),
    )
    packed = F.struct(
        F.col("topic"), F.col("partition"), F.col("key"), F.col("value"),
        F.col("timestamp"), F.col("headers"),
    )
    return (
        live.groupBy(*key)
        .agg(F.max_by(packed, ordering).alias("r"))
        .select("r.*")
    )
