"""Sequence-continuity checking: detect LOST, DUPLICATED and
out-of-order change events from the stream's own sequence numbers.

A CDC pipeline's scariest failure is silent: a dropped binlog segment
or a skipped Kafka offset means the lake diverges from the source and
nothing errors. The engine's per-row expectations (expectations.py)
cannot see this — continuity is a cross-row, cross-batch property. This
module adds it in two layers:

* ``sequence_gaps`` — stateless batch analysis: one window pass per
  group (``(topic, partition)`` by default) ordered by the sequence
  expression flags intra-batch holes (``dense`` mode — Kafka offsets
  on a non-compacted topic are dense per partition) and duplicated
  sequence numbers (any mode — binlog LSNs are sparse, so ``monotonic``
  mode checks only duplication). With a ``start_after`` state frame it
  also flags the batch head: a hole against the last sequence seen
  (``head_gap``) or a re-delivery below it (``rewind``).
* ``SequenceTracker`` — the cross-batch memory: a tiny LakeTable keyed
  by the group columns holding ``last_seq``, advanced through the SAME
  ledgered exactly-once merge as every other table, so a crashed and
  replayed batch neither double-advances nor false-alarms.

Scale shape: the window pass is ONE hash exchange on the group columns
plus a per-group sort — the minimum any exact hole-listing needs; the
duplicate check rides the same sorted pass (lag equality), not a second
aggregation. The state table is O(partitions) rows and broadcasts.

The reference (Aiven SMT catalog) has no continuity checking; Kafka
Connect relies on the broker's offset contract. A lake-building engine
cannot — this is the replacement for that broker-side guarantee.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.streaming.sink import LakeTable

_MODES = ("dense", "monotonic")


def sequence_gaps(
    env: DataFrame,
    *,
    seq: str = "value.lsn",
    by: tuple[str, ...] = ("topic", "partition"),
    mode: str = "dense",
    start_after: DataFrame | None = None,
) -> DataFrame:
    """Anomaly report for one batch: rows ``(*by, kind, gap_from,
    gap_to, missing)`` where kind is

    * ``'gap'`` — dense mode only: sequences ``gap_from..gap_to``
      (inclusive, ``missing`` of them) absent inside the batch;
    * ``'duplicate'`` — a sequence number seen more than once
      (one row per extra occurrence, ``missing`` = 0);
    * ``'head_gap'`` — with ``start_after``: the batch starts above
      the last tracked sequence + 1 (dense mode);
    * ``'rewind'`` — with ``start_after``: the batch reaches at or
      below the last tracked sequence (re-delivery / out-of-order
      source; ``missing`` = 0).

    ``start_after`` carries one row per group: ``(*by, last_seq)``.
    Groups absent from it are treated as new (no head check).
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    bys = list(by)
    raw = env.select(F.expr(seq).alias("_seq")).schema["_seq"].dataType
    if raw.typeName() not in ("byte", "short", "integer", "long"):
        raise ValueError(
            f"sequence expression {seq!r} must be integral, got {raw}"
        )
    # NULL sequence rows cannot be continuity-checked and are ignored
    # (e.g. probing value.lsn on a stream whose tombstone records carry
    # no value — prefer the envelope `timestamp`/offset slot for
    # transport-level checking: every record has one)
    s = env.select(*bys, F.expr(seq).cast("long").alias("_seq")).filter(
        F.col("_seq").isNotNull()
    )
    # ONE window pass classifies everything: the group's first row
    # (_prev IS NULL) carries the head checks against the broadcast
    # state; later rows carry duplicate/hole checks against their
    # predecessor — no union of re-derived branches, no second
    # aggregation for the per-group minimum
    w = Window.partitionBy(*bys).orderBy("_seq")
    lagged = s.withColumn("_prev", F.lag("_seq").over(w))
    if start_after is not None:
        st = start_after.select(
            *bys, F.col("last_seq").cast("long").alias("_last")
        )
        lagged = lagged.join(F.broadcast(st), on=bys, how="left")
    else:
        lagged = lagged.withColumn("_last", F.lit(None).cast("long"))
    first = F.col("_prev").isNull()
    tracked = F.col("_last").isNotNull()
    dense = mode == "dense"
    is_dup = ~first & (F.col("_seq") == F.col("_prev"))
    is_gap = (
        ~first & (F.col("_seq") - F.col("_prev") > 1)
        if dense
        else F.lit(False)
    )
    is_head = (
        first & tracked & (F.col("_seq") > F.col("_last") + 1)
        if dense
        else F.lit(False)
    )
    is_rewind = first & tracked & (F.col("_seq") <= F.col("_last"))
    kind = (
        F.when(is_dup, F.lit("duplicate"))
        .when(is_gap, F.lit("gap"))
        .when(is_head, F.lit("head_gap"))
        .when(is_rewind, F.lit("rewind"))
    )
    return (
        lagged.withColumn("kind", kind)
        .filter(F.col("kind").isNotNull())
        .select(
            *bys,
            "kind",
            F.when(is_dup | is_rewind, F.col("_seq"))
            .when(is_gap, F.col("_prev") + 1)
            .otherwise(F.col("_last") + 1)
            .alias("gap_from"),
            F.when(is_dup, F.col("_seq"))
            .when(is_rewind, F.col("_last"))
            .otherwise(F.col("_seq") - 1)
            .alias("gap_to"),
            F.when(is_dup | is_rewind, F.lit(0).cast("long"))
            .when(is_gap, F.col("_seq") - F.col("_prev") - 1)
            .otherwise(F.col("_seq") - F.col("_last") - 1)
            .alias("missing"),
        )
    )


@dataclass
class SequenceTracker:
    """Cross-batch continuity state over a LakeTable keyed by the group
    columns with a single ``last_seq`` payload column.

    ``check(env, ...)`` returns the batch's anomaly report (including
    head checks against the tracked state) and — unless ``advance=
    False`` — upserts each group's new maximum through the table's
    ledgered merge, exactly-once per (epoch, batch_id): a replayed
    batch is a ledger no-op, so resume never double-advances the
    watermark or re-alarms a healed head gap.

    The state stays O(groups): per-partition tracking of a 10^10-event
    stream is a few hundred rows however large the data is.
    """

    table: LakeTable
    seq: str = "value.lsn"
    by: tuple[str, ...] = ("topic", "partition")
    mode: str = "dense"

    def __post_init__(self):
        if self.mode not in _MODES:
            raise ValueError(f"mode must be one of {_MODES}")
        if list(self.table.key_cols) != list(self.by):
            raise ValueError(
                "tracker table must be keyed by the group columns "
                f"({list(self.by)}), got {self.table.key_cols}"
            )

    def state(self, spark: SparkSession) -> DataFrame | None:
        if self.table.manifest().get("schema") is None:
            return None
        return self.table.read(spark).select(*self.by, "last_seq")

    def report(self, spark: SparkSession, env: DataFrame) -> DataFrame:
        """Anomaly report for one batch against the tracked state —
        does NOT advance the watermark (so a batch whose table merge
        later fails can be re-checked identically on replay)."""
        return sequence_gaps(
            env, seq=self.seq, by=self.by, mode=self.mode,
            start_after=self.state(spark),
        )

    def advance(
        self,
        spark: SparkSession,
        env: DataFrame,
        *,
        epoch: str = "seqtrack",
        batch_id: int = 0,
    ) -> dict:
        """Move each group's watermark to the batch maximum,
        exactly-once on (epoch, batch_id); a rewound batch never
        lowers a watermark."""
        if self.table.committed(epoch, batch_id):
            return {"skipped": True}
        st = self.state(spark)
        new = env.groupBy(*self.by).agg(
            F.max(F.expr(self.seq).cast("long")).alias("last_seq")
        )
        if st is not None:
            new = (
                new.join(
                    F.broadcast(
                        st.select(
                            *self.by,
                            F.col("last_seq").alias("_old"),
                        )
                    ),
                    on=list(self.by),
                    how="left",
                )
                .select(
                    *self.by,
                    F.greatest(
                        F.col("last_seq"),
                        F.coalesce(F.col("_old"), F.lit(-(1 << 62))),
                    ).alias("last_seq"),
                )
            )
        return self.table.merge(
            new.withColumn("__is_delete", F.lit(False)),
            epoch=epoch,
            batch_id=batch_id,
        )

    def check(
        self,
        spark: SparkSession,
        env: DataFrame,
        *,
        epoch: str = "seqtrack",
        batch_id: int = 0,
        advance: bool = True,
    ) -> DataFrame:
        report = self.report(spark, env)
        if advance:
            self.advance(spark, env, epoch=epoch, batch_id=batch_id)
        return report
