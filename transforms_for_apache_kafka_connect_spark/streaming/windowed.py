"""Event-time windowed aggregation with watermarked late-data handling
(Structured Streaming's windowed-agg surface, over the engine envelope).

The change-stream envelope carries event time as epoch millis in
``timestamp``; ``windowed_aggregate`` turns that into tumbling/sliding
event-time windows with Spark's built-in ``window()`` + ``withWatermark``
— state for a window is kept until the watermark (max observed event
time minus the allowed lateness) passes its end, late events inside the
tolerance still update their window, and events later than the
watermark are dropped by Spark's state store, bounding state size on an
unbounded stream (the property that matters at 100 TB: without a
watermark, windowed state grows forever).

``stream_windowed_into`` lands the aggregate in a :class:`LakeTable`
exactly-once: update-mode emission via ``foreachBatch`` upserts each
trigger's CHANGED windows (keyed on window start + group), the batch id
rides as ``_lsn`` so merge-on-read destinations resolve re-emissions by
recency, and the table's ledger dedupes replayed micro-batches. The
same aggregation works on a batch DataFrame (no watermark — batch data
is complete by definition), which is what the parity test uses as the
oracle.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: event-time column derived from the envelope's epoch-millis timestamp
_EVENT_TIME = "__event_time"


def windowed_aggregate(
    events: DataFrame,
    *,
    window_duration: str = "1 minute",
    slide: str | None = None,
    session_gap: str | None = None,
    watermark: str | None = "10 minutes",
    group_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
    ts_col: str = "timestamp",
) -> DataFrame:
    """Envelope stream/batch -> per-window aggregates.

    * ``window_duration``/``slide`` — tumbling (default) or sliding
      event-time windows (Spark interval strings).
    * ``session_gap`` — gap-based SESSION windows instead
      (``F.session_window``): a session runs from its first event to
      its last event + gap, and two events belong to one session iff
      they are within the gap of each other (transitively). Mutually
      exclusive with ``slide``; ``window_duration`` is ignored.
    * ``watermark`` — allowed lateness on STREAMING input: events later
      than (max event time - watermark) are dropped, everything inside
      it still updates its window. Ignored for batch input (complete
      data needs no lateness bound), so the identical call is the batch
      oracle for the streaming run.
    * ``group_cols`` — extra grouping expressions (e.g.
      ``["value.op"]``); dotted paths are aliased by their leaf name.
    * ``aggs`` — aggregate Columns (default: ``count(*) AS n_events``).

    Output columns: ``window_start_ms``/``window_end_ms`` (epoch
    millis — join/merge-friendly, no session-zone ambiguity), the
    group leaves, then the aggregates.
    """
    if session_gap is not None and slide is not None:
        raise ValueError(
            "session_gap and slide are mutually exclusive: a session "
            "window's extent comes from the data, not a fixed slide"
        )
    leaf_names = [g.split(".")[-1] for g in group_cols or []]
    if len(set(leaf_names)) != len(leaf_names):
        raise ValueError(
            f"group_cols leaf names collide after aliasing: {leaf_names} "
            "(two dotted paths share a leaf — alias one upstream)"
        )
    reserved = {"window_start_ms", "window_end_ms", "__w", _EVENT_TIME}
    clash = reserved.intersection(leaf_names)
    if clash:
        raise ValueError(f"group_cols leaf names are reserved: {sorted(clash)}")
    # NOTE: rows whose event time is NULL are excluded by Spark's
    # window() rewrite — a stream whose envelope carries no timestamp
    # (e.g. a raw source without a ts column, where the boundary
    # defaults it to NULL) aggregates to NOTHING. Check the envelope
    # wiring, not this function, when windows come back empty.
    df = events.withColumn(
        _EVENT_TIME, F.timestamp_millis(F.col(ts_col).cast("long"))
    )
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(_EVENT_TIME, watermark)
    groups = []
    for g in group_cols or []:
        leaf = g.split(".")[-1]
        groups.append(F.col(g).alias(leaf))
    if session_gap is not None:
        win = F.session_window(F.col(_EVENT_TIME), session_gap)
    else:
        win = F.window(
            F.col(_EVENT_TIME), window_duration, slide or window_duration
        )
    out = df.groupBy(win.alias("__w"), *groups).agg(
        *(aggs or [F.count(F.lit(1)).alias("n_events")])
    )
    leaf_names = [g.split(".")[-1] for g in group_cols or []]
    return out.select(
        F.unix_millis(F.col("__w.start")).alias("window_start_ms"),
        F.unix_millis(F.col("__w.end")).alias("window_end_ms"),
        *leaf_names,
        *[c for c in out.columns if c not in ("__w", *leaf_names)],
    )


def stream_windowed_into(
    table: Any,
    events: DataFrame,
    checkpoint_dir: str,
    *,
    window_duration: str = "1 minute",
    slide: str | None = None,
    session_gap: str | None = None,
    watermark: str = "10 minutes",
    group_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
    epoch: str = "windows",
    available_now: bool = False,
    trigger_seconds: int = 10,
    prepare: Callable[[DataFrame], DataFrame] | None = None,
):
    """Maintain a windowed aggregate table from a streaming envelope.

    ``table.key_cols`` must cover ``window_start_ms`` plus the group
    leaves — each trigger upserts the windows it changed (update-mode
    semantics through ``foreachBatch``), so a late-but-tolerated event
    simply re-merges its window's new totals; the ledger + ``_lsn`` =
    micro-batch id make redelivery and merge-on-read resolution safe.
    ``prepare`` (optional) runs on the raw stream before aggregation —
    e.g. a converter boundary or an SMT chain.

    ``session_gap`` switches to gap-based session windows, and with
    them to APPEND-mode emission (Spark's only supported output mode
    for streaming session aggregations — and the semantics you want:
    sessions MERGE in the state store while open, so emitting them
    early would leave absorbed rows stale downstream). A session lands
    exactly once, when the watermark passes its end — i.e. after
    gap + allowed lateness of event-time silence — so landed rows are
    immutable and state stays bounded. Consequence for drained
    ``available_now`` runs: sessions still open at the end of the
    input (ends within the final watermark) stay in the checkpoint
    state and land on a future run once later data advances the
    watermark — on a live stream that happens continuously.
    """
    # merge() requires <=1 row per key: the table key must cover the
    # whole aggregation grain or ties silently drop groups
    required = {"window_start_ms", *[g.split(".")[-1] for g in group_cols or []]}
    missing = required - set(table.key_cols)
    if missing:
        raise ValueError(
            f"table.key_cols {list(table.key_cols)} must cover the "
            f"aggregation grain {sorted(required)} (missing: "
            f"{sorted(missing)}) — a coarser key keeps an arbitrary "
            "group's totals per merge and drops the rest"
        )
    if prepare is not None:
        events = prepare(events)
    agg = windowed_aggregate(
        events,
        window_duration=window_duration,
        slide=slide,
        session_gap=session_gap,
        watermark=watermark,
        group_cols=group_cols,
        aggs=aggs,
    )
    def sink(df: DataFrame, batch_id: int) -> None:
        updates = (
            df.withColumn("_lsn", F.lit(batch_id).cast("long"))
            .withColumn("__is_delete", F.lit(False))
        )
        table.merge(updates, epoch=epoch, batch_id=batch_id)

    from transforms_for_apache_kafka_connect_spark.streaming.writers import (
        start_foreach_batch,
    )

    return start_foreach_batch(
        agg, sink, checkpoint_dir,
        output_mode="update" if session_gap is None else "append",
        available_now=available_now, trigger_seconds=trigger_seconds,
    )
