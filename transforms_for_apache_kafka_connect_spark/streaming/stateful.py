"""Custom stateful streaming operator: cross-batch stale-update
suppression via ``applyInPandasWithState``.

The batch replay path needs no event-time state (LWW by LSN is a total
order per key — SURVEY.md §2.3). In LIVE tailing, however, an
at-least-once source can redeliver events from already-committed
batches; the ledger makes re-applying a whole batch a no-op, but
single stale events inside a fresh batch would still flow into the
merge (the merge's LWW picks them over nothing if the key isn't
re-read). This operator keeps the max applied LSN per key in Spark's
managed state store and drops any event at or below it — bounding
merge input to genuinely-new changes.

This is the engine's ``applyInPandasWithState`` exemplar (Arrow-batched
per-group pandas, GroupState, processing-time timeout to bound state):
the grouped-map callback is pandas-vectorized per key group, never
row-at-a-time Python over the whole stream.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

#: flattened row shape the suppressor operates on
_OUT_SCHEMA = (
    "k string, lsn bigint, ts_ms bigint, op string, payload string"
)
_STATE_SCHEMA = "max_lsn bigint"


def _make_suppress(state_timeout_ms: int):
    def _suppress(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Per key per micro-batch: emit only the max-LSN row, and only
        if it beats the max LSN already applied in earlier batches — a
        stateful LWW whose state survives across micro-batches."""
        if state.hasTimedOut:
            # timeout invocation (no input rows): this key has been
            # silent for state_timeout_ms — drop its state so the store
            # stays bounded. Falling through instead would re-arm the
            # timer via state.update + setTimeoutDuration, keeping every
            # key ever seen alive forever. A later stale delivery for
            # the key is caught by the idempotent merge instead.
            state.remove()
            return
        max_lsn = state.get[0] if state.exists else -1
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            fresh = pdf[pdf["lsn"] > max_lsn]
            if len(fresh):
                cand = fresh.loc[[fresh["lsn"].idxmax()]]
                if best is None or int(cand["lsn"].iloc[0]) > int(best["lsn"].iloc[0]):
                    best = cand
        if best is not None:
            max_lsn = int(best["lsn"].iloc[0])
            yield best
        state.update((max_lsn,))
        if state_timeout_ms > 0:
            # bound state: keys silent this long are dropped (a later
            # stale delivery for them is then caught by the idempotent
            # merge instead)
            state.setTimeoutDuration(state_timeout_ms)

    return _suppress


def suppress_stale(
    flat_events: DataFrame,
    *,
    key_col: str = "k",
    state_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming DataFrame (schema ``_OUT_SCHEMA``) -> at most ONE row
    per key per micro-batch (the max-LSN winner), with winners at or
    below an earlier batch's applied LSN suppressed by managed state.

    ``state_timeout_ms=0`` disables the processing-time state timeout —
    use for bounded backfills (trigger availableNow), where pending
    timers would keep the query from self-terminating.
    """
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        flat_events.groupBy(key_col)
        .applyInPandasWithState(
            _make_suppress(state_timeout_ms),
            outputStructType=T._parse_datatype_string(_OUT_SCHEMA),
            stateStructType=T._parse_datatype_string(_STATE_SCHEMA),
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )


def flatten_for_suppression(envelope_df: DataFrame) -> DataFrame:
    """Envelope stream -> the flat (k, lsn, ts_ms, op, payload) shape
    the suppressor consumes (state rows must stay narrow — the WHOLE
    envelope row rides as one serialized JSON column, so the winner can
    be rebuilt losslessly downstream by ``suppress_stale_envelope``)."""
    live = envelope_df.filter(F.col("value").isNotNull())
    key_type = envelope_df.schema["key"].dataType
    key_expr = (
        F.to_json(F.col("key"))
        if isinstance(key_type, (T.StructType, T.MapType, T.ArrayType))
        # scalar keys (e.g. raw_json with no key_schema): string form —
        # to_json rejects non-container input
        else F.col("key").cast("string")
    )
    return live.select(
        key_expr.alias("k"),
        F.col("value.lsn").alias("lsn"),
        F.col("value.ts_ms").alias("ts_ms"),
        F.col("value.op").alias("op"),
        F.to_json(F.struct(*envelope_df.columns)).alias("payload"),
    )


def suppress_stale_envelope(
    envelope_stream: DataFrame,
    *,
    state_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming envelope -> streaming envelope with redelivered/stale
    LSNs dropped by managed state (at most the max-LSN row per key per
    micro-batch; rows at or below an earlier batch's applied LSN are
    suppressed). The winner's full envelope row is rebuilt from the
    serialized payload, so the result plugs straight into
    ``Replayer.stream`` — this is the live-tailing input bound that
    keeps merge input to genuinely-new changes.

    Tombstone records (value IS NULL) carry no LSN and bypass the
    suppressor unchanged; duplicate tombstone deliveries are already
    idempotent downstream (drop modes drop them again, the merge
    re-deletes the same keys).
    """
    schema = envelope_stream.schema
    winners = suppress_stale(
        flatten_for_suppression(envelope_stream),
        state_timeout_ms=state_timeout_ms,
    )
    rebuilt = winners.select(
        F.from_json(F.col("payload"), schema).alias("e")
    ).select("e.*")
    tombstones = envelope_stream.filter(F.col("value").isNull())
    return rebuilt.unionByName(tombstones)


# --------------------------------------------- streaming sessionization

_SESS_STATE_SCHEMA = "last_t bigint, idx bigint, start bigint"


def _make_sessionizer(
    time_col: str,
    gap_ms: int,
    order_cols: list[str],
    state_timeout_ms: int,
):
    def _label(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle key (PROCESSING time — see the sessionize_stream
            # docstring's lag caveat): drop state so the store stays
            # bounded
            state.remove()
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):
            return
        # NULL-time rows can't be ordered: emit them with NULL session
        # labels (batch-sessionize parity) instead of poisoning the
        # int cast below
        null_mask = pdf[time_col].isna()
        if null_mask.any():
            nulls = pdf[null_mask].reset_index(drop=True)
            nulls["session_index"] = None
            nulls["session_start_ms"] = None
            yield nulls
            pdf = pdf[~null_mask]
            if not len(pdf):
                return
        pdf = pdf.sort_values(
            [time_col, *order_cols], kind="mergesort"
        ).reset_index(drop=True)
        last_t, idx, start = (
            state.get if state.exists else (None, -1, None)
        )
        t = pdf[time_col].astype("int64")
        prev = t.shift(1)
        if last_t is not None:
            prev.iloc[0] = last_t
        # same boundary rule as the batch sessionize: exactly `gap`
        # after the predecessor CONTINUES the session
        brk = prev.isna() | (t - prev > gap_ms)
        sidx = idx + brk.cumsum()
        starts = t.where(brk).ffill()
        if start is not None and pd.isna(starts.iloc[0]):
            starts = starts.fillna(start)
        # pdf is already a private frame (concat -> filter/sort ->
        # reset_index): assign the label columns in place
        pdf["session_index"] = sidx.astype("int64")
        pdf["session_start_ms"] = starts.astype("int64")
        state.update(
            (int(t.iloc[-1]), int(sidx.iloc[-1]), int(starts.iloc[-1]))
        )
        if state_timeout_ms > 0:
            state.setTimeoutDuration(state_timeout_ms)
        yield pdf

    return _label


def sessionize_stream(
    events: DataFrame,
    *,
    group_cols: list[str],
    time_col: str,
    gap: "str | int",
    order_cols: list[str] | None = None,
    state_timeout_ms: int = 0,
) -> DataFrame:
    """STREAMING per-event session labels — the online twin of
    ``functions.temporal.sessionize``: every event gains
    ``session_index`` / ``session_start_ms`` the moment it arrives
    (append output each micro-batch), with the per-key (last time,
    ordinal, open start) carried in Spark's managed state store via
    ``applyInPandasWithState`` (Arrow-batched per key group, never
    row-at-a-time over the stream).

    Contract: events must arrive per-key time-ordered ACROSS
    micro-batches (the binlog-tail contract shared by every merge
    path); within a batch any order is fine (sorted per group, with
    ``order_cols`` breaking timestamp ties). An out-of-order late
    arrival gets labeled against the state as it stands — online
    labeling cannot relabel already-emitted rows; repair offline with
    the batch ``sessionize``. Parity law (tests): on an in-order
    stream, labels equal the batch build's exactly.

    ``state_timeout_ms`` > 0 evicts keys idle that long in PROCESSING
    time, while the gap rule is EVENT time — if the source stalls or a
    backfill lags longer than the timeout, the next event of an evicted
    key is labeled a NEW session (fresh start, ordinal back at 0) even
    when its event-time gap is tiny. Safe only when processing time
    tracks event time (a live tail) AND the timeout is set far above
    both ``gap`` and any tolerated source lag; the offline batch
    ``sessionize`` is the repair path either way. 0 = no timeout
    (REQUIRED for ``availableNow`` backfills, where pending timers keep
    the query alive — and where processing time is meaningless).

    Scale shape: state is 3 longs per ACTIVE key; each micro-batch
    shuffles once on the group key (the state operator's required
    partitioning) and does vectorized pandas per group.
    """
    from transforms_for_apache_kafka_connect_spark.streaming.rollup import (
        granularity_ms,
    )

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    gap_ms = gap if isinstance(gap, int) else granularity_ms(gap)
    if gap_ms <= 0:
        raise ValueError("gap must be positive")
    for c in ("session_index", "session_start_ms"):
        if c in events.columns:
            raise ValueError(f"output column {c!r} already exists")
    dt = events.schema[time_col].dataType
    if not isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)):
        raise TypeError(
            f"time_col {time_col!r} must be an epoch-ms integer column "
            f"(got {dt.simpleString()}); convert with unix_millis first"
        )
    out_schema = T.StructType(
        list(events.schema.fields)
        + [
            T.StructField("session_index", T.LongType()),
            T.StructField("session_start_ms", T.LongType()),
        ]
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(*group_cols).applyInPandasWithState(
        _make_sessionizer(
            time_col, gap_ms, list(order_cols or []), state_timeout_ms,
        ),
        outputStructType=out_schema,
        stateStructType=T._parse_datatype_string(_SESS_STATE_SCHEMA),
        outputMode="append",
        timeoutConf=timeout_conf,
    )
