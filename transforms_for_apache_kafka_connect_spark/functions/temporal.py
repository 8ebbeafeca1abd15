"""Temporal joins: as-of (point-in-time) join and banded range join.

Neither exists as a Spark built-in; both are everyday queries on CDC
output ("what was the exchange rate / dimension row when this event
happened", "which price band does this reading fall into"). The naive
formulations are non-equi joins that Catalyst executes as
BroadcastNestedLoopJoin or CartesianProduct — quadratic and fatal at
100 TB. Both functions here re-express the semantics as ONE hash
shuffle plus codegen'd window/filter work, so they scale like an
ordinary equi-join.

``asof_join`` — the union trick (the classic log-merge formulation,
same idea as pandas ``merge_asof`` but distributed): stack both sides
into one DataFrame tagged by origin, shuffle ONCE on the join key,
sort each key's partition by time, and carry the most recent right-side
payload forward with ``last(..., ignorenulls=True)`` over an unbounded
preceding window. Every left row then holds the right row that was
current at its timestamp. No join node at all in the plan — the
quadratic candidate-pair explosion of `l.time >= r.time` never exists.

``range_join`` — banded bucketing (the standard trick Databricks ships
as a range-join hint, built here from first principles): quantize the
point to a bucket of width ``w``, explode each range into the buckets
it covers, equi-join on the bucket id, re-check the exact inequality.
A (point, range) pair can only meet in the point's single bucket, so no
dedup pass is needed. Cost: |ranges| × ceil(span/w) exploded rows
(choose ``w`` near the typical range span) instead of |points|×|ranges|
comparisons.

Reference parity note: the reference SMT catalog has no join operators
(it is a per-record transform library — SURVEY.md §2.1); these extend
the engine the way its users combine Kafka Connect with a downstream
lakehouse query layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

__all__ = ["asof_join", "range_join", "session_summary", "sessionize"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    *,
    direction: str = "backward",
    tolerance: Column | int | float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: each ``left`` row gains the payload of the
    single ``right`` row with the nearest ``right_time`` at-or-before
    (``backward``) / at-or-after (``forward``) its ``left_time``,
    within the same ``on`` key. Rows with no match keep NULL payload
    (left-outer semantics, like DuckDB's ``ASOF LEFT JOIN``).

    Equal timestamps match (inclusive); among right rows sharing the
    winning (key, time) the one with the greatest payload ordering is
    deterministic only if ``right`` is unique per (key, time) —
    pre-aggregate if it isn't.

    NULL keys: the window formulation groups NULL keys TOGETHER (they
    match each other), unlike an SQL equality join where NULL matches
    nothing. CDC keys are non-null by the engine's key contract
    (sink.py); filter NULL keys first if the inputs can carry them and
    SQL-join semantics are required.

    ``tolerance``: maximum allowed |left_time - matched right_time|
    (same units as the time columns); matches farther away are nulled
    out, the left row is kept.

    Scale shape: one exchange on ``on`` (both sides into the same
    hash partitioning), one sort per partition, window carry-forward —
    the same cost envelope as a co-partitioned equi-join. Skew lives
    where the key is hot, exactly as it would in the equi-join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload_cols = [
        c for c in right.columns if c not in set(on) and c != right_time
    ]
    out_names = {c: (c + suffix if c in left.columns else c) for c in payload_cols}

    _T, _SIDE, _RT, _P = "__asof_t", "__asof_side", "__asof_rt", "__asof_p"
    # the matched time + payload travel as ONE struct and are carried
    # forward atomically: per-column last(ignorenulls) would stitch
    # fields from DIFFERENT right rows whenever the winning row holds a
    # NULL payload value (the null would "resurrect" an older row's
    # value). A struct is non-null as a whole even when every field is
    # null, so the carry always reflects exactly one right row.
    ptype = T.StructType(
        [T.StructField(_RT, right.schema[right_time].dataType)]
        + [
            T.StructField(out_names[c], right.schema[c].dataType)
            for c in payload_cols
        ]
    )
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias(_T),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(ptype).alias(_P),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in set(on)],
        *[F.col(k) for k in on],
        F.col(right_time).alias(_T),
        F.lit(0).alias(_SIDE),
        F.struct(
            F.col(right_time).alias(_RT),
            *[F.col(c).alias(out_names[c]) for c in payload_cols],
        ).cast(ptype).alias(_P),
    ).select(l_tagged.columns)  # align column order for the union

    unioned = l_tagged.unionByName(r_tagged)

    # backward: ascending time, right rows (side=0) before left rows at
    # the same instant so an equal timestamp is visible to the left row.
    # forward: descending time, same tie-break — carry-forward then
    # yields the EARLIEST right row at-or-after.
    order = [F.col(_T).asc(), F.col(_SIDE).asc()] if direction == "backward" \
        else [F.col(_T).desc(), F.col(_SIDE).asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in unioned.columns if c != _P],
        F.last(F.col(_P), ignorenulls=True).over(w).alias(_P),
    ).filter(F.col(_SIDE) == 1)

    matched_rt = F.col(f"{_P}.{_RT}")
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        # the direction fixes the sign (backward: left >= matched), so
        # no abs() — abs is undefined on interval types
        dist = (
            F.col(_T) - matched_rt
            if direction == "backward"
            else matched_rt - F.col(_T)
        )
        ok = matched_rt.isNotNull() & (dist <= tol)
        carried = carried.select(
            *[c for c in carried.columns if c != _P],
            F.when(ok, F.col(_P)).alias(_P),
        )

    return carried.select(
        *[c for c in left.columns],
        matched_rt.alias("matched_" + right_time),
        *[F.col(f"{_P}.{out_names[c]}").alias(out_names[c]) for c in payload_cols],
    )


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    *,
    bucket_width: float,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each ``points`` row to every ``ranges`` row with
    ``lo <= point < hi`` (optionally also matching equi-keys ``on``),
    WITHOUT a nested-loop join.

    Both sides gain a bucket id ``floor(x / bucket_width)``; a range is
    exploded into every bucket its [lo, hi) span touches, the join is a
    plain equi-join on (``on`` ∪ bucket), and the exact inequality is
    re-checked afterwards. A qualifying pair meets in exactly one
    bucket (the point's own), so the output needs no dedup.

    ``bucket_width`` tuning: explosion factor is
    ``avg(hi-lo)/bucket_width + 1`` rows per range — pick the typical
    range span. ``how='left'`` keeps unmatched points with NULL range
    columns (one row each).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")
    on = on or []
    _B = "__rj_bucket"
    w = F.lit(float(bucket_width))
    p = points.withColumn(_B, F.floor(F.col(point_col) / w))
    # hi is exclusive: a range [10, 20) with width 10 covers buckets
    # 1..1, not 1..2 — subtract an epsilon via floor((hi - tiny)/w)
    # would be float-fragile; instead explode to floor(hi/w) and rely
    # on the exact re-check (one extra bucket row at worst).
    r = ranges.withColumn(
        _B,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    keys = on + [_B]
    cond = (F.col(lo_col) <= F.col(point_col)) & (F.col(point_col) < F.col(hi_col))
    joined = p.join(r, keys, "inner").filter(cond).drop(_B)
    if how == "inner":
        return joined
    # left: anti-join the matched points back in with NULL range columns
    matched_keys = joined.select(*points.columns)
    unmatched = p.drop(_B).exceptAll(matched_keys)
    range_cols = [c for c in ranges.columns if c not in set(on)]
    filled = unmatched.select(
        *points.columns,
        *[F.lit(None).cast(ranges.schema[c].dataType).alias(c) for c in range_cols],
    )
    return joined.select(*filled.columns).unionByName(filled)


def _epoch_ms(df: DataFrame, time_col: str) -> Column:
    """The gap arithmetic is epoch-MILLIS: a TimestampType cast to long
    yields epoch SECONDS (a silent 1000x unit error — sessions would
    only break after >500 days), so timestamps are normalized through
    unix_millis; date/string/etc. are rejected rather than guessed."""
    dt = df.schema[time_col].dataType
    if isinstance(dt, T.TimestampType):
        return F.unix_millis(F.col(time_col))
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)):
        return F.col(time_col).cast("long")
    raise TypeError(
        f"time_col {time_col!r} must be an epoch-ms integer column or a "
        f"TimestampType (got {dt.simpleString()}); convert explicitly"
    )


def sessionize(
    df: DataFrame,
    *,
    group_cols: list[str],
    time_col: str,
    gap: str | int,
    order_cols: list[str] | None = None,
    prefix: str = "session_",
) -> DataFrame:
    """Per-EVENT gap sessionization: every input row gains
    ``<prefix>index`` (0-based session ordinal within its group) and
    ``<prefix>start_ms`` (the session's first event time) — the labels
    a training-data pipeline needs to stitch events/turns into episodes
    before grouping, which ``F.session_window`` (aggregate-only output)
    cannot provide.

    Two events belong to one session iff they share ``group_cols`` and
    are at most ``gap`` apart — the SAME boundary rule as
    ``F.session_window`` (``t - prev <= gap`` continues a session), so
    summaries derived from these labels agree with
    ``windowed_aggregate(session_gap=...)`` row for row (law-tested).

    ``gap`` is epoch-ms (int) or a duration string ("30 minutes");
    ``time_col`` must be an epoch-ms integer column or a TimestampType
    (normalized via ``unix_millis`` — other types raise rather than
    silently sessionizing in the wrong unit).
    ``order_cols`` breaks timestamp ties deterministically (default:
    none — equal-time events are one session either way, but the index
    assignment within a tie needs a tiebreaker to be reproducible
    across partitionings; pass e.g. the LSN/event id).

    Rows whose ``time_col`` is NULL cannot be ordered: they come back
    with NULL session columns rather than poisoning the lag chain (a
    NULLS FIRST sort would make the first real event's lag NULL-safe
    comparison start a spurious session).

    Scale shape: ONE hash exchange on ``group_cols`` + one sort; the
    break flag (``lag``), the running session index (``sum`` over
    unbounded preceding) and the carried session start all share that
    single Window spec, so Catalyst plans them in one Window node —
    no join, no second shuffle, no Python. Skewed groups (one user =
    10^8 events) sort within one partition; sessionize AFTER any
    per-group sampling/capping for such sources.
    """
    from transforms_for_apache_kafka_connect_spark.streaming.rollup import (
        granularity_ms,
    )

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    gap_ms = gap if isinstance(gap, int) else granularity_ms(gap)
    if gap_ms <= 0:
        raise ValueError("gap must be positive")
    idx_col, start_col = f"{prefix}index", f"{prefix}start_ms"
    for c in (idx_col, start_col, "__t", "__prev"):
        if c in df.columns:
            raise ValueError(f"output column {c!r} already exists")
    t = _epoch_ms(df, time_col)
    ordered = df.filter(t.isNotNull())
    nulls = df.filter(t.isNull()).select(
        "*",
        F.lit(None).cast("long").alias(idx_col),
        F.lit(None).cast("long").alias(start_col),
    )
    order = [t.asc(), *[F.col(c).asc() for c in (order_cols or [])]]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # one lag pass (its own Window node), then index + start share the
    # running frame — Catalyst collapses them into a single second
    # Window node over the SAME exchange + sort
    lagged = ordered.select(
        "*", t.alias("__t"), F.lag(t).over(w).alias("__prev")
    )
    # strictly-greater: an event exactly `gap` after its predecessor
    # CONTINUES the session (F.session_window parity); the first event
    # of a group (prev NULL) starts session 0
    brk = F.when(
        F.col("__t") - F.col("__prev") > F.lit(gap_ms), F.lit(1)
    ).otherwise(F.lit(0))
    is_start = F.col("__prev").isNull() | (
        F.col("__t") - F.col("__prev") > F.lit(gap_ms)
    )
    # both in ONE select so they share a single Window node (same spec
    # + frame): the running index, and the session start — stamped at
    # the first row and every break row, dragged to the rest by
    # last(ignorenulls) over the same frame
    out = lagged.select(
        *[c for c in lagged.columns if c not in ("__t", "__prev")],
        F.sum(brk).over(run).cast("long").alias(idx_col),
        F.last(F.when(is_start, F.col("__t")), ignorenulls=True)
        .over(run).alias(start_col),
    )
    return out.unionByName(nulls)


def session_summary(
    sessions: DataFrame,
    *,
    group_cols: list[str],
    time_col: str,
    gap: str | int,
    prefix: str = "session_",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Collapse :func:`sessionize` output to one row per session:
    ``group_cols + [<prefix>start_ms, <prefix>end_ms]`` with
    ``n_events`` plus any extra ``aggs``. ``<prefix>end_ms`` is
    ``last event + gap`` — the same closed-open envelope
    ``F.session_window`` reports, so this is interchangeable with
    ``windowed_aggregate(session_gap=...)`` output. NULL-time rows
    (NULL session labels) are excluded. One map-side-combining
    exchange on (group, session index)."""
    from transforms_for_apache_kafka_connect_spark.streaming.rollup import (
        granularity_ms,
    )

    gap_ms = gap if isinstance(gap, int) else granularity_ms(gap)
    idx_col, start_col = f"{prefix}index", f"{prefix}start_ms"
    t = _epoch_ms(sessions, time_col)
    return (
        sessions.filter(F.col(idx_col).isNotNull())
        .groupBy(*group_cols, idx_col, start_col)
        .agg(
            (F.max(t) + F.lit(gap_ms)).alias(f"{prefix}end_ms"),
            F.count(F.lit(1)).alias("n_events"),
            *(aggs or []),
        )
        .drop(idx_col)
    )
