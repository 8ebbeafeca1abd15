"""Hypertable-style continuous time rollups over the CDC changelog.

A time rollup is the timeseries shape of incremental view maintenance:
COUNT/SUM aggregates per (time bucket, dims) kept consistent with the
base table at several granularities at once (minute/hour/day), updated
from each commit's row-level changelog — never by rescanning the base
table. The retraction algebra (incremental.py) handles the subtle
case automatically: an update that MOVES a row's timestamp retracts
the pre-image from its old bucket and adds the post-image to the new
one, so buckets stay exact under out-of-order and corrected data.

Built as a thin factory over ``MaintainedAggregate`` with a derived
bucket column: each granularity is its own ``LakeTable`` keyed by
``(bucket_ms, *group_cols)``, attached to the ``Replayer``'s existing
maintenance loop (``Replayer(maintain=rollup.specs)``), inheriting the
engine's exactly-once ledger per granularity.

Scale shape: per commit, one batch-sized groupBy per granularity plus
a merge into an aggregate table whose cardinality is #buckets×#dims —
O(|batch|·G) total, independent of base-table size. At 10^10 events
and three granularities that is the difference between a maintenance
job and a recompute.

Bucket arithmetic is pure integer math (``ts - ts % width``) on epoch
milliseconds — no float division (a double rounds 10^12-scale epochs
near bucket boundaries), no session-timezone dependence.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
    MaintainedAggregate,
)
from transforms_for_apache_kafka_connect_spark.streaming.sink import LakeTable

__all__ = ["TimeRollup", "granularity_ms", "time_bucket"]

_UNIT_MS = {
    "millisecond": 1,
    "second": 1_000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
    "week": 7 * 86_400_000,
}


def granularity_ms(granularity: str) -> int:
    """``"15 minutes"`` / ``"1 hour"`` / ``"2 days"`` -> width in ms.
    Calendar units (month/year) are deliberately unsupported: they are
    not fixed-width, so ``bucket = ts - ts % width`` has no meaning."""
    m = re.fullmatch(
        r"\s*(\d+)\s+(millisecond|second|minute|hour|day|week)s?\s*",
        granularity.lower(),
    )
    if not m:
        raise ValueError(
            f"unsupported granularity {granularity!r} "
            f"(use '<n> {'/'.join(_UNIT_MS)}')"
        )
    n, unit = int(m.group(1)), m.group(2)
    if n <= 0:
        raise ValueError("granularity must be positive")
    return n * _UNIT_MS[unit]


def time_bucket(col: Column | str, granularity: str) -> Column:
    """Bucket start (epoch ms, long) for an epoch-ms column: integer
    ``ts - pmod(ts, width)`` — floors correctly for negative epochs
    too (pre-1970 buckets still start at-or-before the value)."""
    c = F.col(col) if isinstance(col, str) else col
    w = F.lit(granularity_ms(granularity))
    return (c.cast("long") - F.pmod(c.cast("long"), w)).alias("bucket_ms")


@dataclass
class TimeRollup:
    """One maintained COUNT/SUM rollup per granularity.

    ``root``/<slug> holds each granularity's aggregate ``LakeTable``
    keyed by ``(bucket_ms, *group_cols)``. Pass ``specs`` to
    ``Replayer(maintain=...)`` — or call the maintenance loop manually
    with ``incremental_agg_update`` per batch, same as any other
    maintained aggregate.
    """

    root: str
    time_col: str  #: epoch-millis column in the base table's payload
    granularities: list[str]
    group_cols: list[str] = field(default_factory=list)
    sum_cols: list[str] = field(default_factory=list)
    #: APPROX_COUNT_DISTINCT(col) per bucket as a maintained HLL sketch
    #: (``hll_<col>`` binary column; see incremental.py for the
    #: exactness guard and on_retraction policy). Mergeable: a day
    #: bucket's sketch equals the union of its hour sketches, so
    #: ad-hoc coarser windows can be derived with ``hll_union_agg``.
    distinct_cols: list[str] = field(default_factory=list)
    #: approx quantile distribution per bucket as a maintained KLL
    #: sketch (``kll_<col>``; stricter retraction guard — see
    #: incremental.py). Probe with ``read(..., quantiles=...)``.
    quantile_cols: list[str] = field(default_factory=list)
    #: MIN/MAX per bucket (``min_<col>``/``max_<col>``): inserts fold
    #: exactly; a retraction holding a bound follows on_retraction —
    #: 'recompute' rebuilds only the violated buckets from the base
    #: table (see incremental.py)
    minmax_cols: list[str] = field(default_factory=list)
    #: AVG/VAR/STDDEV per bucket maintained as signed power sums
    #: (``m0_<col>``/``m1_<col>``/``m2_<col>``) — exactly
    #: self-maintainable (no guard/policy; see incremental.py) AND
    #: additive upward: a day bucket's moments are the sum of its hour
    #: buckets'. ``read`` derives ``avg_<col>``/``var_<col>``/
    #: ``std_<col>``
    moment_cols: list[str] = field(default_factory=list)
    #: exact heavy-hitters support: one CHILD rollup per listed column,
    #: keyed (bucket_ms, *group_cols, <col>) with a maintained signed
    #: occurrence count — exactly self-maintainable (retractions fold
    #: with a sign flip, like moments) and additive upward (a day
    #:  bucket's counts are the sum of its hour buckets'). Probe with
    #: ``topk_values``. Cardinality = buckets x distinct values: the
    #: EXACT counting shape; at vocabularies where that table itself
    #: would not fit, sample or pre-filter upstream — this engine
    #: never silently approximates counts.
    freq_cols: list[str] = field(default_factory=list)
    on_retraction: str = "error"
    n_buckets: int = 4
    count_col: str = "n_rows"
    specs: list[MaintainedAggregate] = field(init=False)

    def __post_init__(self):
        if not self.granularities:
            raise ValueError("need at least one granularity")
        seen = set()
        self.specs = []
        self._tables = {}
        self._freq_tables = {}
        for g in self.granularities:
            ms = granularity_ms(g)
            if ms in seen:
                raise ValueError(f"duplicate granularity width: {g!r}")
            seen.add(ms)
            table = LakeTable(
                self._dir(g),
                key_cols=["bucket_ms", *self.group_cols],
                n_buckets=self.n_buckets,
                discovery=False,
                merge_strategy="broadcast",
            )
            self._tables[ms] = table
            self.specs.append(
                MaintainedAggregate(
                    table=table,
                    group_cols=["bucket_ms", *self.group_cols],
                    sum_cols=list(self.sum_cols),
                    count_col=self.count_col,
                    derived={"bucket_ms": time_bucket(self.time_col, g)},
                    distinct_cols=list(self.distinct_cols),
                    quantile_cols=list(self.quantile_cols),
                    minmax_cols=list(self.minmax_cols),
                    moment_cols=list(self.moment_cols),
                    on_retraction=self.on_retraction,
                )
            )
            for fc in self.freq_cols:
                if fc in self.group_cols:
                    raise ValueError(
                        f"freq_cols entry {fc!r} is already a group col"
                    )
                ft = LakeTable(
                    os.path.join(self._dir(g), f"freq={fc}"),
                    key_cols=["bucket_ms", *self.group_cols, fc],
                    n_buckets=self.n_buckets,
                    discovery=False,
                    merge_strategy="broadcast",
                )
                self._freq_tables[(ms, fc)] = ft
                self.specs.append(
                    MaintainedAggregate(
                        table=ft,
                        group_cols=["bucket_ms", *self.group_cols, fc],
                        count_col="n_occ",
                        derived={"bucket_ms": time_bucket(self.time_col, g)},
                    )
                )

    def _slug(self, granularity: str) -> str:
        return f"g={granularity_ms(granularity)}ms"

    def _dir(self, granularity: str) -> str:
        return os.path.join(self.root, self._slug(granularity))

    def table(self, granularity: str) -> LakeTable:
        ms = granularity_ms(granularity)
        if ms not in self._tables:
            raise KeyError(granularity)
        return self._tables[ms]

    def read(
        self,
        spark: SparkSession,
        granularity: str,
        quantiles: dict[str, list[float]] | None = None,
    ) -> DataFrame:
        """Current rollup at one granularity: (bucket_ms, *group_cols,
        count, sum_*, approx_distinct_* estimates). ``quantiles`` maps
        a quantile_cols entry to probe points, adding
        ``p<pct>_<col>`` columns (e.g. ``{"latency": [0.5, 0.95]}`` ->
        p50_latency, p95_latency)."""
        q_exprs = []
        for c, qs in (quantiles or {}).items():
            if c not in self.quantile_cols:
                raise KeyError(f"{c!r} is not a quantile_cols entry")
            for q in qs:
                pct = f"{q * 100:g}".replace(".", "_")
                q_exprs.append(
                    F.kll_sketch_get_quantile_double(
                        F.col(f"kll_{c}"), F.lit(float(q))
                    ).alias(f"p{pct}_{c}")
                )
        from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
            moment_stats,
        )

        return self.table(granularity).read(spark).select(
            "bucket_ms",
            *self.group_cols,
            self.count_col,
            *[f"sum_{c}" for c in self.sum_cols],
            *[c for mm in self.minmax_cols
              for c in (f"min_{mm}", f"max_{mm}")],
            *[e for mc in self.moment_cols for e in moment_stats(mc)],
            *[
                # a group created solely by null members has no sketch:
                # its distinct count is 0, not NULL
                F.coalesce(
                    F.hll_sketch_estimate(F.col(f"hll_{c}")), F.lit(0)
                ).alias(f"approx_distinct_{c}")
                for c in self.distinct_cols
            ],
            *q_exprs,
        )

    def topk_values(
        self,
        spark: SparkSession,
        granularity: str,
        col: str,
        k: int,
    ) -> DataFrame:
        """Per-(bucket, group) exact top-``k`` most frequent values of
        a ``freq_cols`` column: (bucket_ms, *group_cols, <col>, n_occ,
        rank), rank 1 = most frequent, ties broken by value ascending
        (deterministic). The rank filter plans as a WindowGroupLimit —
        each map task keeps only its local top-k before the exchange,
        so the shuffle carries O(groups x k), not the value table."""
        from pyspark.sql import Window

        ms = granularity_ms(granularity)
        if (ms, col) not in self._freq_tables:
            raise KeyError(f"{col!r} is not a freq_cols entry")
        df = self._freq_tables[(ms, col)].read(spark).filter(
            F.col("n_occ") > 0
        )
        w = Window.partitionBy("bucket_ms", *self.group_cols).orderBy(
            F.desc("n_occ"), F.asc(col)
        )
        return (
            df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("bucket_ms", *self.group_cols, col, "n_occ", "rank")
        )

    def read_sketches(self, spark: SparkSession, granularity: str) -> DataFrame:
        """Raw rollup rows INCLUDING the mergeable ``hll_<col>`` sketch
        binaries — the input for deriving coarser ad-hoc windows:
        ``.groupBy(coarser_bucket).agg(hll_union_agg("hll_c"))``."""
        return self.table(granularity).read(spark)
