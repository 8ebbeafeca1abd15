"""Incremental view maintenance over the row-level changelog.

The changelog (``LakeTable(changelog=True)``) tags every committed
batch's net row changes with Delta-CDF-style ``_change_type`` values —
including *pre-images* for updates and deletes. That is exactly the
retraction stream a downstream materialized aggregate needs: apply
``+post`` and ``-pre`` per group and the aggregate stays consistent
with the base table WITHOUT ever rescanning it. At 100 TB that is the
difference between an O(|batch|) maintenance job per commit and an
O(|table|) recompute.

The maintained aggregate lives in its own ``LakeTable`` keyed by the
group columns, so maintenance inherits the engine's exactly-once
machinery for free: each update commits under the SOURCE batch's
(epoch, batch_id) and a crashed/replayed pipeline skips already-applied
batches through the agg table's own ledger.

Supported aggregates: COUNT(*) and SUM(col) — the self-maintainable
ones (they fold under retraction without auxiliary state) — plus
MIN/MAX via ``minmax_cols``. MIN/MAX are NOT self-maintainable (the
classic view-maintenance result: retracting the current min requires a
rescan of the group), so they ride the same policy machinery as the
sketches: inserts fold exactly (``least``/``greatest``), and a
retraction that could have held a bound — value netting negative in
the batch (same-value churn nets zero and folds exactly) AND sitting
at-or-below the stored min or at-or-above the stored max — marks the
group violated. Under
``on_retraction='recompute'`` only the violated groups' bounds are
rebuilt from the base table (broadcast-semi-join-bounded scan), keeping
MIN/MAX exact under arbitrary updates/deletes at O(affected groups)
cost; a retraction strictly inside the open interval (min, max) folds
for free. ``'stale'`` degrades to the monotone ever-seen envelope.

``distinct_cols`` adds APPROX_COUNT_DISTINCT per group as a maintained
HyperLogLog sketch (Spark's Datasketches ``hll_sketch_agg`` /
``hll_union`` — mergeable, so coarser rollups can be derived from
finer ones by unioning sketches, never by rescanning). HLL is
insert-only (a sketch cannot forget a member), so each batch is
guarded by an exactness criterion: if every ``(group, value)`` nets
``>= 0`` in the batch's changelog, no member can have left any group
and the union-only fold stays EXACT relative to a full recompute.
A batch that violates it follows ``on_retraction``:

* ``"error"`` (default) — raise; the aggregate is untouched and the
  caller decides (recompute that rollup, or switch modes).
* ``"recompute"`` — rebuild ONLY the violated groups' sketches from
  the base table's current state (broadcast-semi-join-bounded scan);
  counts/sums stay on the exact incremental path. Exact under
  arbitrary updates/deletes, cost proportional to affected groups.
* ``"stale"`` — fold anyway; estimates become *distinct-ever-seen*
  per group, an upper bound of current distinct. For append-mostly
  CDC topics (events, logs, facts) this is the standard trade.

``quantile_cols`` does the same for value DISTRIBUTIONS via KLL
sketches (``kll_sketch_agg_double`` / ``kll_sketch_merge_double``):
per-group approx quantiles (p50/p95/...) maintained incrementally and
mergeable upward. Its guard is stricter — occurrence WEIGHTS matter,
so any retraction carrying a non-null value violates (even same-value
churn would double-weight it); the same three policies apply, with
'stale' meaning an insert-weighted distribution.

``moment_cols`` maintains AVG / VARIANCE / STDDEV per group through
the first three signed power sums — ``m0_<col>`` (non-null count),
``m1_<col>`` (sum) and ``m2_<col>`` (sum of squares). Unlike MIN/MAX
and the sketches these are *exactly self-maintainable*: every moment
folds under retraction with a sign flip, so arbitrary updates, deletes
and value moves stay exact with NO guard, NO policy and NO base-table
rescan — the same contract as count/sum. They are also additive, so
coarser rollups derive from finer ones by plain summation (a day
bucket's moments are the sum of its hour buckets'). Derive the
statistics at read time with :func:`moment_stats`:
``avg = m1/m0``, ``var_samp = (m2 - m1²/m0)/(m0-1)`` (clamped at 0
against floating-point cancellation), ``std = sqrt(var)``. The
power-sum method trades one subtraction of near-equal doubles for
mergeability — at ~15 significant digits that costs a few ulps
relative to a streaming Welford pass, which is why the derived
statistics should be rounded before equality comparison.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.streaming.sink import LakeTable


@dataclass
class MaintainedAggregate:
    """A COUNT/SUM group aggregate the Replayer keeps consistent with
    the base table: attach via ``Replayer(maintain=[...])`` and every
    committed batch's changelog is folded in right after the merge —
    including on crash/replay, where both the source merge and the
    aggregate update dedupe through their own ledgers."""

    table: LakeTable
    group_cols: list[str]
    sum_cols: list[str] = field(default_factory=list)
    count_col: str = "n_rows"
    #: group columns computed from the changelog row rather than stored
    #: in it (e.g. a time bucket: streaming/rollup.py) — name -> Column
    #: expression over the changelog's columns; applied to pre- AND
    #: post-images, so retractions leave the same derived group they
    #: entered
    derived: dict = field(default_factory=dict)
    #: per-group APPROX_COUNT_DISTINCT(col) maintained as a mergeable
    #: HLL sketch column ``hll_<col>`` (module docstring: exactness
    #: guard + on_retraction policy)
    distinct_cols: list[str] = field(default_factory=list)
    #: per-group quantile distribution of a numeric col maintained as a
    #: mergeable KLL sketch column ``kll_<col>``. Stricter guard than
    #: HLL (occurrence weights matter, not just membership): ANY
    #: retraction whose value is non-null violates the group — same
    #: on_retraction policies apply
    quantile_cols: list[str] = field(default_factory=list)
    #: per-group MIN(col)/MAX(col) maintained as ``min_<col>`` /
    #: ``max_<col>``: inserts fold exactly; a NET-negative retraction
    #: at-or-below the stored min (or at-or-above the stored max)
    #: violates the group — same on_retraction policies (module
    #: docstring)
    minmax_cols: list[str] = field(default_factory=list)
    #: per-group AVG/VAR/STDDEV maintained as signed power sums
    #: ``m0_<col>``/``m1_<col>``/``m2_<col>`` — exactly
    #: self-maintainable (no guard, no policy); read the statistics
    #: with :func:`moment_stats`
    moment_cols: list[str] = field(default_factory=list)
    on_retraction: str = "error"


def moment_stats(col: str) -> list:
    """Column expressions deriving ``avg_<col>``, ``var_<col>``
    (sample variance) and ``std_<col>`` from the maintained power sums
    ``m0_<col>/m1_<col>/m2_<col>``. AVG is NULL for a group whose
    members are all NULL (m0 = 0); variance/stddev are NULL below two
    non-null members and clamped at 0 against cancellation ulps."""
    m0, m1, m2 = (F.col(f"m{i}_{col}") for i in range(3))
    avg = F.when(m0 > 0, m1 / m0)
    var = F.when(
        m0 > 1, F.greatest(F.lit(0.0), (m2 - m1 * m1 / m0) / (m0 - 1))
    )
    return [
        avg.alias(f"avg_{col}"),
        var.alias(f"var_{col}"),
        F.sqrt(var).alias(f"std_{col}"),
    ]


def batch_changes(
    table: LakeTable, spark: SparkSession, *, epoch: str, batch_id: int
) -> DataFrame:
    """One committed batch's changelog rows.

    Reads the batch's directory directly (no listing of the whole
    ``_changes`` tree — at 10^6 committed batches that listing is the
    cost that matters) after verifying the batch is in the ledger; the
    partition columns are re-attached as literals so the shape matches
    ``read_changelog``.
    """
    import os

    if not table.committed(epoch, batch_id):
        raise ValueError(
            f"batch ({epoch!r}, {batch_id}) is not committed — its "
            "changelog (if any) is not yet readable"
        )
    if not table.has_changes(epoch, batch_id):
        # ledger-only empty batch, or a net-empty change set (e.g. only
        # deletes of absent keys): an empty frame, not a parquet
        # schema-inference crash
        return spark.createDataFrame(
            [], table._changelog_schema(table.manifest())
        )
    chg_dir = os.path.join(
        table.root, "_changes", f"epoch={epoch}", f"batch_id={batch_id}"
    )
    return (
        spark.read.parquet(chg_dir)
        .withColumn("epoch", F.lit(epoch))
        .withColumn("batch_id", F.lit(batch_id))
    )


def incremental_agg_update(
    agg_table: LakeTable,
    changes: DataFrame,
    *,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    count_col: str = "n_rows",
    derived: dict | None = None,
    distinct_cols: list[str] | None = None,
    quantile_cols: list[str] | None = None,
    minmax_cols: list[str] | None = None,
    moment_cols: list[str] | None = None,
    on_retraction: str = "error",
    base_table: LakeTable | None = None,
    max_recompute_collect: int = 100_000,
    epoch: str,
    batch_id: int,
) -> dict:
    """Fold ONE batch's changelog into a materialized
    ``GROUP BY group_cols`` aggregate (COUNT(*) + SUM(sum_cols)).

    ``agg_table`` must be keyed by ``group_cols``. Groups whose row
    count reaches zero are deleted from the aggregate (their keys
    vanished from the base table). Null measure values contribute
    nothing to sums on insert AND on retraction — matching
    ``SUM``-ignores-nulls semantics; a group holding only null measures
    reports sum 0 (document ``COALESCE(SUM(x), 0)`` to SQL consumers).
    NULL group values are NOT maintained (the lake table's key contract
    forbids NULL keys); SQL recomputes should compare with
    ``WHERE g IS NOT NULL``.

    Scale shape: one groupBy over the (batch-sized) changelog, one
    full-outer join against the aggregate table — whose cardinality is
    the number of groups, not base rows — and one ledgered merge.
    Batches must be applied in commit order per epoch (same contract as
    replay itself); re-applying a batch is a ledger no-op.

    ``max_recompute_collect`` bounds the driver-side collect of
    violated group keys on the ``on_retraction='recompute'`` path: the
    set is normally batch-bounded (a few churned groups), but an
    adversarial batch (mass timestamp moves across millions of groups)
    must not collect millions of rows — beyond the cap the rebuild
    switches to a join-based plan that never leaves the executors.
    """
    sum_cols = list(sum_cols or [])
    distinct_cols = list(distinct_cols or [])
    quantile_cols = list(quantile_cols or [])
    minmax_cols = list(minmax_cols or [])
    moment_cols = list(moment_cols or [])
    sketch_cols = distinct_cols + quantile_cols
    guarded_cols = sketch_cols + minmax_cols
    if on_retraction not in ("error", "stale", "recompute"):
        raise ValueError(
            "on_retraction must be 'error', 'stale' or 'recompute'"
        )
    if on_retraction == "recompute" and guarded_cols and base_table is None:
        raise ValueError(
            "on_retraction='recompute' needs base_table (the maintenance "
            "loop passes the Replayer's table automatically)"
        )
    spark = changes.sparkSession
    for name, expr in (derived or {}).items():
        # derived groups (e.g. time buckets) are computed identically
        # on pre- and post-images: a retraction always lands in the
        # bucket its insertion created, even if the source column moved
        changes = changes.withColumn(name, expr)
    # the lake table's key contract forbids NULL keys (hash-bucket
    # joins are not null-safe), so NULL group values cannot be
    # maintained — they are excluded here, on BOTH insertions and
    # retractions, keeping the non-null groups exact. SQL consumers
    # comparing against a recompute should add `WHERE g IS NOT NULL`.
    nn = changes
    for g in group_cols:
        nn = nn.filter(F.col(g).isNotNull())
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    m = agg_table.manifest()
    agg_exists = m["schema"] is not None and m["buckets"]
    affected: list | None = None
    viol_df: DataFrame | None = None  # over-cap fallback: stays distributed
    if guarded_cols and on_retraction in ("error", "recompute"):
        # exactness guards — sketches cannot forget, so any batch that
        # would require forgetting is caught here. One bounded job over
        # the batch-sized changelog: 'error' short-circuits on the
        # first violation, 'recompute' collects the violating GROUPS
        # (bounded by the batch's touched groups) for a targeted
        # sketch rebuild.
        viol_groups = None
        if distinct_cols:
            # HLL (set semantics): a (group, value) netting < 0 means a
            # MEMBER may have left the group; same-value churn is fine
            viol_groups = (
                nn.select(
                    *group_cols,
                    sign.alias("__s"),
                    F.explode(
                        F.array(*[
                            F.struct(
                                F.lit(c).alias("c"),
                                F.col(c).cast("string").alias("v"),
                            )
                            for c in distinct_cols
                        ])
                    ).alias("cv"),
                )
                .filter(F.col("cv.v").isNotNull())
                .groupBy(*group_cols, "cv.c", "cv.v")
                .agg(F.sum("__s").alias("__net"))
                .filter(F.col("__net") < 0)
                .select(*group_cols)
                .distinct()
            )
        if quantile_cols:
            # KLL (multiset semantics): occurrence weights matter, so
            # ANY retraction carrying a non-null value violates —
            # even a same-value update would double-weight the value
            some_q = None
            for c in quantile_cols:
                cond = F.col(c).isNotNull()
                some_q = cond if some_q is None else (some_q | cond)
            viol_kll = (
                nn.filter(sign == -1)
                .filter(some_q)
                .select(*group_cols)
                .distinct()
            )
            viol_groups = (
                viol_kll if viol_groups is None
                else viol_groups.unionByName(viol_kll).distinct()
            )
        if minmax_cols:
            # MIN/MAX: per-(group, value) netting first (same idea as
            # the HLL guard) — a retraction whose value nets >= 0 in
            # the batch (the standard same-value update_preimage/
            # postimage churn) leaves the value present and folds
            # exactly; only a NET-negative value that also sits
            # at-or-outside a stored bound (<= min or >= max) can move
            # it. Strictly-interior net losses fold for free too.
            neg = (
                nn.select(
                    *group_cols,
                    sign.alias("__s"),
                    F.explode(
                        F.array(*[
                            F.struct(
                                F.lit(c).alias("c"),
                                F.col(c).cast("double").alias("v"),
                            )
                            for c in minmax_cols
                        ])
                    ).alias("mv"),
                )
                .filter(F.col("mv.v").isNotNull())
                .groupBy(
                    *group_cols,
                    F.col("mv.c").alias("__mc"),
                    F.col("mv.v").alias("__mv"),
                )
                .agg(F.sum("__s").alias("__net"))
                .filter(F.col("__net") < 0)
            )
            # short-circuit on the (batch-sized) net set so pure-insert
            # and churn-only batches never read the aggregate table
            if neg.limit(1).count() == 0:
                viol_mm = None
            elif agg_exists:
                cur_mm = agg_table.read(spark).select(
                    *group_cols,
                    *[F.col(f"min_{c}").alias(f"__cmin_{c}")
                      for c in minmax_cols],
                    *[F.col(f"max_{c}").alias(f"__cmax_{c}")
                      for c in minmax_cols],
                )
                # bound the guard join to the (batch-sized) net set
                # BEFORE joining: without the broadcast semi-join this
                # shuffled the ENTIRE aggregate table (O(groups)) for
                # every batch carrying any net-negative value — the
                # exact O(|aggregate|) cost the module's O(affected
                # groups) contract exists to avoid
                cur_mm = cur_mm.join(
                    F.broadcast(neg.select(*group_cols).distinct()),
                    on=list(group_cols), how="leftsemi",
                )
                joined = neg.join(cur_mm, on=list(group_cols), how="left")
                cond = None
                for c in minmax_cols:
                    v = F.col("__mv")
                    hit = (F.col("__mc") == c) & (
                        F.col(f"__cmin_{c}").isNull()
                        | (v <= F.col(f"__cmin_{c}"))
                        | (v >= F.col(f"__cmax_{c}"))
                    )
                    cond = hit if cond is None else (cond | hit)
                viol_mm = (
                    joined.filter(cond).select(*group_cols).distinct()
                )
            else:
                # no aggregate state yet: any net-negative value is
                # conservatively a violation
                viol_mm = neg.select(*group_cols).distinct()
            if viol_mm is not None:
                viol_groups = (
                    viol_mm if viol_groups is None
                    else viol_groups.unionByName(viol_mm).distinct()
                )
        if viol_groups is None:
            pass  # minmax-only guard short-circuited: nothing violated
        elif on_retraction == "error":
            if viol_groups.limit(1).count():
                raise ValueError(
                    f"batch ({epoch!r}, {batch_id}) retracts from a "
                    f"guarded column (sketched "
                    f"{distinct_cols + quantile_cols}, min/max "
                    f"{minmax_cols}): sketches cannot forget and a "
                    "retracted bound needs a group rescan. Use "
                    "on_retraction='recompute' (targeted rebuild from "
                    "the base table) or accept insert-only semantics "
                    "with on_retraction='stale'."
                )
        else:
            # bounded probe (the joinview/dlq pattern): collect at most
            # cap+1 keys; an over-cap violated set falls back to the
            # join-based rebuild below instead of flooding the driver
            affected = viol_groups.limit(max_recompute_collect + 1).collect()
            if len(affected) > max_recompute_collect:
                affected, viol_df = None, viol_groups
    # sketch input: insert-side images only (the F.when nulls out
    # retraction rows; hll_sketch_agg ignores nulls)
    delta = nn.groupBy(*group_cols).agg(
        F.sum(sign).alias("__d_n"),
        *[
            F.sum(F.col(c).cast("double") * sign).alias(f"__d_{c}")
            for c in sum_cols
        ],
        *[
            F.hll_sketch_agg(
                F.when(sign == 1, F.col(c).cast("string"))
            ).alias(f"__d_hll_{c}")
            for c in distinct_cols
        ],
        *[
            # an all-NULL input yields a non-NULL EMPTY buffer that
            # kll_sketch_get_quantile_double later rejects with
            # KLL_INVALID_INPUT_SKETCH_BUFFER (verified on this Spark);
            # nullify it at the source so fold/read treat it as absent
            F.when(
                F.count(F.when(sign == 1, F.col(c))) > 0,
                F.kll_sketch_agg_double(
                    F.when(sign == 1, F.col(c).cast("double"))
                ),
            ).alias(f"__d_kll_{c}")
            for c in quantile_cols
        ],
        *[
            # insert-side images only: retractions that survive the
            # guard are strictly inside (min, max) and fold for free
            F.min(F.when(sign == 1, F.col(c).cast("double"))).alias(
                f"__d_min_{c}"
            )
            for c in minmax_cols
        ],
        *[
            F.max(F.when(sign == 1, F.col(c).cast("double"))).alias(
                f"__d_max_{c}"
            )
            for c in minmax_cols
        ],
        # signed power sums: every moment retracts exactly (sign flip),
        # so moments need no guard — same contract as count/sum. m0 is
        # the NON-NULL member count (a null value moves no moment in
        # either direction), summed over a 0/±1 expression so it is
        # never NULL for a touched group.
        *[
            e
            for c in moment_cols
            for e in (
                F.sum(
                    F.when(F.col(c).isNotNull(), sign).otherwise(F.lit(0))
                ).alias(f"__d_m0_{c}"),
                F.sum(F.col(c).cast("double") * sign).alias(f"__d_m1_{c}"),
                F.sum(
                    F.col(c).cast("double") * F.col(c).cast("double")
                    * sign
                ).alias(f"__d_m2_{c}"),
            )
        ],
    )
    sum_out = [f"sum_{c}" for c in sum_cols]
    hll_out = [f"hll_{c}" for c in distinct_cols]
    kll_out = [f"kll_{c}" for c in quantile_cols]
    min_out = [f"min_{c}" for c in minmax_cols]
    max_out = [f"max_{c}" for c in minmax_cols]
    # (delta-col, out-col) per maintained power sum; m0 folds as long
    mom_pairs = [
        (f"__d_m{i}_{c}", f"m{i}_{c}")
        for c in moment_cols
        for i in range(3)
    ]
    def _sketch_fold(cur_col, delta_col, union_fn):
        # union is only defined over two non-null sketches; either side
        # alone passes through (a group may see a batch with no new
        # non-null members, or be brand new)
        return (
            F.when(cur_col.isNull(), delta_col)
            .when(delta_col.isNull(), cur_col)
            .otherwise(union_fn(cur_col, delta_col))
        )

    if agg_exists:
        cur = agg_table.read(spark).select(
            *group_cols, count_col, *sum_out, *hll_out, *kll_out,
            *min_out, *max_out, *[o for _, o in mom_pairs],
        )
        # delta drives a LEFT join: only TOUCHED groups are re-emitted
        # and merged — a batch touching 3 groups of a 10^6-group
        # aggregate produces a 3-row update set, not a full rewrite
        j = delta.join(cur, on=list(group_cols), how="left")
        upd = j.select(
            *group_cols,
            (
                F.coalesce(F.col(count_col), F.lit(0))
                + F.col("__d_n")
            ).alias(count_col),
            *[
                (
                    F.coalesce(F.col(o), F.lit(0.0))
                    + F.coalesce(F.col(f"__d_{c}"), F.lit(0.0))
                ).alias(o)
                for c, o in zip(sum_cols, sum_out)
            ],
            *[
                _sketch_fold(
                    F.col(o), F.col(f"__d_hll_{c}"), F.hll_union
                ).alias(o)
                for c, o in zip(distinct_cols, hll_out)
            ],
            *[
                _sketch_fold(
                    F.col(o), F.col(f"__d_kll_{c}"),
                    F.kll_sketch_merge_double,
                ).alias(o)
                for c, o in zip(quantile_cols, kll_out)
            ],
            # least/greatest skip nulls: either side alone passes through
            *[
                F.least(F.col(o), F.col(f"__d_min_{c}")).alias(o)
                for c, o in zip(minmax_cols, min_out)
            ],
            *[
                F.greatest(F.col(o), F.col(f"__d_max_{c}")).alias(o)
                for c, o in zip(minmax_cols, max_out)
            ],
            *[
                (
                    F.coalesce(
                        F.col(o),
                        F.lit(0) if o.startswith("m0_") else F.lit(0.0),
                    )
                    + F.coalesce(
                        F.col(d),
                        F.lit(0) if o.startswith("m0_") else F.lit(0.0),
                    )
                ).alias(o)
                for d, o in mom_pairs
            ],
        )
    else:
        upd = delta.select(
            *group_cols,
            F.col("__d_n").alias(count_col),
            *[
                F.coalesce(F.col(f"__d_{c}"), F.lit(0.0)).alias(o)
                for c, o in zip(sum_cols, sum_out)
            ],
            *[
                F.col(f"__d_hll_{c}").alias(o)
                for c, o in zip(distinct_cols, hll_out)
            ],
            *[
                F.col(f"__d_kll_{c}").alias(o)
                for c, o in zip(quantile_cols, kll_out)
            ],
            *[
                F.col(f"__d_min_{c}").alias(o)
                for c, o in zip(minmax_cols, min_out)
            ],
            *[
                F.col(f"__d_max_{c}").alias(o)
                for c, o in zip(minmax_cols, max_out)
            ],
            *[
                F.coalesce(
                    F.col(d),
                    F.lit(0) if o.startswith("m0_") else F.lit(0.0),
                ).alias(o)
                for d, o in mom_pairs
            ],
        )
    if affected or viol_df is not None:
        # targeted rebuild: ONLY the violated groups' sketches are
        # recomputed, from the base table's CURRENT state (maintenance
        # runs after the batch's merge, so "current" is exactly the
        # post-batch truth). Derived group columns are recomputed the
        # same way they are for changelog rows — base rows carry the
        # same payload columns. Cost: one base scan reduced by a
        # broadcast semi-join on the (batch-bounded) affected set;
        # count/sum stay on the exact incremental path throughout.
        # Over the collect cap (adversarial mass retraction) the
        # violated set stays a DataFrame: plain shuffle semi-join, and
        # the rebuilt set is too big to broadcast either.
        if viol_df is not None:
            aff_df = viol_df.select(*group_cols)
            _maybe_broadcast = lambda d: d  # noqa: E731
        else:
            aff_df = F.broadcast(
                spark.createDataFrame(affected).select(*group_cols)
            )
            _maybe_broadcast = F.broadcast
        basedf = base_table.read(spark)
        for name, expr in (derived or {}).items():
            basedf = basedf.withColumn(name, expr)
        rebuilt = (
            basedf.join(aff_df, on=list(group_cols), how="leftsemi")
            .groupBy(*group_cols)
            .agg(
                F.lit(True).alias("__rebuilt"),
                *[
                    F.hll_sketch_agg(F.col(c).cast("string")).alias(
                        f"__r_hll_{c}"
                    )
                    for c in distinct_cols
                ],
                *[
                    # same empty-buffer nullification as the delta agg
                    F.when(
                        F.count(F.col(c)) > 0,
                        F.kll_sketch_agg_double(F.col(c).cast("double")),
                    ).alias(f"__r_kll_{c}")
                    for c in quantile_cols
                ],
                *[
                    F.min(F.col(c).cast("double")).alias(f"__r_min_{c}")
                    for c in minmax_cols
                ],
                *[
                    F.max(F.col(c).cast("double")).alias(f"__r_max_{c}")
                    for c in minmax_cols
                ],
            )
        )
        upd = upd.join(
            _maybe_broadcast(rebuilt), on=list(group_cols), how="left"
        )
        rebuilt_pairs = [
            (f"__r_hll_{c}", o) for c, o in zip(distinct_cols, hll_out)
        ] + [
            (f"__r_kll_{c}", o) for c, o in zip(quantile_cols, kll_out)
        ] + [
            (f"__r_min_{c}", o) for c, o in zip(minmax_cols, min_out)
        ] + [
            (f"__r_max_{c}", o) for c, o in zip(minmax_cols, max_out)
        ]
        for r, o in rebuilt_pairs:
            # rebuilt rows take the recomputed sketch VERBATIM (even
            # NULL = zero remaining members); untouched groups keep the
            # incremental fold. A violated group absent from `rebuilt`
            # vanished from the base — its count hits <= 0 below and
            # the row is deleted.
            upd = upd.withColumn(
                o,
                F.when(F.col("__rebuilt"), F.col(r)).otherwise(F.col(o)),
            )
        upd = upd.drop("__rebuilt", *[r for r, _ in rebuilt_pairs])
    upd = upd.withColumn("__is_delete", F.col(count_col) <= 0)
    return agg_table.merge(upd, epoch=epoch, batch_id=batch_id)


def fold_maintenance(
    table: LakeTable,
    maintain: list,
    spark: SparkSession,
    *,
    epoch: str,
    batch_id: int,
) -> None:
    """Fold one committed batch's changelog into every attached
    maintenance spec (the Replayer maintenance loop, factored so any
    changelog-producing component — e.g. a MaintainedJoin's view —
    can chain its own downstream maintainers).

    Safe for fresh AND ledger-skipped batches: a crash between the
    source commit and a maintainer's update replays as (skip source,
    apply maintainer) — each side's own ledger makes the composition
    exactly-once. Batches that wrote no changelog entry (verifiably
    empty) have nothing to fold.
    """
    if not maintain or not table.has_changes(epoch, batch_id):
        return
    changes = batch_changes(table, spark, epoch=epoch, batch_id=batch_id)
    for spec in maintain:
        if hasattr(spec, "apply_changes"):
            # general maintenance protocol: any derived-table
            # maintainer (e.g. NearDupIndex, MaintainedJoin) folds the
            # batch itself, exactly-once through its own tables' ledgers
            spec.apply_changes(changes, epoch=epoch, batch_id=batch_id)
            continue
        incremental_agg_update(
            spec.table,
            changes,
            group_cols=spec.group_cols,
            sum_cols=spec.sum_cols,
            count_col=spec.count_col,
            derived=getattr(spec, "derived", None),
            distinct_cols=getattr(spec, "distinct_cols", None),
            quantile_cols=getattr(spec, "quantile_cols", None),
            minmax_cols=getattr(spec, "minmax_cols", None),
            moment_cols=getattr(spec, "moment_cols", None),
            on_retraction=getattr(spec, "on_retraction", "error"),
            base_table=table,
            epoch=epoch,
            batch_id=batch_id,
        )


def apply_changes_to_table(
    dst: LakeTable,
    changes: DataFrame,
    *,
    epoch: str,
    batch_id: int,
) -> dict:
    """Second-hop CDC (the medallion bronze→silver shape): fold one
    batch's changelog into a DOWNSTREAM LakeTable, reproducing the
    source table's state hop by hop without ever reading the source.

    Post-images upsert; deletes re-delete, carrying ``_change_lsn``
    (the LSN of the deleting event) as their ``_lsn`` so a
    merge-on-read destination's LWW resolution ranks the delete marker
    ABOVE the row it deletes — the pre-image's own LSN would tie with
    the base row and resolve nondeterministically. Pre-image rows are
    skipped (they exist for retraction math, not state). Exactly-once
    per hop via the destination's own ledger under the SOURCE batch id.
    """
    drop_cols = [
        c for c in ("_change_type", "_change_lsn", "epoch", "batch_id")
        if c in changes.columns
    ]
    posts = (
        changes.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        )
        .withColumn("__is_delete", F.lit(False))
    )
    dels = changes.filter(F.col("_change_type") == "delete").withColumn(
        "__is_delete", F.lit(True)
    )
    if "_lsn" in changes.columns:
        dels = dels.withColumn(
            "_lsn", F.coalesce(F.col("_change_lsn"), F.col("_lsn"))
        )
    upd = posts.unionByName(dels).drop(*drop_cols)
    return dst.merge(upd, epoch=epoch, batch_id=batch_id)
