"""Changelog-maintained join view (incremental view maintenance for
joins).

The one derived-table shape the maintenance layer did not yet cover:
a denormalized view ``V = L JOIN R`` kept consistent with two
CDC-maintained base tables WITHOUT ever recomputing the join. This is
the classic delta-join decomposition (Blakeley et al.'s incremental
view maintenance, the same algebra streaming engines use for
changelog-to-changelog joins)::

    V_new = L_new JOIN R_new
    dV    = dL JOIN R_new   UNION   (L_new \\ dL) JOIN dR

applied per committed batch. Each side's contribution is O(|batch|)
against BOUNDED reads of the other side — never a rescan of either
base table:

* **fact delta** (``dL``): post-images probe the dim's CURRENT state
  via ``LakeTable.lookup_many`` — bucket pruning + zone maps + Bloom
  sidecars, so a 100 TB dim answers a batch's probes from the handful
  of files its keys hash into. The probe result is batch-bounded and
  broadcast: the fact delta never shuffles.
* **dim delta** (``dR``): the affected fact rows are exactly those
  whose foreign key is in the batch's changed-dim key set — a
  multi-point ``('fk', 'in', keys)`` read against the fact table,
  pruned by the zone maps the ``'in'`` operator consults per file
  (compact the fact table with ``sort_cols=[fk]`` or z-order on the
  fk to make this prune sharp). The changed-dim post-images are
  batch-bounded and broadcast.

The view is itself a ``LakeTable`` keyed by the LEFT key (each fact
row yields at most one view row), so maintenance inherits the engine's
exactly-once ledger, WAP, snapshots, and — with ``changelog=True`` —
emits its own changelog for further downstream hops.

Join semantics: ``how='inner'`` (a fact row with no matching dim row
has NO view row; it appears when its dim arrives — the "late
dimension" contract) or ``how='left'`` (unmatched fact rows surface
with null dim columns). NULL foreign keys never match (SQL
semantics). Dim-side payload columns that collide with fact columns
are suffixed (``right_suffix``, default ``"_r"``); the dim's key
columns are dropped from the view (the fact's fk columns already
carry those values for matched rows).

Ordering contract: call maintenance AFTER both base tables have
committed the batch (the Replayer's maintenance loop already runs
post-commit). Replaying pipelines must replay both sides in their
original interleaving for the view's intermediate states to
reproduce; the FINAL state is order-insensitive because the last
delta on each key always reads the other side's final state.

Reference parity note: the reference SMT catalog has no join
(transforms are single-record), so this is engine-level capability
beyond aiven/transforms-for-apache-kafka-connect — the piece a user
replacing a Connect + downstream-warehouse stack needs from the
downstream half.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.streaming.sink import LakeTable

_META_COLS = ("_change_type", "_change_lsn", "epoch", "batch_id")


@dataclass
class MaintainedJoin:
    """Maintain ``view = left JOIN right ON left[fk_cols] = right.key``.

    Attach to a ``Replayer(maintain=[...])`` on the FACT side (the
    maintenance protocol calls :meth:`apply_changes` with each
    committed batch's changelog); attach :meth:`right_maintainer` to
    the dim side's Replayer. When one driver advances both tables in
    the same batch, call :meth:`apply_both` once instead — one atomic
    view commit.

    ``max_probe_keys`` bounds the driver-side key collection both
    probe paths use (the same bounded-collect shape as lookup_many and
    the topic router). A batch touching more distinct keys than that
    falls back to a full-table hash join for that side — still one
    shuffle, never wrong, just not file-pruned.
    """

    root: str
    left: LakeTable
    right: LakeTable
    fk_cols: list[str]
    how: str = "inner"
    n_buckets: int = 16
    right_suffix: str = "_r"
    max_probe_keys: int = 10_000
    changelog: bool = False
    #: downstream maintenance specs folded from the VIEW's changelog
    #: after each commit (MaintainedAggregate / TimeRollup / any
    #: apply_changes maintainer) — the medallion chain facts+dims ->
    #: joined silver -> gold rollups stays incremental end to end
    maintain: list = field(default_factory=list)
    view: LakeTable = field(init=False)

    def __post_init__(self):
        if self.how not in ("inner", "left"):
            raise ValueError(f"how must be 'inner' or 'left', got {self.how!r}")
        if self.maintain and not self.changelog:
            raise ValueError(
                "downstream maintenance folds the view's changelog: "
                "construct the MaintainedJoin with changelog=True"
            )
        if len(self.fk_cols) != len(self.right.key_cols):
            raise ValueError(
                f"fk_cols {self.fk_cols} must match right key "
                f"{self.right.key_cols} positionally"
            )
        # fk overlapping the left key is allowed (1:1 joins)
        # discovery=True: view deltas are batch-bounded, so folds touch
        # few buckets — at 100 TB view size the merge must read/rewrite
        # ONLY those, never the whole view
        self.view = LakeTable(
            os.path.join(self.root, "view"),
            key_cols=list(self.left.key_cols),
            n_buckets=self.n_buckets,
            discovery=True,
            merge_strategy="broadcast",
            changelog=self.changelog,
        )

    # ------------------------------------------------------------------
    # right-side payload shaping
    # ------------------------------------------------------------------
    def _right_cols(self) -> list[str]:
        return [f["name"] for f in self.right.payload_fields()]

    def _right_null(self, c: str):
        """A typed NULL for a right payload column (type from the dim
        manifest): an untyped ``F.lit(None)`` is void-typed, which the
        sink deliberately refuses to WRITE (parquet cannot store void)
        — so a left-join fold padding a never-matched fact must declare
        the column with its real type or the view schema would never
        learn it."""
        from pyspark.sql import types as T

        for f in self.right.payload_fields():
            if f["name"] == c:
                dt = T.StructField.fromJson(
                    {"metadata": {}, "nullable": True, **f}
                ).dataType
                return F.lit(None).cast(dt)
        return F.lit(None).cast("string")

    def _renamed(self, c: str, left_cols: set[str]) -> str:
        out = c if c not in left_cols else f"{c}{self.right_suffix}"
        if out != c and out in left_cols:
            raise ValueError(
                f"right column {c!r} collides with a left column even "
                f"after suffixing ({out!r}) — pick another right_suffix"
            )
        return out

    def _prep_right(self, rdf: DataFrame, left_cols: list[str]) -> DataFrame:
        """Project a right-side frame to (join keys as __rk*, renamed
        payload, __rm match flag)."""
        lset = set(left_cols)
        sel = [
            F.col(k).alias(f"__rk{i}")
            for i, k in enumerate(self.right.key_cols)
        ]
        for c in self._right_cols():
            name = self._renamed(c, lset)
            # accumulate so two right columns cannot silently emit the
            # same output name (e.g. 'label' suffixing onto a literal
            # 'label_r' sibling)
            lset.add(name)
            if c in rdf.columns:
                sel.append(F.col(c).alias(name))
            else:
                sel.append(self._right_null(c).alias(name))
        return rdf.select(*sel).withColumn("__rm", F.lit(True))

    def _join_cond(self, ldf: DataFrame, rdf: DataFrame):
        cond = None
        for i, fk in enumerate(self.fk_cols):
            c = ldf[fk] == rdf[f"__rk{i}"]
            cond = c if cond is None else (cond & c)
        return cond

    # ------------------------------------------------------------------
    # fact-side delta
    # ------------------------------------------------------------------
    def _left_delta_updates(self, changes: DataFrame) -> DataFrame:
        spark = changes.sparkSession
        drop = [c for c in _META_COLS if c in changes.columns]
        posts = changes.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).drop(*drop)
        # collision-suffix decisions must be stable across batches: an
        # insert-only changelog may omit fact columns earlier batches
        # carried (merge unions schemas), and a right column suffixed
        # against the MANIFEST must never come back unsuffixed — that
        # would write dim values into the fact's column
        lm = self.left.manifest()
        left_cols = list(posts.columns) + [
            f["name"] for f in (lm["schema"] or {"fields": []})["fields"]
            if f["name"] not in posts.columns
        ]
        dels = (
            changes.filter(F.col("_change_type") == "delete")
            .select(*self.left.key_cols)
            .withColumn("__is_delete", F.lit(True))
        )

        # probe the dim's current state for the batch's fk values:
        # bucket-pruned multi-get when the distinct-key set is bounded,
        # full dim read (plain hash join) past the bound
        key_rows = (
            posts.select(
                *[F.col(fk).alias(k) for fk, k in
                  zip(self.fk_cols, self.right.key_cols)]
            )
            .na.drop()
            .distinct()
            .limit(self.max_probe_keys + 1)
            .collect()
        )
        right_empty = self.right.manifest()["schema"] is None
        if right_empty:
            rcur = None
        elif len(key_rows) > self.max_probe_keys:
            rcur = self.right.read(spark)
            broadcast_right = False
        else:
            rcur = (
                self.right.lookup_many(spark, [r.asDict() for r in key_rows])
                if key_rows
                else None
            )
            broadcast_right = True

        if rcur is None:
            # no dim rows can match: inner -> every post is a delete;
            # left -> posts upsert with all-null right columns
            if self.how == "inner":
                unmatched = posts.select(*self.left.key_cols).withColumn(
                    "__is_delete", F.lit(True)
                )
                return unmatched.unionByName(dels)
            padded = posts
            taken = set(left_cols)
            for c in self._right_cols():
                name = self._renamed(c, taken)
                taken.add(name)
                padded = padded.withColumn(name, self._right_null(c))
            padded = padded.withColumn("__is_delete", F.lit(False))
            return padded.unionByName(dels, allowMissingColumns=True)

        rside = self._prep_right(rcur, left_cols)
        if broadcast_right:
            rside = F.broadcast(rside)
        joined = posts.join(rside, self._join_cond(posts, rside), "left")
        nrk = len(self.right.key_cols)
        matched = (
            joined.filter(F.col("__rm").isNotNull())
            .drop("__rm", *[f"__rk{i}" for i in range(nrk)])
            .withColumn("__is_delete", F.lit(False))
        )
        if self.how == "left":
            unmatched = (
                joined.filter(F.col("__rm").isNull())
                .drop("__rm", *[f"__rk{i}" for i in range(nrk)])
                .withColumn("__is_delete", F.lit(False))
            )
            ups = matched.unionByName(unmatched)
        else:
            unmatched = (
                joined.filter(F.col("__rm").isNull())
                .select(*self.left.key_cols)
                .withColumn("__is_delete", F.lit(True))
            )
            ups = matched.unionByName(unmatched, allowMissingColumns=True)
        return ups.unionByName(dels, allowMissingColumns=True)

    # ------------------------------------------------------------------
    # dim-side delta
    # ------------------------------------------------------------------
    def _right_delta_updates(
        self, changes: DataFrame, exclude_left: DataFrame | None
    ) -> DataFrame | None:
        if self.left.manifest()["schema"] is None:
            # no facts yet — nothing references the changed dims (a
            # free driver-side check, before any Spark job)
            return None
        spark = changes.sparkSession
        drop = [c for c in _META_COLS if c in changes.columns]
        rposts = changes.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).drop(*drop)
        affected = (
            changes.filter(
                F.col("_change_type").isin(
                    "insert", "update_postimage", "delete"
                )
            )
            .select(*self.right.key_cols)
            .na.drop()
            .distinct()
        )
        key_rows = affected.limit(self.max_probe_keys + 1).collect()
        if not key_rows:
            return None

        if len(key_rows) <= self.max_probe_keys:
            vals_by_col = {
                k: [r[k] for r in key_rows] for k in self.right.key_cols
            }
            if len(self.fk_cols) == 1:
                # single-col fk: multi-point zone-map prune at the scan
                aff_left = self.left.read(
                    spark,
                    where=[(
                        self.fk_cols[0], "in",
                        vals_by_col[self.right.key_cols[0]],
                    )],
                )
            else:
                # composite fk: per-column 'in' conditions still prune
                # conjunctively; exact tuple membership via semi join
                aff_left = self.left.read(
                    spark,
                    where=[
                        (fk, "in", vals_by_col[k])
                        for fk, k in zip(self.fk_cols, self.right.key_cols)
                    ],
                )
                keys_df = affected.select(
                    *[F.col(k).alias(fk) for fk, k in
                      zip(self.fk_cols, self.right.key_cols)]
                )
                aff_left = aff_left.join(
                    F.broadcast(keys_df), on=list(self.fk_cols), how="left_semi"
                )
        else:
            keys_df = affected.select(
                *[F.col(k).alias(fk) for fk, k in
                  zip(self.fk_cols, self.right.key_cols)]
            )
            aff_left = self.left.read(spark).join(
                keys_df, on=list(self.fk_cols), how="left_semi"
            )

        if exclude_left is not None:
            aff_left = aff_left.join(
                F.broadcast(exclude_left.select(*self.left.key_cols)),
                on=list(self.left.key_cols),
                how="left_anti",
            )
        # NOTE: a batch whose changed dim keys match no facts yields a
        # runtime-empty update frame here — the view's discovery merge
        # resolves that to a ledger-only commit (touched=[], static
        # schema still unioned) in the same single evaluation, so no
        # emptiness pre-probe is needed on this path.
        left_cols = aff_left.columns
        rside = F.broadcast(self._prep_right(rposts, left_cols))
        joined = aff_left.join(rside, self._join_cond(aff_left, rside), "left")
        nrk = len(self.right.key_cols)
        matched = (
            joined.filter(F.col("__rm").isNotNull())
            .drop("__rm", *[f"__rk{i}" for i in range(nrk)])
            .withColumn("__is_delete", F.lit(False))
        )
        if self.how == "left":
            # the dim row vanished (or never matched): keep the fact
            # row, null the dim columns
            unmatched = (
                joined.filter(F.col("__rm").isNull())
                .drop("__rm", *[f"__rk{i}" for i in range(nrk)])
                .withColumn("__is_delete", F.lit(False))
            )
            return matched.unionByName(unmatched)
        unmatched = (
            joined.filter(F.col("__rm").isNull())
            .select(*self.left.key_cols)
            .withColumn("__is_delete", F.lit(True))
        )
        return matched.unionByName(unmatched, allowMissingColumns=True)

    # ------------------------------------------------------------------
    # maintenance protocol entry points
    # ------------------------------------------------------------------
    def apply_changes(
        self, changes: DataFrame, *, epoch: str, batch_id: int
    ) -> dict:
        """Fold one committed FACT-side batch (Replayer maintenance
        protocol signature)."""
        return self._apply(changes, None, epoch=epoch, batch_id=batch_id,
                           tag="L")

    def apply_right_changes(
        self, changes: DataFrame, *, epoch: str, batch_id: int
    ) -> dict:
        """Fold one committed DIM-side batch."""
        return self._apply(None, changes, epoch=epoch, batch_id=batch_id,
                           tag="R")

    def apply_both(
        self,
        left_changes: DataFrame,
        right_changes: DataFrame,
        *,
        epoch: str,
        batch_id: int,
    ) -> dict:
        """Fold one batch that advanced BOTH sides — one atomic view
        commit (dL joins the dim's post-batch state; dR touches only
        fact rows outside dL)."""
        return self._apply(left_changes, right_changes, epoch=epoch,
                           batch_id=batch_id, tag="LR")

    def right_maintainer(self):
        """Adapter whose ``apply_changes`` folds DIM-side changes —
        attach to the dim pipeline's ``Replayer(maintain=[...])``."""
        outer = self

        class _RightAdapter:
            def apply_changes(self, changes, *, epoch, batch_id):
                return outer.apply_right_changes(
                    changes, epoch=epoch, batch_id=batch_id
                )

        return _RightAdapter()

    def _apply(
        self,
        left_changes: DataFrame | None,
        right_changes: DataFrame | None,
        *,
        epoch: str,
        batch_id: int,
        tag: str,
    ) -> dict:
        # distinct ledger epochs per side: the same source (epoch,
        # batch_id) may legitimately arrive once from each side
        vepoch = f"{epoch}#{tag}"
        src = left_changes if left_changes is not None else right_changes
        spark = src.sparkSession
        if self.view.committed(vepoch, batch_id):
            # one ledger is the single source of truth — including for
            # batches that folded as verifiably-empty no-ops (a no-op
            # folded before the facts existed must NOT re-apply its
            # stale post-images on replay: every later fact batch
            # probed the dim's state including it). Still fold
            # downstream maintenance: a crash between the view commit
            # and a maintainer's update replays as (skip view, apply
            # maintainer) — exactly-once via each ledger.
            self._fold_downstream(spark, vepoch, batch_id)
            return {"skipped": True, "reason": "already committed"}
        parts: list[DataFrame] = []
        excl = None
        if left_changes is not None:
            parts.append(self._left_delta_updates(left_changes))
            drop = [c for c in _META_COLS if c in left_changes.columns]
            excl = left_changes.drop(*drop).select(*self.left.key_cols).distinct()
        if right_changes is not None:
            rpart = self._right_delta_updates(right_changes, excl)
            if rpart is not None:
                parts.append(rpart)
        if not parts:
            # nothing to fold — still ledger the batch (ledger-only
            # commit, works pre-schema) so replays skip it. A base-side
            # commit may have just ESTABLISHED the dim's schema (e.g. a
            # delete merged into an empty dim table) without producing
            # change rows: the view's contract now includes the dim
            # payload columns (nulls on unmatched/old rows), so widen
            # the view schema in the same ledger commit — otherwise no
            # later fold would ever add them for facts that are never
            # touched again.
            out = self.view.commit_empty(
                epoch=vepoch, batch_id=batch_id,
                widen=self._missing_right_fields() or None,
            )
            return dict(out, noop=True)
        upd = parts[0]
        for p in parts[1:]:
            upd = upd.unionByName(p, allowMissingColumns=True)
        out = self.view.merge(upd, epoch=vepoch, batch_id=batch_id)
        self._fold_downstream(spark, vepoch, batch_id)
        return out

    def _missing_right_fields(self) -> list[dict]:
        """Renamed right payload fields the view's schema lacks —
        schema-JSON field dicts typed from the dim's manifest. The
        rename walk mirrors ``_prep_right`` exactly (taken starts from
        the LEFT table's columns and accumulates), so the widened
        names always match what a later data fold would emit."""
        vm = self.view.manifest()
        lm = self.left.manifest()
        if vm["schema"] is None:
            return []
        taken = ({f["name"] for f in lm["schema"]["fields"]}
                 if lm["schema"] is not None else set())
        have = {f["name"] for f in vm["schema"]["fields"]}
        out = []
        for f in self.right.payload_fields():
            name = self._renamed(f["name"], taken)
            taken.add(name)
            if name not in have:
                out.append(dict(f, name=name, nullable=True))
        return out

    def _fold_downstream(self, spark, vepoch: str, batch_id: int) -> None:
        if not self.maintain:
            return
        from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
            fold_maintenance,
        )

        fold_maintenance(
            self.view, self.maintain, spark, epoch=vepoch, batch_id=batch_id
        )

    def read(self, spark, **kwargs) -> DataFrame:
        """The maintained join, served from the view table (snapshot /
        tag / where kwargs pass through to ``LakeTable.read``)."""
        return self.view.read(spark, **kwargs)
