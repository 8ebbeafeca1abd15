"""Changelog-maintained STAR view: one denormalized table over a fact
table and N dimensions, kept consistent per committed batch without
ever recomputing the join — the flat star-schema generalization of
:mod:`joinview` (which stays the two-table primitive and the building
block for snowflake chains).

Per batch, with fact delta ``dL`` and dim deltas ``dR_i``::

    dV =   build(dL posts)                      # probe ALL dims
         U build(facts with fk_i in keys(dR_i)  # per changed dim,
                 for every changed dim, minus dL)   deduped by fact key

``build(rows)`` derives full view rows by probing every dimension's
CURRENT state (maintenance runs after the base commits, so "current"
is exactly the state the recompute join would see):

* fk values are collected (bounded, ``max_probe_keys``) and served by
  ``LakeTable.lookup_many`` — bucket pruning + zone maps + Blooms, so
  a 100 TB dim answers a batch's probes from the files its keys hash
  into; the result is batch-bounded and broadcast. Past the bound the
  probe falls back to a full-dim hash join (never wrong, not pruned).
* affected facts for a changed dim come from the multi-point
  ``('fk_i', 'in', keys)`` read — zone-map file pruning, sharp when
  the fact table is compacted/z-ordered on the fk.
* a fact row survives an ``how='inner'`` dim only if it matches;
  ``how='left'`` dims contribute nulls. A fact whose inner dim
  vanishes is DELETED from the view; it reappears when the dim does.

The view is a ``LakeTable`` keyed by the fact key — ledgered
exactly-once per side (derived epochs ``e#L`` / ``e#D<i>`` /
``e#ALL``), WAP/snapshots/changelog for free, and with
``changelog=True`` it chains its own downstream maintainers
(``maintain=[...]``) like the Replayer does.

Ordering contract: fold a batch AFTER all its base-table commits; a
batch that folds as a verifiably-empty no-op (e.g. dims arriving
before any facts) still lands in the view's ledger via
``LakeTable.commit_empty`` so a pipeline replay cannot re-apply its
stale post-images against later state.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.streaming.sink import LakeTable

_META_COLS = ("_change_type", "_change_lsn", "epoch", "batch_id")


@dataclass
class DimSpec:
    """One dimension of the star: joined on
    ``left[fk_cols] == table.key_cols`` (positional)."""

    table: LakeTable
    fk_cols: list[str]
    how: str = "inner"  # 'inner' or 'left'
    #: suffix applied to payload columns that collide with the fact's
    #: or an earlier dim's; default "_d<i>"
    suffix: str | None = None


@dataclass
class MaintainedStar:
    root: str
    left: LakeTable
    dims: list[DimSpec]
    n_buckets: int = 16
    max_probe_keys: int = 10_000
    changelog: bool = False
    maintain: list = field(default_factory=list)
    view: LakeTable = field(init=False)

    def __post_init__(self):
        if not self.dims:
            raise ValueError("a star needs at least one dimension")
        for i, d in enumerate(self.dims):
            if d.how not in ("inner", "left"):
                raise ValueError(
                    f"dims[{i}].how must be 'inner' or 'left', got {d.how!r}"
                )
            if len(d.fk_cols) != len(d.table.key_cols):
                raise ValueError(
                    f"dims[{i}].fk_cols {d.fk_cols} must match the dim key "
                    f"{d.table.key_cols} positionally"
                )
        if self.maintain and not self.changelog:
            raise ValueError(
                "downstream maintenance folds the view's changelog: "
                "construct the MaintainedStar with changelog=True"
            )
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
    # dim payload shaping
    # ------------------------------------------------------------------
    def _dim_payload_cols(self, i: int) -> list[str]:
        return [f["name"] for f in self.dims[i].table.payload_fields()]

    def _dim_null(self, i: int, c: str):
        """Typed NULL for dim i's payload column (type from its
        manifest) — an untyped None is void, which the sink refuses to
        write; see MaintainedJoin._right_null."""
        from pyspark.sql import types as T

        for f in self.dims[i].table.payload_fields():
            if f["name"] == c:
                dt = T.StructField.fromJson(
                    {"metadata": {}, "nullable": True, **f}
                ).dataType
                return F.lit(None).cast(dt)
        return F.lit(None).cast("string")

    def _emitted_name(self, i: int, c: str, taken: set[str]) -> str:
        d = self.dims[i]
        out = c
        if out in taken:
            out = f"{c}{d.suffix if d.suffix is not None else f'_d{i}'}"
        if out in taken:
            raise ValueError(
                f"dims[{i}] column {c!r} collides even after suffixing "
                f"({out!r}) — set an explicit DimSpec.suffix"
            )
        return out

    def _prep_dim(self, i: int, rdf: DataFrame, taken: set[str]):
        """(renamed frame with __sk{i}_* join keys and __sm{i} flag,
        emitted payload names)."""
        d = self.dims[i]
        sel = [
            F.col(k).alias(f"__sk{i}_{j}")
            for j, k in enumerate(d.table.key_cols)
        ]
        emitted = []
        for c in self._dim_payload_cols(i):
            name = self._emitted_name(i, c, taken)
            emitted.append(name)
            # accumulate so two payload columns of ONE dim cannot
            # silently emit the same output name (e.g. 'label'
            # suffixing onto a literal 'label_d1' sibling)
            taken.add(name)
            if c in rdf.columns:
                sel.append(F.col(c).alias(name))
            else:
                sel.append(self._dim_null(i, c).alias(name))
        out = rdf.select(*sel).withColumn(f"__sm{i}", F.lit(True))
        return out, emitted

    def _probe(self, i: int, facts: DataFrame):
        """Current state of dim i restricted to facts' fk values:
        (frame, broadcastable) or (None, _) when the dim is empty or
        no fk value is bound."""
        d = self.dims[i]
        if d.table.manifest()["schema"] is None:
            return None, True
        spark = facts.sparkSession
        key_rows = (
            facts.select(
                *[F.col(fk).alias(k)
                  for fk, k in zip(d.fk_cols, d.table.key_cols)]
            )
            .na.drop()
            .distinct()
            .limit(self.max_probe_keys + 1)
            .collect()
        )
        if not key_rows:
            return None, True
        if len(key_rows) > self.max_probe_keys:
            return d.table.read(spark), False
        return d.table.lookup_many(spark, [r.asDict() for r in key_rows]), True

    # ------------------------------------------------------------------
    # the one rebuild routine both delta paths share
    # ------------------------------------------------------------------
    def _build_rows(self, facts: DataFrame) -> DataFrame:
        """Full view rows for ``facts`` (fact-payload frames): upserts
        for rows matching every inner dim, deletes for the rest."""
        # seed collisions from frame ∪ MANIFEST columns: an insert-only
        # changelog may omit fact columns earlier batches carried, and
        # a dim column suffixed against the manifest must never come
        # back unsuffixed (that would write dim values into the fact's
        # column)
        taken = set(facts.columns)
        lm = self.left.manifest()
        if lm["schema"] is not None:
            taken |= {f["name"] for f in lm["schema"]["fields"]}
        cur = facts
        flags: list[tuple[int, str]] = []
        for i, d in enumerate(self.dims):
            rdf, small = self._probe(i, facts)
            if rdf is None:
                # dim empty / no fk bound: emit its columns as TYPED
                # nulls (parquet cannot write NullType) so the view
                # schema stays stable; inner-matching fails
                m = d.table.manifest()
                if m["schema"] is not None:
                    from pyspark.sql import types as T

                    sch = T.StructType.fromJson(m["schema"])
                    for c in self._dim_payload_cols(i):
                        name = self._emitted_name(i, c, taken)
                        taken.add(name)
                        cur = cur.withColumn(
                            name, F.lit(None).cast(sch[c].dataType)
                        )
                cur = cur.withColumn(f"__sm{i}", F.lit(None).cast("boolean"))
                flags.append((i, f"__sm{i}"))
                continue
            prepped, _emitted = self._prep_dim(i, rdf, taken)  # mutates taken
            if small:
                prepped = F.broadcast(prepped)
            cond = None
            for j, fk in enumerate(d.fk_cols):
                c = cur[fk] == prepped[f"__sk{i}_{j}"]
                cond = c if cond is None else (cond & c)
            cur = cur.join(prepped, cond, "left").drop(
                *[f"__sk{i}_{j}" for j in range(len(d.table.key_cols))]
            )
            flags.append((i, f"__sm{i}"))
        survive = None
        for i, fcol in flags:
            if self.dims[i].how != "inner":
                continue
            c = F.col(fcol).isNotNull()
            survive = c if survive is None else (survive & c)
        flag_cols = [fcol for _, fcol in flags]
        if survive is None:  # all dims are 'left': every row survives
            return cur.drop(*flag_cols).withColumn(
                "__is_delete", F.lit(False)
            )
        ups = (
            cur.filter(survive)
            .drop(*flag_cols)
            .withColumn("__is_delete", F.lit(False))
        )
        # survive is a conjunction of isNotNull() terms — never null —
        # so ups/dels are an exact partition of cur
        dels = (
            cur.filter(~survive)
            .select(*self.left.key_cols)
            .withColumn("__is_delete", F.lit(True))
        )
        return ups.unionByName(dels, allowMissingColumns=True)

    # ------------------------------------------------------------------
    # maintenance protocol
    # ------------------------------------------------------------------
    def apply_changes(
        self, changes: DataFrame, *, epoch: str, batch_id: int
    ) -> dict:
        """Fold one committed FACT-side batch (Replayer protocol)."""
        return self._apply(changes, {}, epoch=epoch, batch_id=batch_id,
                           tag="L")

    def apply_dim_changes(
        self, i: int, changes: DataFrame, *, epoch: str, batch_id: int
    ) -> dict:
        """Fold one committed batch of dimension ``i``."""
        return self._apply(None, {i: changes}, epoch=epoch,
                           batch_id=batch_id, tag=f"D{i}")

    def dim_maintainer(self, i: int):
        """Adapter for dimension ``i``'s ``Replayer(maintain=[...])``."""
        outer = self
        if not 0 <= i < len(self.dims):
            raise ValueError(f"no dims[{i}]")

        class _DimAdapter:
            def apply_changes(self, changes, *, epoch, batch_id):
                return outer.apply_dim_changes(
                    i, changes, epoch=epoch, batch_id=batch_id
                )

        return _DimAdapter()

    def apply_all(
        self,
        left_changes: DataFrame | None,
        dim_changes: dict[int, DataFrame],
        *,
        epoch: str,
        batch_id: int,
    ) -> dict:
        """Fold one batch that advanced the facts and/or several dims —
        one atomic view commit."""
        return self._apply(left_changes, dim_changes, epoch=epoch,
                           batch_id=batch_id, tag="ALL")

    def _apply(
        self,
        left_changes: DataFrame | None,
        dim_changes: dict[int, DataFrame],
        *,
        epoch: str,
        batch_id: int,
        tag: str,
    ) -> dict:
        vepoch = f"{epoch}#{tag}"
        # tolerate None entries in dim_changes (a driver passing "no
        # changes this batch" per dim) exactly like a None left_changes
        dim_changes = {i: c for i, c in (dim_changes or {}).items()
                       if c is not None}
        srcs = [s for s in (left_changes, *dim_changes.values())
                if s is not None]
        if not srcs:
            raise ValueError("apply needs at least one change frame")
        spark = srcs[0].sparkSession
        if self.view.committed(vepoch, batch_id):
            # one ledger is the single source of truth — including for
            # batches that folded as verifiably-empty no-ops (see
            # joinview._apply for the replay argument)
            self._fold_downstream(spark, vepoch, batch_id)
            return {"skipped": True, "reason": "already committed"}

        parts: list[DataFrame] = []
        excl = None
        # the rebuild consumes its inputs several times (one
        # probe-collect per dim, then the joins): pin them for the
        # duration of this commit, releasing even when a build step
        # raises
        pinned: list[DataFrame] = []
        try:
            if left_changes is not None:
                drop = [c for c in _META_COLS if c in left_changes.columns]
                posts = left_changes.filter(
                    F.col("_change_type").isin("insert", "update_postimage")
                ).drop(*drop).persist()
                pinned.append(posts)
                dels = (
                    left_changes.filter(F.col("_change_type") == "delete")
                    .select(*self.left.key_cols)
                    .withColumn("__is_delete", F.lit(True))
                )
                parts.append(
                    self._build_rows(posts).unionByName(
                        dels, allowMissingColumns=True
                    )
                )
                excl = (
                    left_changes.drop(*drop)
                    .select(*self.left.key_cols)
                    .distinct()
                )
            if dim_changes and self.left.manifest()["schema"] is not None:
                affected = None
                for i, changes in dim_changes.items():
                    a = self._affected_facts(i, changes)
                    if a is None:
                        continue
                    affected = (a if affected is None
                                else affected.unionByName(a))
                if affected is not None:
                    affected = affected.dropDuplicates(
                        list(self.left.key_cols)
                    )
                    if excl is not None:
                        affected = affected.join(
                            F.broadcast(excl), on=list(self.left.key_cols),
                            how="left_anti",
                        )
                    affected = affected.persist()
                    pinned.append(affected)
                    # when no fact references the changed dim keys,
                    # contribute nothing: merging a runtime-empty frame
                    # would still cost a merge commit, and the
                    # ledger-only path widens the schema if this batch
                    # introduced new dim payload columns
                    if not affected.isEmpty():
                        parts.append(self._build_rows(affected))

            if not parts:
                # ledger-only commit (works pre-schema): replays skip.
                # A dim's schema may have just appeared in a batch that
                # touches no fact rows (e.g. a delete merged into an
                # empty dim): widen the view schema with its emitted
                # payload columns in the same commit, else no later
                # fold would add them for never-retouched facts.
                out = self.view.commit_empty(
                    epoch=vepoch, batch_id=batch_id,
                    widen=self._missing_dim_fields() or None,
                )
                return dict(out, noop=True)
            upd = parts[0]
            for p in parts[1:]:
                upd = upd.unionByName(p, allowMissingColumns=True)
            out = self.view.merge(upd, epoch=vepoch, batch_id=batch_id)
        finally:
            for df in pinned:
                df.unpersist()
        self._fold_downstream(spark, vepoch, batch_id)
        return out

    def _affected_facts(self, i: int, changes: DataFrame) -> DataFrame | None:
        """Facts referencing dim ``i``'s changed keys — the multi-point
        'in' read, pruned by the fact table's zone maps."""
        d = self.dims[i]
        spark = changes.sparkSession
        affected = (
            changes.filter(
                F.col("_change_type").isin(
                    "insert", "update_postimage", "delete"
                )
            )
            .select(*d.table.key_cols)
            .na.drop()
            .distinct()
        )
        key_rows = affected.limit(self.max_probe_keys + 1).collect()
        if not key_rows:
            return None
        if len(key_rows) <= self.max_probe_keys:
            vals = {
                k: [r[k] for r in key_rows] for k in d.table.key_cols
            }
            facts = self.left.read(
                spark,
                where=[
                    (fk, "in", vals[k])
                    for fk, k in zip(d.fk_cols, d.table.key_cols)
                ],
            )
            if len(d.fk_cols) > 1:
                keys_df = affected.select(
                    *[F.col(k).alias(fk)
                      for fk, k in zip(d.fk_cols, d.table.key_cols)]
                )
                facts = facts.join(
                    F.broadcast(keys_df), on=list(d.fk_cols),
                    how="left_semi",
                )
            return facts
        keys_df = affected.select(
            *[F.col(k).alias(fk)
              for fk, k in zip(d.fk_cols, d.table.key_cols)]
        )
        return self.left.read(spark).join(
            keys_df, on=list(d.fk_cols), how="left_semi"
        )

    # ------------------------------------------------------------------
    # downstream
    # ------------------------------------------------------------------
    def _missing_dim_fields(self) -> list[dict]:
        """Emitted dim payload fields the view's schema lacks —
        schema-JSON field dicts typed from each dim's manifest. The
        naming walk mirrors ``_build_rows`` (taken starts from the
        fact table's columns, dims in order, names accumulate), so the
        widened names always match what a later data fold emits."""
        vm = self.view.manifest()
        lm = self.left.manifest()
        if vm["schema"] is None:
            return []
        taken = ({f["name"] for f in lm["schema"]["fields"]}
                 if lm["schema"] is not None else set())
        have = {f["name"] for f in vm["schema"]["fields"]}
        out = []
        for i, d in enumerate(self.dims):
            for f in d.table.payload_fields():
                name = self._emitted_name(i, f["name"], taken)
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
        return self.view.read(spark, **kwargs)
