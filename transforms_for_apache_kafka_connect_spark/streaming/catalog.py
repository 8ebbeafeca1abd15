"""SQL catalog over lake tables: ``spark.sql`` as a first-class consumer.

Every surface so far hands back a DataFrame; the remaining consumer a
"switch from the reference" user brings along is plain SQL — BI tools,
ad-hoc analysts, downstream jobs that know the lake only as table
names. ``LakeCatalog`` closes that gap: it registers lake tables
(including whole router roots) as Spark temp views, resolving
merge-on-read deltas and time travel through the tables' own ``read``
path, so ``spark.sql("SELECT ... FROM orders JOIN customers ...")``
sees exactly the LWW-resolved, manifest-pinned state a ``read()``
caller would.

Semantics — a view is a SNAPSHOT, not a live pointer:

* Registering captures the table's CURRENT manifest (or the requested
  ``version``/``tag``) into the view's plan. Later commits do NOT leak
  into an open view mid-query — the same snapshot-isolation contract
  ``read()`` gives a single DataFrame, extended to the SQL surface.
* ``refresh()``/``refresh_all()`` re-resolve: unpinned views advance to
  CURRENT, ``tag=`` views follow the (possibly re-pointed) tag, and
  ``version=`` views are immutable by construction — refresh is a
  plan-identical no-op for them.
* The catalog plugs into the engine: pass it (or
  ``catalog.refresher()``) as an ``on_commit`` hook on a ``Replayer``
  and every durably applied batch refreshes the affected views, so a
  long-running SQL consumer session tracks ingest without polling.

Scale note: a temp view costs nothing at rest — it is a named logical
plan; Catalyst prunes columns and pushes filters into the underlying
parquet scan exactly as for the ``read()`` DataFrame, and the
manifest-level zone-map/bucket pruning available through
``read(where=...)`` can be baked into a view via ``where=``.
"""
from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from transforms_for_apache_kafka_connect_spark.errors import (
    ConfigException,
    EmptyTableError,
)

_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def _sql_name(raw: str) -> str:
    """Sanitize a directory/topic name into a SQL identifier (dots and
    dashes are legal in Kafka topic names but not in unquoted SQL)."""
    name = re.sub(r"[^A-Za-z0-9_]", "_", raw)
    if not name or not _NAME_RE.match(name):
        name = "t_" + name
    return name


def _check_name(name: str) -> None:
    if not _NAME_RE.match(name):
        raise ConfigException(
            f"view name must be a SQL identifier "
            f"([A-Za-z_][A-Za-z0-9_]*): {name!r}"
        )


@dataclass
class _ViewSpec:
    table: Any  # LakeTable (duck-typed: anything with .read(spark, ...))
    version: int | None
    tag: str | None
    where: list[tuple] | None
    #: manifest version the live temp view was built from (None =
    #: pending, no view materialized yet) — lets refresh() short-circuit
    #: to one driver-side manifest read when nothing moved
    seen: int | None = None


class _ChangelogSource:
    """Duck-typed view source: a table's committed changelog."""

    def __init__(self, table, epoch: str | None):
        self.table, self.epoch = table, epoch

    def manifest(self):
        # staleness key = (manifest version, changelog dir count): a
        # vacuum with changelog retention deletes batch dirs WITHOUT a
        # new manifest version, and a view plan baked over the old dir
        # list would otherwise stay broken behind the short-circuit
        import glob as _glob

        m = self.table.manifest()
        n_dirs = len(_glob.glob(os.path.join(
            self.table.root, "_changes", "epoch=*", "batch_id=*"
        )))
        return {**m, "version": [m["version"], n_dirs]}

    def read(self, spark, version=None, tag=None, where=None):
        return self.table.read_changelog(spark, epoch=self.epoch)


class _SnapshotSource:
    """Duck-typed view source: one router topic pinned at the
    cross-table consistent snapshot (txn.py). ``refresh_all`` pins ONE
    snapshot per router for the whole cycle (``_pinned``) so sibling
    views can never advance to different transactions mid-refresh."""

    def __init__(self, router, topic: str):
        self.router, self.topic = router, topic
        self._pinned: dict | None = None

    def _snap(self) -> dict:
        return (
            self._pinned
            if self._pinned is not None
            else self.router.snapshot()
        )

    def manifest(self):
        return {"version": self._snap().get(self.topic, 0)}

    def read(self, spark, version=None, tag=None, where=None):
        snap = self._snap()
        return self.router.table_for(self.topic).read(
            spark, version=snap[self.topic]
        )


class LakeCatalog:
    """Register lake tables as Spark SQL temp views and keep them fresh.

    One catalog per SparkSession; names live in the session's temp-view
    namespace (``createOrReplaceTempView``), so they compose with any
    other temp views the user already has.
    """

    def __init__(self, spark: SparkSession, store: str | None = None):
        """``store``: optional path to a JSON catalog spec. With it set,
        registrations PERSIST — every register/unregister writes the
        spec (atomic tmp+rename, same durability idiom as the
        manifest), and constructing ``LakeCatalog(spark, store=path)``
        in a NEW session (or process) restores every persisted view
        immediately: the spec records each table's root + constructor
        options, and the restore re-opens the tables and rebuilds the
        views at their CURRENT state (or pinned version/tag).

        Why not ``saveAsTable``/metastore registration: a managed table
        COPIES rows at registration time, so SQL consumers would read
        data frozen at the last save, silently stale after every
        commit — the opposite of this catalog's snapshot-then-refresh
        contract. The spec store keeps metadata-only persistence with
        the engine's own file-based durability; a metastore/Iceberg-REST
        backend would slot in at this same seam if an external catalog
        service is available.

        Snapshot-router views (``register_snapshot``) are session-only:
        a router carries its transform chain, which has no serialized
        form — re-register them after reconstructing the router.
        """
        self.spark = spark
        self._views: dict[str, _ViewSpec] = {}
        self._store = store
        self._restoring = False
        if store and os.path.exists(store):
            self._restore()

    # ------------------------------------------------- persistent store

    def _restore(self) -> None:
        """Re-register every persisted view. The store is NOT written
        during restore (nothing changed), so a mid-restore failure —
        a torn manifest, a moved table root — leaves the spec intact:
        fix the table and reconstruct the catalog."""
        from transforms_for_apache_kafka_connect_spark.streaming.sink import (
            LakeTable,
        )

        self._restoring = True
        try:
            for ent in self._load_store().values():
                table = LakeTable(root=ent["root"], **ent.get("opts", {}))
                if ent["kind"] == "changes":
                    self.register_changes(
                        ent["name"], table, epoch=ent.get("epoch")
                    )
                else:
                    where = (
                        [tuple(c) for c in ent["where"]]
                        if ent.get("where") is not None
                        else None
                    )
                    self.register(
                        ent["name"], table,
                        version=ent.get("version"), tag=ent.get("tag"),
                        where=where,
                    )
        finally:
            self._restoring = False

    def _load_store(self) -> dict[str, dict]:
        import json

        if not (self._store and os.path.exists(self._store)):
            return {}
        with open(self._store) as f:
            saved = json.load(f)
        return {e["name"]: e for e in saved.get("views", [])}

    def _persist(self, name: str, ent: dict | None) -> None:
        """Record/drop ONE view's spec: read-modify-write against the
        CURRENT store contents under an advisory file lock, so
        concurrent sessions sharing a store only ever touch their own
        names — a wholesale rewrite from this instance's memory would
        silently erase the other sessions' registrations, and an
        unlocked read-modify-write could still drop a name written
        between our read and our rename. (Last-writer-wins per name;
        the atomic rename keeps the file always parseable for lockless
        READERS — only writers take the lock.)"""
        import json
        import uuid as _uuid

        if not self._store or self._restoring:
            return
        lock_path = self._store + ".lock"
        lock_f = open(lock_path, "a")
        try:
            try:
                import fcntl

                fcntl.flock(lock_f, fcntl.LOCK_EX)
            except ImportError:  # non-POSIX: best-effort RMW
                pass
            merged = self._load_store()
            if ent is None:
                merged.pop(name, None)
            else:
                merged[name] = ent
            tmp = self._store + f".tmp-{_uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump(
                    {"views": [merged[n] for n in sorted(merged)]},
                    f, indent=1,
                )
            os.replace(tmp, self._store)
        finally:
            lock_f.close()  # releases the flock

    @staticmethod
    def _table_entry(table) -> dict | None:
        """A LakeTable's (root, constructor options) as JSON — None for
        duck-typed sources that cannot be reconstructed from a spec."""
        import dataclasses

        from transforms_for_apache_kafka_connect_spark.streaming.sink import (
            LakeTable,
        )

        if not isinstance(table, LakeTable):
            return None
        opts = {
            f.name: getattr(table, f.name)
            for f in dataclasses.fields(LakeTable)
            if f.name != "root"
        }
        return {"root": table.root, "opts": opts}

    # ------------------------------------------------------------ views

    def register(
        self,
        name: str,
        table,
        *,
        version: int | None = None,
        tag: str | None = None,
        where: list[tuple] | None = None,
    ) -> DataFrame:
        """Register ``table`` as temp view ``name`` (snapshot of CURRENT,
        or of ``version``/``tag``). ``where`` bakes manifest-level file
        pruning conditions into the view (same shape as ``read``).

        Re-registering an existing name re-points it — that IS the
        refresh primitive, so no separate unregister-first dance.

        A table with no committed schema yet (a fresh sink an engine is
        about to start filling) registers as a PENDING view: the spec
        is recorded, ``spark.table(name)`` stays unresolvable, and the
        first refresh after the first commit materializes it — so
        ``LakeCatalog`` + ``Replayer(on_commit=[catalog])`` can be
        wired up before ingest begins. Returns None in that case.
        """
        _check_name(name)
        # resolve the staleness key BEFORE building the plan: a commit
        # landing between the two reads then leaves seen OLDER than the
        # plan (a harmless extra refresh later) — the reverse order
        # could record a version the view never actually serves, making
        # the last commit of a burst invisible behind the short-circuit
        try:
            m0 = table.manifest()
            seen = (
                version
                if version is not None
                else (m0.get("tags") or {}).get(tag)
                if tag is not None
                else m0["version"]
            )
        except (OSError, ValueError):
            seen = None
        try:
            df = table.read(self.spark, version=version, tag=tag, where=where)
        except EmptyTableError:
            # pending: make the NAME unresolvable too — a previous
            # registration under it must not keep serving another
            # table's rows while this one awaits its first commit
            if name in self._views:
                self.spark.catalog.dropTempView(name)
            self._views[name] = _ViewSpec(table, version, tag, where)
            self._persist_table(name, table, version, tag, where)
            return None
        df.createOrReplaceTempView(name)
        self._views[name] = _ViewSpec(table, version, tag, where, seen=seen)
        self._persist_table(name, table, version, tag, where)
        return df

    def _persist_table(self, name, table, version, tag, where) -> None:
        ent = self._table_entry(table)
        if ent is None:
            return  # duck-typed source (changes view refresh) — keep
            # whatever spec registered it originally
        self._persist(name, {
            "name": name, "kind": "table", **ent,
            "version": version, "tag": tag,
            "where": [list(c) for c in where] if where else None,
        })

    def register_root(self, root: str, *, prefix: str = "") -> list[str]:
        """Discover every lake table under ``root`` (any immediate child
        directory carrying a ``_manifest/CURRENT`` pointer — the router
        layout) and register each as ``prefix + <sanitized dir name>``.

        Two directory names that sanitize to the same SQL identifier
        would silently shadow each other — refused loudly instead.
        Returns the registered view names, sorted.
        """
        from transforms_for_apache_kafka_connect_spark.streaming.sink import LakeTable

        found: dict[str, str] = {}
        for entry in sorted(os.listdir(root)):
            d = os.path.join(root, entry)
            if not os.path.isfile(os.path.join(d, "_manifest", "CURRENT")):
                continue
            name = prefix + _sql_name(entry)
            if name in found:
                raise ConfigException(
                    f"directories {found[name]!r} and {entry!r} both "
                    f"sanitize to view name {name!r}; register them "
                    f"individually with distinct names"
                )
            found[name] = entry
        names = []
        for name, entry in found.items():
            # LakeTable adopts key_cols / n_buckets / changelog from the
            # stored manifest, so opening by root alone is sufficient
            self.register(name, LakeTable(root=os.path.join(root, entry)))
            names.append(name)
        return sorted(names)

    def register_changes(self, name: str, table, *, epoch: str | None = None):
        """Register a table's row-level CHANGELOG (Delta CDF analog) as
        a SQL view: rows tagged ``_change_type`` with ``epoch`` /
        ``batch_id`` partition columns, only ever from committed
        batches. SQL consumers incrementally tail the lake with plain
        ``WHERE batch_id > :watermark`` — the same contract as
        ``read_changelog``, refreshable like any other view."""
        _check_name(name)
        src = _ChangelogSource(table, epoch)
        # seen BEFORE the plan (same safe direction as register); the
        # source's staleness key covers both manifest version and the
        # changelog dir population (vacuum retention deletes dirs
        # without a version bump)
        seen = src.manifest()["version"]
        df = src.read(self.spark)
        df.createOrReplaceTempView(name)
        self._views[name] = _ViewSpec(src, None, None, None, seen=seen)
        ent = self._table_entry(table)
        if ent is not None:
            self._persist(name, {
                "name": name, "kind": "changes", **ent, "epoch": epoch,
            })
        return df

    def register_snapshot(self, router, *, prefix: str = "") -> list[str]:
        """Register every table of a ``TransactionalRouter`` pinned at
        its cross-table consistent snapshot: SQL joins across the
        registered views can never observe a torn transaction (the
        version map only advances after EVERY table of a batch is
        live). Refresh advances all views to the NEXT consistent
        snapshot — atomically from the SQL user's point of view within
        one refresh_all() call."""
        snap = router.snapshot()
        names = []
        for topic in sorted(snap):
            name = prefix + _sql_name(topic)
            _check_name(name)
            if name in names:
                raise ConfigException(
                    f"topics sanitize to duplicate view name {name!r}"
                )
            df = router.table_for(topic).read(self.spark, version=snap[topic])
            df.createOrReplaceTempView(name)
            self._views[name] = _ViewSpec(
                _SnapshotSource(router, topic), None, None, None,
                seen=snap[topic],
            )
            names.append(name)
        return names

    def unregister(self, name: str) -> None:
        self._views.pop(name, None)
        self._persist(name, None)
        self.spark.catalog.dropTempView(name)

    def names(self) -> list[str]:
        return sorted(self._views)

    # ---------------------------------------------------------- refresh

    def refresh(self, name: str) -> DataFrame | None:
        """Re-resolve one view: unpinned → CURRENT manifest, ``tag`` →
        wherever the tag now points, ``version`` → unchanged plan.

        Cheap when nothing moved: one driver-side manifest read decides
        whether the resolved version changed; the plan is only rebuilt
        (and the temp view re-registered) when it did — so an
        ``on_commit`` hook refreshing a large catalog costs O(views)
        tiny file reads per batch, not O(views) plan rebuilds."""
        spec = self._views.get(name)
        if spec is None:
            raise ConfigException(f"no registered view: {name!r}")
        if spec.seen is not None:
            try:
                m = spec.table.manifest()
                target = (
                    spec.version
                    if spec.version is not None
                    else (m.get("tags") or {}).get(spec.tag)
                    if spec.tag is not None
                    else m["version"]
                )
            except (OSError, ValueError):
                target = None
            if target is not None and target == spec.seen:
                return self.spark.table(name)
        return self.register(
            name, spec.table,
            version=spec.version, tag=spec.tag, where=spec.where,
        )

    def refresh_all(self) -> list[str]:
        # pin ONE consistent snapshot per router for the whole cycle:
        # without this, each snapshot view would call router.snapshot()
        # independently and a transaction landing mid-cycle could pin
        # sibling views at DIFFERENT transactions — exactly the torn
        # join register_snapshot promises to prevent
        snap_sources = [
            spec.table
            for spec in self._views.values()
            if isinstance(spec.table, _SnapshotSource)
        ]
        pinned: dict[int, dict] = {}
        for src in snap_sources:
            key = id(src.router)
            if key not in pinned:
                pinned[key] = src.router.snapshot()
            src._pinned = pinned[key]
        try:
            for name in list(self._views):
                self.refresh(name)
        finally:
            for src in snap_sources:
                src._pinned = None
        return self.names()

    # ----------------------------------------------------- engine hook

    def __call__(self, result: dict) -> None:
        """``Replayer(on_commit=[catalog])``: refresh EVERY registered
        view after each durably applied batch (the hook carries no
        table identity, and refresh short-circuits to one manifest read
        per unmoved view, so this stays cheap). For a very large
        catalog fed by one engine, prefer the narrower
        ``catalog.refresher("its_view")`` hook. Refresh is idempotent,
        so replayed/skipped batches are harmless."""
        self.refresh_all()

    def refresher(self, *names: str):
        """A narrower ``on_commit`` hook refreshing only ``names`` —
        for engines that own one table of a many-view catalog."""
        def hook(result: dict) -> None:
            for n in names:
                self.refresh(n)
        return hook
