"""Iceberg-backed LakeTable (config-switched; SURVEY.md §7.5).

The sandbox ships no Iceberg runtime jar, so this impl is gated on the
catalog actually resolving — ``available(spark)`` — and the hermetic
``LakeTable`` (sink.py) is the tested default. On a real cluster with
``--packages org.apache.iceberg:iceberg-spark-runtime-*`` and a
catalog configured, ``IcebergLakeTable`` is a drop-in for the same
``Replayer``.

Commit protocol (per merge call), in order:

1. **Stage**: persist the update set and run one count action. This
   completes every ``Observation`` riding on the update plan, so the
   error gate can be evaluated *before* the table is touched.
2. **Error gate**: call ``pre_commit(n_updates)``. A raise here aborts
   the batch with the Iceberg table byte-identical to before — the
   exact analog of the reference's per-record ``DataException``
   preventing the write (reference TombstoneHandler.java:58-64), and
   of the hermetic sink gating its manifest swap (sink.py).
3. **Schema evolution**: additive ``ALTER TABLE ADD COLUMNS`` for
   update columns the table lacks (north_star: "added columns ...
   propagate ... automatically"). Runs after the gate so a failing
   batch does not evolve the schema either.
4. **MERGE INTO** — one Iceberg snapshot commit (upsert + delete).
5. **Ledger**: append (epoch, batch_id) [+ lineage] to table
   properties — a second, metadata-only commit.

Exactly-once contract: when the Iceberg jar is present the batch's
ledger entry rides **inside the MERGE snapshot itself** — the MERGE is
wrapped in the Java ``CommitMetadata.withCommitProperties`` thread-local
(reached via py4j; it is not exposed through Spark SQL), which stamps
``tkc.epoch``/``tkc.batch-id``/``tkc.lineage`` into the snapshot
summary, making data + ledger ONE atomic commit. The table-properties
ledger (5) is then only a fast-path cache: ``committed()`` falls back
to scanning the ``.snapshots`` metadata table when the cache lacks an
entry, so a crash between (4) and (5) is fully recoverable. If the
``CommitMetadata`` class or the py4j callback server is unavailable,
the sink degrades to the two-commit protocol, which is still
effectively-once: batches replay **in order per epoch** and the update
set is a deterministic LWW function of the batch, so re-running the
identical MERGE is state-idempotent (same upserts; deletes of absent
keys no-op).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession


def available(spark: SparkSession) -> bool:
    """True if an Iceberg catalog is usable in this session."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkSessionCatalog"
        )
        return True
    except Exception:
        return False


def _quote(ident: str) -> str:
    """Backtick-quote one identifier part (defensive — identifiers come
    from trusted config, but a reserved word or dotted column must not
    break the generated SQL)."""
    return "`" + ident.replace("`", "``") + "`"


def _quote_table(identifier: str) -> str:
    return ".".join(_quote(p) for p in identifier.split("."))


def _commit_metadata(spark: SparkSession):
    """py4j handle to ``org.apache.iceberg.CommitMetadata`` (the
    snapshot-summary thread-local), or None when the jar is absent."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.CommitMetadata")
        return jvm.org.apache.iceberg.CommitMetadata
    except Exception:
        return None


def _ensure_callback(gateway) -> None:  # seam for mocked-catalog tests
    from pyspark.java_gateway import ensure_callback_server_started

    ensure_callback_server_started(gateway)


class _PyCallable:
    """Python implementation of java.util.concurrent.Callable for the
    py4j callback bridge."""

    def __init__(self, fn: Callable[[], Any]):
        self._fn = fn

    def call(self):
        self._fn()
        return None

    class Java:
        implements = ["java.util.concurrent.Callable"]


@dataclass
class IcebergLakeTable:
    """Same interface as sink.LakeTable: merge / read / committed."""

    identifier: str  # e.g. "lake.db.repositories"
    key_cols: list[str] = field(default_factory=lambda: ["repo", "path"])
    #: cap on ledger/lineage entries kept in table properties (oldest
    #: lineage entries are dropped first; committed batch ids are never
    #: dropped below this cap — for multi-million-batch epochs move the
    #: ledger to its own table)
    max_lineage_entries: int = 1000

    LEDGER_PROP = "tkc.committed"
    LINEAGE_PROP = "tkc.lineage"
    EXTRA_PROP = "tkc.extra"

    def _require(self, spark: SparkSession) -> None:
        if not available(spark):
            raise NotImplementedError(
                "IcebergLakeTable requires an Iceberg runtime jar + "
                "catalog; not available in this environment "
                "(see available()). Use streaming.sink.LakeTable "
                "(hermetic default)."
            )

    def _props(self, spark: SparkSession) -> dict[str, str]:
        return {
            r["key"]: r["value"]
            for r in spark.sql(
                f"SHOW TBLPROPERTIES {_quote_table(self.identifier)}"
            ).collect()
        }

    def _ledger(self, spark: SparkSession) -> list[list]:
        return json.loads(self._props(spark).get(self.LEDGER_PROP, "[]"))

    def _in_snapshot_summaries(
        self, spark: SparkSession, epoch: str, batch_id: int
    ) -> bool:
        """Crash-window recovery: when the ledger cache lacks an entry,
        the authoritative record is the snapshot summary the MERGE
        itself carried (single-commit path). Metadata-only scan —
        skipped entirely in degraded two-commit mode (no CommitMetadata
        class => no summary can ever carry tkc.* keys), so the normal
        per-batch cache miss costs nothing there."""
        if _commit_metadata(spark) is None:
            return False
        try:
            rows = spark.sql(
                "SELECT summary['tkc.epoch'] AS e, "
                "summary['tkc.batch-id'] AS b "
                f"FROM {_quote_table(self.identifier)}.snapshots "
                "WHERE summary['tkc.epoch'] IS NOT NULL"
            ).collect()
        except Exception:
            return False
        return any(
            r["e"] == epoch and r["b"] == str(batch_id) for r in rows
        )

    def committed(self, epoch: str, batch_id: int) -> bool:
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise NotImplementedError(
                "IcebergLakeTable.committed needs an active SparkSession"
            )
        self._require(spark)
        if [epoch, batch_id] in self._ledger(spark):
            return True
        return self._in_snapshot_summaries(spark, epoch, batch_id)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.identifier)

    def extra(self) -> dict[str, Any]:
        """Engine-level key/values recorded via ``merge(manifest_extra=)``
        (e.g. the bootstrap snapshot LSN) — table-properties analog of
        the hermetic sink's manifest ``extra``."""
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise NotImplementedError(
                "IcebergLakeTable.extra needs an active SparkSession"
            )
        self._require(spark)
        return json.loads(self._props(spark).get(self.EXTRA_PROP, "{}"))

    # ------------------------------------------------------------ merge

    def _merge_sql(self, cols: list[str], delete_col: str, view: str) -> str:
        q = _quote
        on = " AND ".join(f"t.{q(c)} = s.{q(c)}" for c in self.key_cols)
        non_key = [c for c in cols if c not in self.key_cols]
        sets = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in non_key)
        # a key-only table has nothing to update: WHEN MATCHED UPDATE
        # with an empty assignment list is malformed SQL — a matched
        # non-delete row is already byte-identical, so drop the clause
        update_clause = (
            f"WHEN MATCHED THEN UPDATE SET {sets}\n" if non_key else ""
        )
        return (
            f"MERGE INTO {_quote_table(self.identifier)} t\n"
            f"USING {q(view)} s\n"
            f"ON {on}\n"
            f"WHEN MATCHED AND s.{q(delete_col)} THEN DELETE\n"
            f"{update_clause}"
            f"WHEN NOT MATCHED AND NOT s.{q(delete_col)} THEN INSERT\n"
            f"  ({', '.join(q(c) for c in cols)}) VALUES "
            f"({', '.join('s.' + q(c) for c in cols)})"
        )

    def _evolve_schema(self, spark: SparkSession, updates: DataFrame,
                       delete_col: str) -> list[str]:
        """Additive-only evolution: ADD COLUMNS the table lacks."""
        existing = {
            f.name for f in spark.table(self.identifier).schema.fields
        }
        new = [
            f for f in updates.schema.fields
            if f.name not in existing and f.name != delete_col
        ]
        if new:
            cols_ddl = ", ".join(
                f"{_quote(f.name)} {f.dataType.simpleString()}" for f in new
            )
            spark.sql(
                f"ALTER TABLE {_quote_table(self.identifier)} "
                f"ADD COLUMNS ({cols_ddl})"
            )
        return [f.name for f in new]

    def merge(
        self,
        updates: DataFrame,
        *,
        epoch: str = "default",
        batch_id: int = 0,
        delete_col: str = "__is_delete",
        lineage: list[dict] | None = None,
        pre_commit=None,
        manifest_extra: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Stage → error gate → evolve schema → MERGE → ledger.

        See the module docstring for the ordering and exactly-once
        rationale. ``pre_commit`` follows the sink.LakeTable contract:
        called with the staged update-row count; raising aborts the
        batch with the table untouched.
        """
        spark = updates.sparkSession
        self._require(spark)
        if [epoch, batch_id] in self._ledger(spark) or (
            self._in_snapshot_summaries(spark, epoch, batch_id)
        ):
            return {"skipped": True, "reason": "already committed"}

        # 1. stage: one action completes the chain's Observations and
        # pins the update set so the MERGE below cannot recompute it
        updates = updates.persist()
        n_upd = updates.count()
        try:
            # 2. error gate BEFORE any mutation — a per-record error
            # aborts here and the table is untouched
            if pre_commit is not None:
                pre_commit(n_upd)

            added: list[str] = []
            one_commit = False
            if n_upd > 0:
                # 3. additive schema evolution (post-gate)
                added = self._evolve_schema(spark, updates, delete_col)

                # 4. data commit: one MERGE snapshot. When the Iceberg
                # CommitMetadata API is reachable the ledger entry is
                # stamped INTO this snapshot's summary (data + ledger =
                # one atomic commit); step 5 then only refreshes the
                # fast-path cache.
                view = f"__tkc_updates_{epoch}_{batch_id}".replace("-", "_")
                updates.createOrReplaceTempView(view)
                cols = [c for c in updates.columns if c != delete_col]
                merge_sql = self._merge_sql(cols, delete_col, view)
                one_commit = self._merge_with_snapshot_props(
                    spark,
                    merge_sql,
                    {
                        "tkc.epoch": epoch,
                        "tkc.batch-id": str(batch_id),
                        "tkc.n-updates": str(n_upd),
                    },
                )
                if not one_commit:
                    spark.sql(merge_sql)

            # 5. ledger commit (metadata-only; see module docstring for
            # the crash-window analysis)
            ledger = self._ledger(spark) + [[epoch, batch_id]]
            props = self._props(spark)
            lin = json.loads(props.get(self.LINEAGE_PROP, "[]"))
            lin += lineage or [
                {"epoch": epoch, "batch_id": batch_id, "n_updates": n_upd}
            ]
            lin = lin[-self.max_lineage_entries:]
            prop_sets = [
                f"'{self.LEDGER_PROP}' = '{json.dumps(ledger)}'",
                f"'{self.LINEAGE_PROP}' = '{json.dumps(lin)}'",
            ]
            if manifest_extra:
                extra = {
                    **json.loads(props.get(self.EXTRA_PROP, "{}")),
                    **manifest_extra,
                }
                prop_sets.append(
                    f"'{self.EXTRA_PROP}' = '{json.dumps(extra)}'"
                )
            spark.sql(
                f"ALTER TABLE {self.identifier} SET TBLPROPERTIES ("
                + ", ".join(prop_sets) + ")"
            )
        finally:
            updates.unpersist()
        return {
            "skipped": False,
            "batch_id": batch_id,
            "n_updates": n_upd,
            "added_columns": added,
            "one_commit": one_commit,
        }

    # --------------------------------------------- single-commit plumbing

    def _merge_with_snapshot_props(
        self, spark: SparkSession, merge_sql: str, props: dict[str, str]
    ) -> bool:
        """Run the MERGE inside ``CommitMetadata.withCommitProperties``
        so the ledger entry lands in the MERGE snapshot's summary.
        Returns False (without running anything) when the API or the
        py4j callback bridge is unavailable — the caller then runs the
        plain two-commit path. If the MERGE itself started, its failure
        propagates (never silently re-run)."""
        cm = _commit_metadata(spark)
        if cm is None:
            return False
        state = {"started": False, "error": None}

        def run() -> None:
            state["started"] = True
            try:
                spark.sql(merge_sql)
            except BaseException as e:  # noqa: BLE001 - recorded, re-raised
                state["error"] = e
                raise

        try:
            gw = spark.sparkContext._gateway
            _ensure_callback(gw)
            jmap = gw.jvm.java.util.HashMap()
            for k, v in props.items():
                jmap.put(k, str(v))
            cm.withCommitProperties(
                jmap, _PyCallable(run), gw.jvm.java.lang.RuntimeException
            )
            return True
        except Exception:
            if state["error"] is not None:
                raise state["error"]
            if state["started"]:
                raise
            return False
