"""Iceberg-backed LakeTable (config-switched; SURVEY.md §7.5).

The sandbox ships no Iceberg runtime jar, so this impl is gated on the
catalog actually resolving — ``available(spark)`` — and the hermetic
``LakeTable`` (sink.py) is the tested default. On a real cluster with
``--packages org.apache.iceberg:iceberg-spark-runtime-*`` and a
catalog configured, ``IcebergLakeTable`` is a drop-in for the same
``Replayer``: identical merge semantics (upsert + delete_when), with
Iceberg handling atomicity/snapshots and this class keeping the
(epoch, batch_id) ledger as table properties so replay stays
idempotent across engines.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

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


@dataclass
class IcebergLakeTable:
    """Same interface as sink.LakeTable: merge / read / committed."""

    identifier: str  # e.g. "lake.db.repositories"
    key_cols: list[str] = field(default_factory=lambda: ["repo", "path"])

    LEDGER_PROP = "tkc.committed"

    def _ledger(self, spark: SparkSession) -> list[list]:
        props = {
            r["key"]: r["value"]
            for r in spark.sql(
                f"SHOW TBLPROPERTIES {self.identifier}"
            ).collect()
        }
        return json.loads(props.get(self.LEDGER_PROP, "[]"))

    def committed(self, epoch: str, batch_id: int) -> bool:
        spark = SparkSession.getActiveSession()
        if spark is None or not available(spark):
            raise NotImplementedError(
                "IcebergLakeTable requires an Iceberg runtime jar + "
                "catalog; not available in this environment "
                "(see available())."
            )
        return [epoch, batch_id] in self._ledger(spark)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.identifier)

    def merge(
        self,
        updates: DataFrame,
        *,
        epoch: str = "default",
        batch_id: int = 0,
        delete_col: str = "__is_delete",
        lineage: list[dict] | None = None,
        pre_commit=None,
    ) -> dict[str, Any]:
        """MERGE INTO <table> USING updates ON key
        WHEN MATCHED AND s.is_delete THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED AND NOT s.is_delete THEN INSERT *

        plus ledger-property update in the same transaction
        (ALTER TABLE ... SET TBLPROPERTIES within the snapshot commit).
        """
        spark = updates.sparkSession
        if not available(spark):
            raise NotImplementedError(
                "Iceberg runtime not on the classpath; use "
                "streaming.sink.LakeTable (hermetic default)"
            )
        ledger = self._ledger(spark)
        if [epoch, batch_id] in ledger:
            return {"skipped": True, "reason": "already committed"}
        updates.createOrReplaceTempView("__tkc_updates")
        on = " AND ".join(f"t.{c} = s.{c}" for c in self.key_cols)
        cols = [c for c in updates.columns if c != delete_col]
        spark.sql(
            f"""
            MERGE INTO {self.identifier} t
            USING __tkc_updates s
            ON {on}
            WHEN MATCHED AND s.{delete_col} THEN DELETE
            WHEN MATCHED THEN UPDATE SET
              {', '.join(f't.{c} = s.{c}' for c in cols if c not in self.key_cols)}
            WHEN NOT MATCHED AND NOT s.{delete_col} THEN INSERT
              ({', '.join(cols)}) VALUES ({', '.join('s.' + c for c in cols)})
            """
        )
        if pre_commit is not None:
            pre_commit()
        ledger.append([epoch, batch_id])
        spark.sql(
            f"ALTER TABLE {self.identifier} SET TBLPROPERTIES "
            f"('{self.LEDGER_PROP}' = '{json.dumps(ledger)}')"
        )
        return {"skipped": False, "batch_id": batch_id}
