"""Data-quality expectations on the merge input (the Delta CHECK
constraint / DLT expectations analog).

An expectation is a SQL boolean over the TABLE-SHAPED update row (post
chain, post LWW — what is about to be merged), with one of three
actions:

* ``fail`` — any violating row aborts the whole batch pre-commit,
  leaving the table untouched and the batch replayable (the same
  contract as the reference's per-record ``DataException``).
* ``drop`` — violating rows are removed from the update set; the drop
  count is reported per batch.
* ``warn`` — violations are counted and logged, rows merge anyway.

Semantics follow SQL CHECK constraints: a predicate that evaluates to
NULL *passes* (unknown is not a violation). Delete rows are exempt —
their payload is the tombstoned row, not data, and "quality" of a
deletion is meaningless.

Scale shape: expectations compile to Column expressions fused into the
merge plan; counting rides the SAME ``Observation`` mechanism (and the
same single write action) the engine's error contract uses — zero
extra jobs on the happy path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

_ACTIONS = ("fail", "drop", "warn")


@dataclass
class Expectation:
    name: str
    expr: str  # SQL boolean over the table-shaped update row
    action: str = "fail"

    def __post_init__(self):
        if self.action not in _ACTIONS:
            raise ValueError(
                f"Expectation action must be one of {_ACTIONS}, "
                f"got {self.action!r}"
            )

    def passes(self, delete_col: str):
        """CHECK-constraint semantics: NULL passes; deletes exempt."""
        return (
            F.coalesce(F.col(delete_col), F.lit(False))
            | F.coalesce(F.expr(self.expr), F.lit(True))
        )


def apply_expectations(
    updates: DataFrame,
    expectations: list[Expectation],
    *,
    delete_col: str = "__is_delete",
    obs_name: str = "expectations",
) -> tuple[DataFrame, Observation | None]:
    """Attach expectations to the update set.

    Returns (updates', observation): violation counts per expectation
    ride the observation (completed by the merge's own write action);
    ``drop``-mode rows are filtered out AFTER counting, so the count
    reports what was dropped.
    """
    if not expectations:
        return updates, None
    obs = Observation(obs_name)
    metrics = [
        F.sum((~e.passes(delete_col)).cast("long")).alias(e.name)
        for e in expectations
    ]
    updates = updates.observe(obs, *metrics)
    drops = [e for e in expectations if e.action == "drop"]
    for e in drops:
        updates = updates.filter(e.passes(delete_col))
    return updates, obs
