"""Error model.

The reference throws per-record ``DataException`` / config-time
``ConfigException`` (org.apache.kafka.connect.errors). A vectorized
engine cannot throw per row, so (SURVEY.md §4.3):

* config errors -> ``ConfigException`` raised at stage-construction
  time, before any data (mirrors ``configure()``,
  e.g. reference ExtractTimestampConfig.java:75-101);
* schema-shape errors (batch-constant) -> ``DataException`` raised at
  ``apply()`` time from ``df.schema`` inspection (mirrors e.g.
  Hash.java:176-178 "schema can't be null");
* per-record data errors -> a ``__smt_error`` string column; the chain
  end (or ``enforce``) fails the batch with the FIRST error message,
  matching the reference's fail-on-first-record contract.
"""

from __future__ import annotations


class ConfigException(ValueError):
    """Invalid stage configuration (reference: ConfigException)."""


class DataException(RuntimeError):
    """Bad record/schema encountered (reference: DataException)."""


class CommitConflictException(RuntimeError):
    """Another writer advanced the table between this commit's manifest
    read and its publish (optimistic-concurrency check in the manifest
    swap / WAP publish). Re-read and replay the batch — the
    exactly-once ledger makes the retry safe."""


class EmptyTableError(ValueError):
    """The lake table has no schema yet (no commit has landed), so
    there is nothing to read. Subclasses ValueError for backward
    compatibility; catch THIS type rather than matching the message
    text (the catalog's register-before-ingest pending path does)."""


class SchemaEnforcementError(DataException):
    """A strict-schema table (schema_mode='strict') received update
    rows carrying columns its schema lacks. The batch fails BEFORE any
    write and stays replayable; evolve explicitly or drop the columns
    (Delta schema-enforcement analog)."""
