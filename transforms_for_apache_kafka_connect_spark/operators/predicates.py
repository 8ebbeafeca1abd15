"""Connect predicate framework — conditional SMT application.

Kafka Connect lets any transform be guarded by a named predicate
(`transforms.X.predicate=P`, `transforms.X.negate=true`) with three
stock predicates (`org.apache.kafka.connect.transforms.predicates.*`):

* ``topic_name_matches``  — TopicNameMatches: java `Pattern.matches`
  (FULL match, unlike FilterByFieldValue's *find* semantics) on the
  record topic; config ``pattern`` required non-empty.
* ``has_header_key``      — HasHeaderKey: at least one header with the
  configured ``name``.
* ``record_is_tombstone`` — RecordIsTombstone: value is null.

The reference's chains run inside a Connect runtime where these
predicates are available to every SMT (the reference repo itself ships
none — this is runtime-compat, like RegexRouter in
reference integration-test IntegrationTest.java:226-229).

Spark-first design: a predicate compiles to ONE boolean Column; the
chain compiler wraps the guarded stage so the whole conditional still
fuses into a single Catalyst plan:

* row-filter stages (``is_row_filter``): apply to the matching split,
  union the non-matching rows back (`unionByName`, schema unchanged
  by definition of a filter);
* mutator stages: snapshot the envelope columns, apply the stage to
  all rows, then per-column ``when(pred, new).otherwise(old)`` — with
  struct realignment when the stage widened a struct schema (e.g. a
  guarded ConcatFields), so unmatched rows carry nulls in the new
  fields exactly like Connect's untouched records lack them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.errors import ConfigException
from transforms_for_apache_kafka_connect_spark.operators.base import (
    Stage,
    align_to_type,
    missing_required,
)
from transforms_for_apache_kafka_connect_spark.record import ensure_error_col

#: config "type" name -> Predicate subclass
PREDICATE_REGISTRY: dict[str, type] = {}


def register_predicate(name: str):
    def deco(cls):
        PREDICATE_REGISTRY[name] = cls
        cls.type_name = name
        return cls

    return deco


@dataclass
class Predicate:
    """Compiles to one boolean Column over the record envelope."""

    type_name = "predicate"

    def column(self, df: DataFrame) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError


def build_predicate(spec) -> Predicate:
    """Predicate from a config dict ({"type": ..., **config}) or instance."""
    if isinstance(spec, Predicate):
        return spec
    spec = dict(spec)
    type_name = spec.pop("type", None)
    if type_name not in PREDICATE_REGISTRY:
        raise ConfigException(
            f"Unknown predicate type: {type_name!r}. "
            f"Known: {sorted(PREDICATE_REGISTRY)}"
        )
    kwargs = {k.replace(".", "_"): v for k, v in spec.items()}
    try:
        return PREDICATE_REGISTRY[type_name](**kwargs)
    except TypeError as exc:
        raise ConfigException(
            f"Invalid config for predicate {type_name!r}: {exc}"
        ) from exc


@register_predicate("topic_name_matches")
@dataclass
class TopicNameMatches(Predicate):
    """Stock TopicNameMatches: full-regex match on topic."""

    pattern: str | None = None

    def __post_init__(self):
        if self.pattern is None:
            missing_required("pattern")
        if self.pattern == "":
            raise ConfigException(
                "Invalid value  for configuration pattern: "
                "String must be non-empty"
            )
        import re

        try:
            re.compile(self.pattern)
        except re.error as exc:
            raise ConfigException(
                f"Invalid value {self.pattern} for configuration pattern: "
                f"entry must be a Java-compatible regular expression: {exc}"
            ) from exc

    def column(self, df: DataFrame) -> Column:
        # Pattern.matches == anchored full match (vs rlike's find)
        return F.col("topic").rlike(f"^(?:{self.pattern})$")


@register_predicate("has_header_key")
@dataclass
class HasHeaderKey(Predicate):
    name: str | None = None

    def __post_init__(self):
        if self.name is None:
            missing_required("name")
        if self.name == "":
            raise ConfigException(
                "Invalid value  for configuration name: "
                "String must be non-empty"
            )

    def column(self, df: DataFrame) -> Column:
        return F.col("headers").isNotNull() & F.map_contains_key(
            F.col("headers"), F.lit(self.name)
        )


@register_predicate("record_is_tombstone")
@dataclass
class RecordIsTombstone(Predicate):
    def column(self, df: DataFrame) -> Column:
        return F.col("value").isNull()




class Guarded(Stage):
    """A stage applied only to rows matching a predicate.

    The whole conditional remains one Catalyst plan: no collect, no
    join — a column-wise ``when`` merge (mutators) or a split/union of
    the same scan (row filters, where AQE dedups the shared subplan).
    """

    def __init__(self, stage: Stage, predicate: Predicate, negate: bool = False):
        self.stage = stage
        self.predicate = build_predicate(predicate)
        self.negate = bool(negate)
        self.is_row_filter = getattr(stage, "is_row_filter", False)

    def apply(self, df: DataFrame) -> DataFrame:
        df = ensure_error_col(df)
        pred = self.predicate.column(df)
        if self.negate:
            pred = ~pred
        pred = F.coalesce(pred, F.lit(False))  # null predicate = no match

        if self.is_row_filter:
            matched = self.stage(df.filter(pred))
            unmatched = df.filter(~pred)
            return matched.unionByName(unmatched, allowMissingColumns=True)

        if getattr(self.stage, "drops_rows", False):
            # a guarded MUTATOR that can also DROP rows (e.g.
            # ExtractNewRecordState's tombstone/delete handling) cannot
            # be merged per-column: the dropped rows are gone before the
            # merge, so non-matching records would vanish. Refuse loudly
            # instead of losing data — split the stream by topic/route
            # and apply the stage unguarded to the matching branch.
            raise ConfigException(
                f"predicate guard on {type(self.stage).__name__} is not "
                f"supported: the stage can drop rows, so non-matching "
                f"records could not be restored by the conditional merge"
            )

        marker = "__guard_pred"
        snap_prefix = "__guard_orig_"
        snapshot = df.withColumn(marker, pred)
        orig_cols = list(df.columns)
        for c in orig_cols:
            snapshot = snapshot.withColumn(snap_prefix + c, F.col(c))
        out = self.stage(snapshot)

        merged = out
        out_dtypes = {f.name: f.dataType for f in out.schema.fields}
        old_dtypes = {f.name: f.dataType for f in df.schema.fields}
        for c in orig_cols:
            new_col = F.col(c)
            old_col = F.col(snap_prefix + c)
            merged = merged.withColumn(
                c,
                F.when(F.col(marker), new_col).otherwise(
                    align_to_type(
                        old_col, old_dtypes[c], out_dtypes[c],
                        context=f"predicate guard on "
                        f"{type(self.stage).__name__} (column {c!r})",
                    )
                ),
            )
        # columns the stage ADDED (e.g. set_schema_metadata): null when
        # the predicate didn't match, like Connect's untouched records
        added = [
            c
            for c in out.columns
            if c not in orig_cols
            and c != marker
            and not c.startswith(snap_prefix)
        ]
        for c in added:
            merged = merged.withColumn(
                c, F.when(F.col(marker), F.col(c))
            )
        return merged.drop(marker, *[snap_prefix + c for c in orig_cols])
