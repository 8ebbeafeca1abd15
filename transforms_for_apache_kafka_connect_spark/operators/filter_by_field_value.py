"""FilterByFieldValue — keep/drop records by a predicate on a field
(or on the whole key/value when no field name is given).

Reference: FilterByFieldValue.java:35-182. Semantics pinned:
* config: exactly one of ``field.value`` / ``field.value.pattern``
  (empty pattern counts as absent), else ConfigException with the
  reference's exact message (:74-79);
* a NULL operating key/value (tombstone) always PASSES (:106-108);
* exact mode compares the *typed* parse of the config string
  (Values.parseString, :83-84): "42" equals a byte-42 payload
  (FilterByFieldValueTest.java:211-226) — Spark numeric coercion on
  ``col == lit(int)`` reproduces this;
* exact mode on a null/missing FIELD is a per-record error — the
  reference NPEs there (matchCondition dereferences a null
  SchemaAndValue, :84 via :119,137,141; SURVEY.md §2.2.4);
* regex mode uses ``Pattern.asPredicate()`` = *find* semantics on the
  stringified value (:86-91) == Spark ``rlike``; null/missing field is
  a non-match (:88-89);
* ``field.value.matches=false`` negates (:93-95); drop = filter out.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.operators.base import (
    Stage,
    get_field,
    is_map,
    is_struct,
    parse_typed_literal,
    place_type,
    register,
    require,
)
from transforms_for_apache_kafka_connect_spark.record import keep_rows, merge_error


@register("filter_by_field_value")
@dataclass
class FilterByFieldValue(Stage):
    is_row_filter = True
    field_name: str | None = None
    field_value: str | None = None
    field_value_pattern: str | None = None
    field_value_matches: bool = True
    place: str = "value"
    observe_name: str | None = None

    def __post_init__(self):
        exact = self.field_value is not None
        regex = bool(self.field_value_pattern)
        require(
            exact != regex,
            "Either field.value or field.value.pattern have to be set "
            "to apply filter transform",
        )
        require(self.place in ("key", "value"), "place must be key or value")

    def _operand(self, df: DataFrame) -> Column:
        dt = place_type(df, self.place)
        col = F.col(self.place)
        if self.field_name:
            if not (is_struct(dt) or is_map(dt)):
                from transforms_for_apache_kafka_connect_spark.errors import DataException

                raise DataException(
                    f"{self.place} type must be STRUCT or MAP when field.name is set: "
                    f"{dt.simpleString()}"
                )
            if is_struct(dt) and self.field_name not in dt.fieldNames():
                return F.lit(None).cast("string")
            return get_field(col, dt, self.field_name)
        return col

    def apply(self, df: DataFrame) -> DataFrame:
        col = F.col(self.place)
        operand = self._operand(df)
        if self.field_value is not None:
            lit = parse_typed_literal(self.field_value)
            df = merge_error(
                df,
                col.isNotNull() & operand.isNull(),
                F.lit(
                    f"{self.field_name or self.place} is null or missing; exact-match "
                    "filter requires a present value (reference NPE, "
                    "FilterByFieldValue.java:84)"
                ),
            )
            match = operand == lit
            # no null-guard needed: a null operand is errored above and
            # keep_rows retains errored rows regardless of `keep`
            keep = match if self.field_value_matches else ~match
        else:
            match = operand.cast("string").rlike(self.field_value_pattern)
            # null field = non-match (:88-89): drops under matches=true,
            # KEPT under matches=false. Expressed with IsNull instead of
            # coalesce(match, false) so the whole predicate stays
            # translatable to a parquet row-group filter
            # (Or(Not(...), IsNull(...)) pushes; coalesce() does not).
            if self.field_value_matches:
                keep = match
            else:
                keep = ~match | operand.isNull()
        keep = keep | col.isNull()  # tombstones always pass (:106-108)
        if self.observe_name:
            from transforms_for_apache_kafka_connect_spark.operators.base import (
                new_observation,
            )

            obs = new_observation(self)
            df = df.observe(
                obs,
                F.sum(F.when(~keep, 1).otherwise(0)).alias("dropped"),
            )
        return keep_rows(df, keep)
