"""ConcatFields — append a string field = listed fields joined by a
delimiter, with a replacement token for missing/null fields.

Reference: ConcatFields.java:35-177 + ConcatFieldsConfig.java:43-70.
Semantics:
* values are toString-ified (:80-92) — Spark cast(string) matches for
  string/long/boolean fixtures (SURVEY.md §2.2.3);
* null OR missing field -> ``field.replace.missing`` (:82-83,87-90);
* output schema widened with ``output.field.name: optional string``
  (:75,109) — Spark withField appends;
* non-STRUCT/MAP place -> DataException (:114-116); null place value ->
  per-record error (:60-62).

NOTE: Spark's ``concat_ws`` *skips* null elements (would silently drop
the slot) — we coalesce each slot to the replacement string and use
``concat``, preserving reference slot positions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.errors import DataException
from transforms_for_apache_kafka_connect_spark.operators.base import (
    Stage,
    get_field,
    invalid_value,
    is_map,
    is_struct,
    missing_required,
    parse_list,
    place_type,
    register,
    require,
    set_field,
    struct_has_field,
)
from transforms_for_apache_kafka_connect_spark.record import merge_error


@register("concat_fields")
@dataclass
class ConcatFields(Stage):
    field_names: list[str] | str | None = field(default=None)
    output_field_name: str | None = None
    delimiter: str = ""
    field_replace_missing: str = ""
    place: str = "value"
    #: optional metrics name: observes `mutated` = #rows widened with
    #: the concatenated output field
    observe_name: str | None = None

    def __post_init__(self):
        # ConcatFieldsConfig.java:43-70: field.names required LIST (an
        # EMPTY list is valid — ConcatFieldsConfigTest.java:44-49 expects
        # the next error, the missing output.field.name), output field
        # required non-empty
        self.field_names = parse_list(self.field_names)
        if self.field_names is None:
            missing_required("field.names")
        if self.output_field_name is None:
            missing_required("output.field.name")
        if self.output_field_name == "":
            invalid_value("output.field.name", "", "String must be non-empty")
        require(self.place in ("key", "value"), "place must be key or value")

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, self.place)
        if not (is_struct(dt) or is_map(dt)):
            raise DataException(
                f"{self.place} type must be STRUCT or MAP: {dt.simpleString()}"
            )
        col = F.col(self.place)
        df = merge_error(
            df, col.isNull(), F.lit(f"{self.place} Value can't be null: <record>")
        )
        slots = []
        for i, f_name in enumerate(self.field_names):
            if i:
                slots.append(F.lit(self.delimiter))
            if is_struct(dt) and not struct_has_field(dt, f_name):
                slots.append(F.lit(self.field_replace_missing))
            else:
                slots.append(
                    F.coalesce(
                        get_field(col, dt, f_name).cast("string"),
                        F.lit(self.field_replace_missing),
                    )
                )
        from transforms_for_apache_kafka_connect_spark.operators.base import (
            observe_metric,
        )

        df = observe_metric(self, df, col.isNotNull(), "mutated")
        out = F.concat(*slots) if slots else F.lit("")  # empty field list -> ""
        return df.withColumn(
            self.place, set_field(col, dt, self.output_field_name, out)
        )
