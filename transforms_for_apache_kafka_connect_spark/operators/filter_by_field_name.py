"""FilterByFieldName — keep/drop records by the PRESENCE of a field.

Named in the engine's north_star next to FilterByFieldValue; the
reference repo has no such SMT (its closest relative filters on field
*values* — FilterByFieldValue.java), so the semantics here follow the
same contracts that SMT pins:

* presence = the field exists AND is non-null (schemaless MAP regime:
  key present with non-null value; struct regime: field in the schema
  with a non-null value — a struct field that is null is "missing",
  matching how FilterByFieldValue's exact mode treats null operands);
* ``field.name.matches=True`` (default) keeps records HAVING the
  field; ``False`` negates (keep records lacking it);
* tombstones (value IS NULL) always pass, like FilterByFieldValue's
  null-operating-value rule (FilterByFieldValue.java:106-108) —
  chain a TombstoneHandler to control them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.operators.base import (
    Stage,
    get_field,
    invalid_value,
    is_map,
    is_struct,
    missing_required,
    place_type,
    register,
    require,
    struct_has_field,
)
from transforms_for_apache_kafka_connect_spark.record import keep_rows


@register("filter_by_field_name")
@dataclass
class FilterByFieldName(Stage):
    is_row_filter = True
    field_name: str | None = None
    field_name_matches: bool = True
    place: str = "value"
    observe_name: str | None = None

    def __post_init__(self):
        if self.field_name is None:
            missing_required("field.name")
        if self.field_name == "":
            invalid_value("field.name", "", "String must be non-empty")
        require(self.place in ("key", "value"), "place must be key or value")

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, self.place)
        col = F.col(self.place)
        if is_map(dt):
            present = F.element_at(col, F.lit(self.field_name)).isNotNull()
        elif is_struct(dt):
            if struct_has_field(dt, self.field_name):
                present = get_field(col, dt, self.field_name).isNotNull()
            else:
                present = F.lit(False)  # field not in schema: never present
        else:
            present = F.lit(False)  # scalar place has no named fields
        keep = present if self.field_name_matches else ~present
        # null operating value always passes (tombstone-invisible)
        keep = keep | col.isNull()
        from transforms_for_apache_kafka_connect_spark.operators.base import (
            observe_metric,
        )

        df = observe_metric(self, df, ~keep, "dropped")
        return keep_rows(df, keep)
