"""CaseTransform — upper/lowercase listed string fields.

Reference: CaseTransform.java:41-217. Semantics reproduced:
* Locale.ROOT casing (:145-154) == Spark upper/lower;
* null field stays null (:68-72,85-89) — Spark upper/lower are null-safe;
* field missing from a struct schema is ignored (:74-76);
* missing map key is ignored (not added);
* untouched fields copied (:106-108);
* non-STRUCT/MAP place -> DataException (:124-126).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.errors import DataException
from transforms_for_apache_kafka_connect_spark.errors import ConfigException
from transforms_for_apache_kafka_connect_spark.operators.base import (
    Stage,
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

CASES = {"lower": F.lower, "upper": F.upper}


@register("case_transform")
@dataclass
class CaseTransform(Stage):
    field_names: list[str] | str | None = field(default=None)
    case: str | None = None
    place: str = "value"
    #: optional metrics name: observes `mutated` = #rows with a non-null
    #: place value (every such row has its listed fields re-cased)
    observe_name: str | None = None

    def __post_init__(self):
        # CaseTransformConfig.java:51-65: field.names required LIST
        # (empty list valid — no-op), case required non-empty; bad case
        # value surfaces Case.fromString's message
        # (CaseTransformConfig.java:95-101)
        self.field_names = parse_list(self.field_names)
        if self.field_names is None:
            missing_required("field.names")
        if self.case is None:
            missing_required("case")
        if self.case == "":
            invalid_value("case", "", "String must be non-empty")
        if self.case not in CASES:
            raise ConfigException(f"Unknown enum value {self.case}")
        require(self.place in ("key", "value"), "place must be key or value")

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, self.place)
        if not (is_struct(dt) or is_map(dt)):
            raise DataException(f"{self.place} type must be STRUCT or MAP: {dt.simpleString()}")
        fn = CASES[self.case]
        col = F.col(self.place)
        for f_name in self.field_names:
            if is_struct(dt):
                if not struct_has_field(dt, f_name):
                    continue  # missing struct field ignored (CaseTransform.java:74-76)
                col = set_field(col, dt, f_name, fn(col.getField(f_name)))
            else:
                # map regime: only rewrite when the key exists
                updated = set_field(col, dt, f_name, fn(F.element_at(col, F.lit(f_name))))
                col = F.when(
                    col.isNotNull() & F.map_contains_key(col, F.lit(f_name)), updated
                ).otherwise(col)
        from transforms_for_apache_kafka_connect_spark.operators.base import (
            observe_metric,
        )

        df = observe_metric(self, df, F.col(self.place).isNotNull(), "mutated")
        return df.withColumn(self.place, col)
