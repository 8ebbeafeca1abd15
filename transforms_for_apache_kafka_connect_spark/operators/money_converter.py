"""MoneyConverter — format a money (decimal) field as a 2-dp string.

Reference: debezium/converters/MoneyConverter.java:27-64 (a Debezium
CustomConverter applied per relational column at schema-resolution
time — SURVEY.md §3 entry point C). Semantics (MoneyConverterTest.java:
58-120, FIXTURES.md F9):
* BigDecimal/Number -> ``String.format("%.2f", ...)`` (:52-59):
  103.6999 -> "103.70", 103 -> "103.00";
* null + optional column -> null; null + required -> error
  "Money column is not optional, but data is null" (:45-51);
* non-numeric payload -> error "Money type should have BigDecimal type".

Spark: ``F.format_string('%.2f', col)`` (java.util.Formatter semantics,
HALF_UP — identical to the reference). NOT ``format_number`` which adds
thousands separators (SURVEY.md §2.1 row 11).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.errors import DataException
from transforms_for_apache_kafka_connect_spark.operators.base import (
    Stage,
    get_field,
    is_map,
    is_struct,
    place_type,
    register,
    require,
    set_field,
    struct_has_field,
)
from transforms_for_apache_kafka_connect_spark.record import merge_error

_NUMERIC = (
    T.DecimalType,
    T.DoubleType,
    T.FloatType,
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
)


@register("money_converter")
@dataclass
class MoneyConverter(Stage):
    field_name: str = ""
    optional: bool = True
    place: str = "value"

    def __post_init__(self):
        require(bool(self.field_name), "field.name must be non-empty")
        require(self.place in ("key", "value"), "place must be key or value")

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, self.place)
        col = F.col(self.place)
        if is_struct(dt):
            if not struct_has_field(dt, self.field_name):
                raise DataException(
                    f"{self.field_name} in {self.place} schema can't be missing: <record>"
                )
            fdt = dt[self.field_name].dataType
            if not isinstance(fdt, _NUMERIC):
                raise DataException("Money type should have BigDecimal type")
        elif not is_map(dt):
            raise DataException(
                f"{self.place} type must be STRUCT or MAP: {dt.simpleString()}"
            )
        fval = get_field(col, dt, self.field_name)
        if not self.optional:
            df = merge_error(
                df,
                col.isNotNull() & fval.isNull(),
                F.lit("Money column is not optional, but data is null"),
            )
        # Decimal(_, 2) cast rounds HALF_UP and stringifies with trailing
        # zeros — same result as the reference's String.format("%.2f", ...)
        formatted = F.when(
            fval.isNotNull(),
            fval.cast(T.DecimalType(38, 2)).cast("string"),
        ).otherwise(F.lit(None).cast("string"))
        return df.withColumn(
            self.place, set_field(col, dt, self.field_name, formatted)
        )
