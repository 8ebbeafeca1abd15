"""ExtractTimestamp — record timestamp <- a field of the key/value.

Reference: ExtractTimestamp.java:30-132 + ExtractTimestampConfig.java:
75-101. Semantics:
* field must be INT64 (epoch) or Timestamp (:73-82);
* resolution 'seconds' multiplies INT64 by 1000 (:75-79); a
  Timestamp-typed field yields epoch millis regardless of resolution
  (:80-82, ExtractTimestampTest.java:168-242);
* place must be STRUCT or MAP (:53-65), null place -> error (:49),
  missing/null field -> error (:55-58,67-70).
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
    invalid_value,
    is_map,
    is_struct,
    missing_required,
    place_type,
    register,
    require,
    struct_has_field,
)
from transforms_for_apache_kafka_connect_spark.record import merge_error

RESOLUTIONS = ("milliseconds", "seconds")


@register("extract_timestamp")
@dataclass
class ExtractTimestamp(Stage):
    field_name: str | None = None
    timestamp_resolution: str = "milliseconds"
    place: str = "value"

    def __post_init__(self):
        # ExtractTimestampConfig.java:77-100; messages byte-match
        # ExtractTimestampConfigTest.java:31-44,88-97
        if self.field_name is None:
            missing_required("field.name")
        if self.field_name == "":
            invalid_value("field.name", "", "String must be non-empty")
        if self.timestamp_resolution not in RESOLUTIONS:
            invalid_value(
                "timestamp.resolution", self.timestamp_resolution,
                f"Unsupported resolution type '{self.timestamp_resolution}'. "
                "Supported are: milliseconds, seconds",
            )
        require(self.place in ("key", "value"), "place must be key or value")

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, self.place)
        if not (is_struct(dt) or is_map(dt)):
            raise DataException(
                f"{self.place} type must be STRUCT or MAP: {dt.simpleString()}"
            )
        col = F.col(self.place)
        fval = None
        if is_struct(dt):
            if not struct_has_field(dt, self.field_name):
                raise DataException(
                    f"{self.field_name} field must be present and its value can't be "
                    "null: <record>"
                )
            fdt = dt[self.field_name].dataType
            fval = col.getField(self.field_name)
            if isinstance(fdt, (T.TimestampType, T.TimestampNTZType)):
                # NTZ values are treated as UTC instants (session tz is UTC)
                new_ts = F.unix_millis(fval.cast("timestamp"))
            elif isinstance(fdt, T.LongType):
                new_ts = (
                    fval * 1000 if self.timestamp_resolution == "seconds" else fval
                )
            else:
                raise DataException(
                    f"{self.field_name} field must be INT64 or "
                    f"org.apache.kafka.connect.data.Timestamp: {fdt.simpleString()}"
                )
        else:
            # map regime (schemaless): stringly values, cast to long epoch
            fval = get_field(col, dt, self.field_name)
            as_long = fval.cast("long")
            df = merge_error(
                df,
                col.isNotNull() & fval.isNotNull() & as_long.isNull(),
                F.lit(
                    f"{self.field_name} field must be INT64 or "
                    "org.apache.kafka.connect.data.Timestamp: <record>"
                ),
            )
            new_ts = (
                as_long * 1000 if self.timestamp_resolution == "seconds" else as_long
            )

        df = merge_error(
            df,
            col.isNull(),
            F.lit(f"{self.place} can't be null: <record>"),
        )
        df = merge_error(
            df,
            col.isNotNull() & fval.isNull(),
            F.lit(
                f"{self.field_name} field must be present and its value can't be "
                "null: <record>"
            ),
        )
        return df.withColumn(
            "timestamp",
            F.when(col.isNotNull() & fval.isNotNull(), new_ts.cast("long")).otherwise(
                F.col("timestamp")
            ),
        )
