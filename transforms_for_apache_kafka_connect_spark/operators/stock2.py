"""Stock Kafka Connect SMT compatibility, part 2: TimestampConverter,
SetSchemaMetadata, InsertHeader, DropHeaders.

* ``timestamp_converter`` — TimestampConverter$Value: convert a field
  between epoch-millis (``unix``), formatted ``string``, and
  ``Timestamp``. Formats use Spark datetime patterns, which cover the
  common SimpleDateFormat patterns (yyyy/MM/dd/HH/mm/ss); exotic
  SimpleDateFormat letters are NOT translated.
* ``set_schema_metadata`` — SetSchemaMetadata: set the value-schema
  name, carried in the engine's ``value_schema_name`` metadata column —
  the same channel ExtractTopicFromSchemaName reads, so the stock
  chain [SetSchemaMetadata, ExtractTopicFromSchemaName] works as-is.
* ``insert_header`` / ``drop_headers`` — header map edits (the
  envelope's ``headers`` column; null map is treated as empty for
  insertion, matching Connect's always-present Headers object).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.errors import ConfigException
from transforms_for_apache_kafka_connect_spark.operators.base import (
    Stage,
    get_field,
    is_map,
    is_struct,
    missing_required,
    parse_list,
    place_type,
    register,
    require,
    set_field,
)

_TARGET_TYPES = ("string", "unix", "Timestamp")


@register("timestamp_converter")
@dataclass
class TimestampConverter(Stage):
    field: str | None = None
    target_type: str | None = None
    format: str | None = None
    place: str = "value"

    def __post_init__(self):
        if self.target_type is None:
            missing_required("target.type")
        if self.target_type not in _TARGET_TYPES:
            raise ConfigException(
                f"Invalid value {self.target_type} for configuration "
                f"target.type: String must be one of: "
                f"{', '.join(_TARGET_TYPES)}"
            )
        if self.target_type == "string" and not self.format:
            raise ConfigException(
                "TimestampConverter requires format option to be specified "
                "when using string timestamps"
            )
        if not self.field:
            missing_required("field")
        require(self.place in ("key", "value"), "place must be key or value")

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import types as T

        dt = place_type(df, self.place)
        col = F.col(self.place)
        src = get_field(col, dt, self.field)
        if is_struct(dt):
            src_type = None
            cur: T.DataType = dt
            for part in self.field.split("."):
                cur = cur[part].dataType  # type: ignore[index]
            src_type = cur
        else:
            src_type = T.StringType()  # map regime carries strings

        # normalize the source to a TimestampType first
        if isinstance(src_type, T.TimestampType):
            ts = src
        elif isinstance(src_type, (T.LongType, T.IntegerType)):
            ts = F.timestamp_millis(src)  # epoch millis, reference unit
        else:  # formatted string (needs format) or string-typed map value
            if self.format:
                ts = F.to_timestamp(src.cast("string"), self.format)
            else:
                ts = F.to_timestamp(src.cast("string"))

        if self.target_type == "unix":
            out = F.unix_millis(ts)
        elif self.target_type == "string":
            out = F.date_format(ts, self.format)
        else:  # Timestamp
            out = ts
        return df.withColumn(self.place, set_field(col, dt, self.field, out))


@register("set_schema_metadata")
@dataclass
class SetSchemaMetadata(Stage):
    """Schema name/version become the engine's schema-metadata columns
    (value_schema_name / value_schema_version)."""

    schema_name: str | None = None
    schema_version: int | None = None

    def __post_init__(self):
        if self.schema_name is None and self.schema_version is None:
            raise ConfigException(
                "Neither schema name nor version configured"
            )

    def apply(self, df: DataFrame) -> DataFrame:
        if self.schema_name is not None:
            df = df.withColumn("value_schema_name", F.lit(self.schema_name))
        if self.schema_version is not None:
            df = df.withColumn(
                "value_schema_version", F.lit(self.schema_version)
            )
        return df


@register("insert_header")
@dataclass
class InsertHeader(Stage):
    header: str | None = None
    value_literal: str | None = None

    def __post_init__(self):
        if not self.header:
            missing_required("header")
        if self.value_literal is None:
            missing_required("value.literal")

    def apply(self, df: DataFrame) -> DataFrame:
        empty = F.create_map().cast("map<string,string>")
        cleaned = F.map_filter(
            F.coalesce(F.col("headers"), empty),
            lambda k, _v: k != F.lit(self.header),
        )
        return df.withColumn(
            "headers",
            F.map_concat(
                cleaned,
                F.create_map(F.lit(self.header), F.lit(self.value_literal)),
            ),
        )


@register("drop_headers")
@dataclass
class DropHeaders(Stage):
    headers: list[str] | str | None = None

    def __post_init__(self):
        self.headers = parse_list(self.headers)
        if self.headers is None:
            missing_required("headers")

    def apply(self, df: DataFrame) -> DataFrame:
        drop = set(self.headers)
        return df.withColumn(
            "headers",
            F.map_filter(
                F.col("headers"),
                lambda k, _v: ~k.isin(*drop) if drop else F.lit(True),
            ),
        )
