"""Stock Kafka Connect SMT compatibility, part 3: ExtractField,
MaskField, TimestampRouter, HeaderFrom, Filter.

Completes the stock `org.apache.kafka.connect.transforms.*` catalog
(parts 1-2 cover InsertField, ValueToKey, Cast, HoistField, Flatten,
TimestampConverter, SetSchemaMetadata, InsertHeader, DropHeaders;
RegexRouter and ReplaceField have their own modules). The reference's
integration chains mix Aiven and stock SMTs freely
(reference IntegrationTest.java:226-229), so a user switching keeps
their whole chain. Stock semantics pinned per class below.

* ``extract_field``    — ExtractField$Key/$Value: replace the whole
  key/value with one named field; struct regime errors on a field the
  schema lacks ("Unknown field: f"), map regime yields null; null
  (tombstone) passes through null.
* ``mask_field``       — MaskField$Key/$Value: listed fields -> the
  type's zero value ("" / 0 / false / epoch / empty array|map) or a
  typed ``replacement`` literal; null field values stay null.
* ``timestamp_router`` — TimestampRouter: topic <- ``topic.format``
  with ``${topic}``/``${timestamp}`` substituted, timestamp formatted
  by ``timestamp.format`` (session timezone, like SimpleDateFormat's
  default-TZ behavior); a null record timestamp is a per-record error
  (the stock SMT NPEs there).
* ``header_from``      — HeaderFrom$Key/$Value: copy or move listed
  fields into headers (engine headers are map<string,string>, so
  values are stringified); move drops the fields from the place.
* ``filter``           — Filter: drops every record it applies to;
  only useful guarded by a predicate (operators/predicates.py), which
  is exactly how Connect uses it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.errors import (
    ConfigException,
    DataException,
)
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
    template_concat,
)
from transforms_for_apache_kafka_connect_spark.record import keep_rows, merge_error


@register("extract_field")
@dataclass
class ExtractField(Stage):
    """ExtractField$Key/$Value: key/value <- value-of(field)."""

    field: str | None = None
    place: str = "value"

    def __post_init__(self):
        if not self.field:
            missing_required("field")
        require(self.place in ("key", "value"), "place must be key or value")

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, self.place)
        col = F.col(self.place)
        if is_struct(dt):
            if self.field not in dt.fieldNames():
                raise DataException(f"Unknown field: {self.field}")
            extracted = col.getField(self.field)
        elif is_map(dt):
            extracted = F.element_at(col, F.lit(self.field))
        else:
            raise DataException("Only Struct/Map objects supported")
        # null in -> null out is implicit: getField/element_at of a
        # null container is null (stock requireStructOrNull behavior)
        return df.withColumn(self.place, extracted)


def _zero_value(dt: T.DataType) -> Column:
    """Stock MaskField PRIMITIVE_VALUE_MAPPING: the type's zero."""
    if isinstance(dt, T.StringType):
        return F.lit("")
    if isinstance(dt, T.BooleanType):
        return F.lit(False)
    if isinstance(
        dt,
        (
            T.ByteType,
            T.ShortType,
            T.IntegerType,
            T.LongType,
            T.FloatType,
            T.DoubleType,
            T.DecimalType,
        ),
    ):
        return F.lit(0).cast(dt)
    if isinstance(dt, T.TimestampType):
        return F.timestamp_millis(F.lit(0))
    if isinstance(dt, T.DateType):
        return F.date_from_unix_date(F.lit(0))
    if isinstance(dt, T.ArrayType):
        return F.array().cast(dt)
    if isinstance(dt, T.MapType):
        return F.create_map().cast(dt)
    raise DataException(
        f"Unable to mask value of type: {dt.simpleString()}"
    )


@register("mask_field")
@dataclass
class MaskField(Stage):
    """MaskField$Key/$Value: fields -> zero value or typed replacement."""

    fields: list[str] | str | None = None
    replacement: str | None = None
    place: str = "value"

    def __post_init__(self):
        self.fields = parse_list(self.fields)
        if self.fields is None:
            missing_required("fields")
        if not self.fields:
            raise ConfigException(
                "Invalid value [] for configuration fields: "
                "String must be non-empty"
            )
        require(self.place in ("key", "value"), "place must be key or value")

    def _masked(self, dt: T.DataType) -> Column:
        if self.replacement is None:
            return _zero_value(dt)
        if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            # stock MaskField: custom replacement only for primitives
            raise DataException(
                f"Cannot mask value of type {dt.simpleString()} with "
                f"custom replacement."
            )
        return F.lit(self.replacement).cast(dt)

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, self.place)
        col = F.col(self.place)
        if is_struct(dt):
            for f in self.fields:
                if f not in dt.fieldNames():
                    raise DataException(f"Unknown field: {f}")
            parts = []
            mask = set(self.fields)
            for f in dt.fields:
                src = col.getField(f.name)
                if f.name in mask:
                    # null field values stay null (stock masked())
                    parts.append(
                        F.when(src.isNotNull(), self._masked(f.dataType))
                        .alias(f.name)
                    )
                else:
                    parts.append(src.alias(f.name))
            new = F.when(col.isNotNull(), F.struct(*parts))
            return df.withColumn(self.place, new)
        if is_map(dt):
            masked_val = self._masked(dt.valueType)
            mask = set(self.fields)
            new = F.transform_values(
                col,
                lambda k, v: F.when(
                    k.isin(*mask) & v.isNotNull(), masked_val
                ).otherwise(v),
            )
            return df.withColumn(self.place, new)
        raise DataException("Only Struct/Map objects supported")


@register("timestamp_router")
@dataclass
class TimestampRouter(Stage):
    """TimestampRouter: topic <- format(topic.format, topic, ts)."""

    topic_format: str = "${topic}-${timestamp}"
    timestamp_format: str = "yyyyMMdd"

    def apply(self, df: DataFrame) -> DataFrame:
        ts = F.col("timestamp")
        formatted = F.date_format(
            F.timestamp_millis(ts), self.timestamp_format
        )
        new_topic = template_concat(
            self.topic_format,
            {"topic": F.col("topic"), "timestamp": formatted},
        )
        df = merge_error(
            df,
            ts.isNull(),
            F.lit(
                "Unable to route record: null record timestamp "
                "(stock TimestampRouter NPEs on a null timestamp)"
            ),
        )
        return df.withColumn("topic", new_topic)


@register("header_from")
@dataclass
class HeaderFrom(Stage):
    """HeaderFrom$Key/$Value: fields -> headers (copy or move)."""

    fields: list[str] | str | None = None
    headers: list[str] | str | None = None
    operation: str | None = None
    place: str = "value"

    def __post_init__(self):
        self.fields = parse_list(self.fields)
        self.headers = parse_list(self.headers)
        if self.fields is None:
            missing_required("fields")
        if self.headers is None:
            missing_required("headers")
        if self.operation is None:
            missing_required("operation")
        if self.operation not in ("copy", "move"):
            raise ConfigException(
                f"Invalid value {self.operation} for configuration "
                f"operation: String must be one of: move, copy"
            )
        if len(self.fields) != len(self.headers):
            raise ConfigException(
                "'fields' config must have the same number of elements "
                "as 'headers' config."
            )
        require(self.place in ("key", "value"), "place must be key or value")

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, self.place)
        col = F.col(self.place)
        if not (is_struct(dt) or is_map(dt)):
            raise DataException("Only Struct/Map objects supported")
        if is_struct(dt):
            for f in self.fields:
                if f not in dt.fieldNames():
                    raise DataException(f"Field does not exist: {f}")
        empty = F.create_map().cast("map<string,string>")
        new_headers = F.coalesce(F.col("headers"), empty)
        def drop_key(h):
            return lambda k, _v: k != F.lit(h)

        for fname, hname in zip(self.fields, self.headers):
            hval = get_field(col, dt, fname).cast("string")
            cleaned = F.map_filter(new_headers, drop_key(hname))
            # a null field value contributes no header entry (our
            # headers are map<string,string>; Connect headers can hold
            # null values, a map cannot)
            new_headers = F.when(
                hval.isNotNull(),
                F.map_concat(
                    cleaned, F.create_map(F.lit(hname), hval)
                ),
            ).otherwise(cleaned)
        # headers untouched for tombstones (nothing to read from)
        new_headers = F.when(col.isNotNull(), new_headers).otherwise(
            F.col("headers")
        )
        df = df.withColumn("headers", new_headers)
        if self.operation == "move":
            moved = set(self.fields)
            if is_struct(dt):
                kept = [f for f in dt.fields if f.name not in moved]
                if not kept:
                    new_place = F.lit(None).cast("struct<__empty:string>")
                else:
                    new_place = F.when(
                        col.isNotNull(),
                        F.struct(
                            *[col.getField(f.name).alias(f.name) for f in kept]
                        ),
                    )
            else:
                new_place = F.map_filter(
                    col, lambda k, _v: ~k.isin(*moved)
                )
            df = df.withColumn(self.place, new_place)
        return df


@register("filter")
@dataclass
class Filter(Stage):
    """Stock Filter: drop every record this stage applies to.

    On its own it drops the whole stream; under a predicate guard
    (the normal Connect usage) the Guarded wrapper routes only the
    matching rows here.
    """

    is_row_filter = True

    def apply(self, df: DataFrame) -> DataFrame:
        return keep_rows(df, F.lit(False))
