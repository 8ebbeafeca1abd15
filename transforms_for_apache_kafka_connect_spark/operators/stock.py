"""Stock Kafka Connect SMT compatibility pack.

The reference's chains freely mix Aiven SMTs with the stock
`org.apache.kafka.connect.transforms.*` set (IntegrationTest.java:
226-229 chains RegexRouter), so a user switching to this engine needs
the stock operators too. RegexRouter and ReplaceField live in their own
modules; this module adds the rest of the commonly-chained set, each as
pure Column expressions:

* ``insert_field``  — InsertField$Value: add a static field and/or
  copies of record metadata (topic/partition/timestamp) to the value.
* ``value_to_key``  — ValueToKey: replace the record key with a struct
  of the listed value fields (the inverse of KeyToValue).
* ``cast``          — Cast$Value: per-field type casts, Connect type
  names (int8..int64, float32/64, boolean, string).
* ``hoist_field``   — HoistField$Value: wrap the whole value into a
  single-field struct.
* ``flatten``       — Flatten$Value: flatten nested structs into
  delimiter-joined top-level fields.

All are struct+map-regime aware where the stock SMT is, and
tombstone-safe (null value in, null value out) like the originals.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.errors import ConfigException
from transforms_for_apache_kafka_connect_spark.operators.base import (
    Stage,
    is_map,
    is_struct,
    missing_required,
    parse_list,
    place_type,
    register,
    require,
    set_field,
)

#: Connect Schema.Type name -> Spark cast target
_CAST_TYPES = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float32": "float",
    "float64": "double",
    "boolean": "boolean",
    "string": "string",
}


@register("insert_field")
@dataclass
class InsertField(Stage):
    """InsertField$Value: static.field/static.value plus
    topic.field / partition.field / timestamp.field metadata copies
    (no Kafka offset exists in the engine's envelope — use the LSN via
    a normal chain stage instead)."""

    static_field: str | None = None
    static_value: str | None = None
    topic_field: str | None = None
    partition_field: str | None = None
    timestamp_field: str | None = None
    place: str = "value"

    def __post_init__(self):
        if self.static_field and self.static_value is None:
            raise ConfigException(
                "static.value must be set when static.field is set"
            )
        require(self.place in ("key", "value"), "place must be key or value")

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, self.place)
        col = F.col(self.place)
        adds: list[tuple[str, Column]] = []
        if self.static_field:
            adds.append((self.static_field, F.lit(self.static_value)))
        if self.topic_field:
            adds.append((self.topic_field, F.col("topic")))
        if self.partition_field:
            adds.append((self.partition_field, F.col("partition")))
        if self.timestamp_field:
            adds.append((self.timestamp_field, F.col("timestamp")))
        for name, expr in adds:
            col = set_field(col, dt, name, expr)
        return df.withColumn(self.place, col)


@register("value_to_key")
@dataclass
class ValueToKey(Stage):
    """ValueToKey: key <- struct of the listed value fields."""

    fields: list[str] | str | None = None

    def __post_init__(self):
        self.fields = parse_list(self.fields)
        if self.fields is None:
            missing_required("fields")
        if not self.fields:
            raise ConfigException(
                "Invalid value [] for configuration fields: "
                "String must be non-empty"
            )

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, "value")
        value = F.col("value")
        if is_map(dt):
            parts = [
                F.element_at(value, F.lit(f)).alias(f) for f in self.fields
            ]
        elif is_struct(dt):
            for f in self.fields:
                if f not in dt.fieldNames():
                    from transforms_for_apache_kafka_connect_spark.errors import (
                        DataException,
                    )

                    raise DataException(
                        f"Field does not exist: {f}"
                    )
            parts = [value.getField(f).alias(f) for f in self.fields]
        else:
            from transforms_for_apache_kafka_connect_spark.errors import (
                DataException,
            )

            raise DataException("Only Struct/Map objects supported")
        new_key = F.when(value.isNotNull(), F.struct(*parts))
        return df.withColumn("key", new_key)


@register("cast")
@dataclass
class Cast(Stage):
    """Cast$Value: ``spec`` = "field1:type1,field2:type2" (or a single
    bare type to cast a whole scalar value)."""

    spec: str | None = None
    place: str = "value"

    def __post_init__(self):
        if self.spec is None:
            missing_required("spec")
        self._casts: list[tuple[str | None, str]] = []
        for part in parse_list(self.spec) or []:
            if ":" in part:
                f, t = part.split(":", 1)
            else:
                f, t = None, part
            if t not in _CAST_TYPES:
                raise ConfigException(
                    f"Invalid value {t} for configuration spec: "
                    f"String must be one of: {', '.join(_CAST_TYPES)}"
                )
            self._casts.append((f, _CAST_TYPES[t]))
        if not self._casts:
            raise ConfigException(
                "Invalid value  for configuration spec: "
                "String must be non-empty"
            )
        require(self.place in ("key", "value"), "place must be key or value")

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, self.place)
        col = F.col(self.place)
        if self._casts and self._casts[0][0] is None:
            # whole-value cast (scalar place)
            return df.withColumn(self.place, col.cast(self._casts[0][1]))
        for fname, target in self._casts:
            if is_struct(dt) and fname not in dt.fieldNames():
                continue  # stock Cast ignores unknown fields
            src = (
                F.element_at(col, F.lit(fname))
                if is_map(dt)
                else col.getField(fname)
            )
            col = set_field(col, dt, fname, src.cast(target))
        return df.withColumn(self.place, col)


@register("hoist_field")
@dataclass
class HoistField(Stage):
    """HoistField$Value: value <- struct{field: old_value}."""

    field: str | None = None
    place: str = "value"

    def __post_init__(self):
        if not self.field:
            missing_required("field")
        require(self.place in ("key", "value"), "place must be key or value")

    def apply(self, df: DataFrame) -> DataFrame:
        col = F.col(self.place)
        hoisted = F.when(
            col.isNotNull(), F.struct(col.alias(self.field))
        )
        return df.withColumn(self.place, hoisted)


def _flatten_fields(
    dt: T.StructType, prefix: str, col: Column, delimiter: str
) -> list[Column]:
    out: list[Column] = []
    for f in dt.fields:
        name = f"{prefix}{f.name}"
        child = col.getField(f.name)
        if isinstance(f.dataType, T.StructType):
            out.extend(
                _flatten_fields(
                    f.dataType, f"{name}{delimiter}", child, delimiter
                )
            )
        else:
            out.append(child.alias(name))
    return out


@register("flatten")
@dataclass
class Flatten(Stage):
    """Flatten$Value: nested structs -> delimiter-joined top-level
    fields (stock default delimiter ".")."""

    delimiter: str = "."
    place: str = "value"

    def __post_init__(self):
        require(self.place in ("key", "value"), "place must be key or value")

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, self.place)
        if not is_struct(dt):
            return df  # nothing nested to flatten (map/scalar pass)
        col = F.col(self.place)
        flat = F.struct(*_flatten_fields(dt, "", col, self.delimiter))
        return df.withColumn(
            self.place, F.when(col.isNotNull(), flat)
        )
