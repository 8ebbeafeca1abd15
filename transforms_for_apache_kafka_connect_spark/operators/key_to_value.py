"""KeyToValue — copy/rename key fields into the value.

Reference: KeyToValue.java:45-311 + KeyToValueConfig.java:39,49-60.
Semantics:
* ``key.fields`` required; ``*`` = whole key; ``value.fields`` are
  positional renames (default = the key-field name; ``*``'s default =
  ``_key``) (:76-99);
* output field order = original value-schema order, then NEW fields in
  key.fields order; a rename targeting an existing value field
  overwrites it IN PLACE (:233-269, KeyToValueTest.java:125-137) —
  exactly Spark ``withField`` semantics;
* duplicate destination -> config-time error
  "More than one key value is copied to the value field name '%s'"
  (:88-91);
* named field missing from a struct key -> DataException
  "Key field '%s' not found in key schema" (:215-218);
* named fields from a primitive key -> DataException (:131-137 class);
* schemaless (MAP) key into a schema'd (STRUCT) value -> DataException
  "The value requires a schema, but the key class is a schemaless Map";
* this is an intra-row projection, NOT a join (the key is on the same
  row) — SURVEY.md §2.1 row 10.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transforms_for_apache_kafka_connect_spark.errors import ConfigException, DataException
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
)


@register("key_to_value")
@dataclass
class KeyToValue(Stage):
    key_fields: list[str] | str | None = field(default=None)
    value_fields: list[str] | str = field(default_factory=list)

    def __post_init__(self):
        # KeyToValueConfig.java:49-60: key.fields required LIST;
        # duplicate destination is a DataException at configure time
        # (KeyToValue.java:88-91)
        self.key_fields = parse_list(self.key_fields)
        if self.key_fields is None:
            missing_required("key.fields")
        self.value_fields = parse_list(self.value_fields) or []
        self._pairs: list[tuple[str, str]] = []
        seen: set[str] = set()
        for i, kf in enumerate(self.key_fields):
            dest = (
                self.value_fields[i]
                if i < len(self.value_fields) and self.value_fields[i]
                else ("_key" if kf == "*" else kf)
            )
            if dest in seen:
                raise DataException(
                    f"More than one key value is copied to the value field name '{dest}'"
                )
            seen.add(dest)
            self._pairs.append((kf, dest))

    def apply(self, df: DataFrame) -> DataFrame:
        kdt = place_type(df, "key")
        vdt = place_type(df, "value")
        key = F.col("key")
        value = F.col("value")

        if is_struct(vdt) and is_map(kdt):
            raise DataException(
                "The value requires a schema, but the key class is a schemaless Map"
            )
        if not (is_struct(vdt) or is_map(vdt)):
            raise DataException(
                "The value needs to be a Struct or Map in order to append fields"
            )

        named = [kf for kf, _ in self._pairs if kf != "*"]
        if named and not (is_struct(kdt) or is_map(kdt)):
            raise DataException(
                f"Named key fields {named} cannot be copied from the key schema: "
                f"{kdt.simpleString()}"
            )
        if is_struct(kdt):
            for kf in named:
                if kf not in kdt.fieldNames():
                    raise DataException(f"Key field '{kf}' not found in key schema")

        out = value
        for kf, dest in self._pairs:
            src = key if kf == "*" else get_field(key, kdt, kf)
            if is_map(vdt):
                # map output is schemaless: stringify non-scalar sources
                if kf == "*" and is_struct(kdt):
                    src = F.to_json(src)
                elif kf == "*" and is_map(kdt):
                    src = F.to_json(src)
                out = F.map_concat(
                    F.map_filter(out, lambda k, _v: k != F.lit(dest)),
                    F.create_map(F.lit(dest), src.cast(vdt.valueType)),
                )
            else:
                out = out.withField(dest, src)
        # withField/map_concat propagate a null value (tombstone) unchanged
        return df.withColumn("value", out)
