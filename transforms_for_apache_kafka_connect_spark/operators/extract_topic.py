"""ExtractTopic — re-route the record: topic <- stringified scalar from
the whole key/value or from a named field.

Reference: ExtractTopic.java:33-260 + ExtractTopicConfig.java:40-53.
Semantics:
* whole-place path: type must be a supported scalar INT8..STRING
  (:35-55, :160,216) else DataException at apply time (type is
  batch-constant in Spark);
* named-field path: place must be STRUCT (with schema, :174) or MAP
  (schemaless, :121); missing struct field -> schema error (:187);
* null/empty new topic: with ``skip.missing.or.null=false`` a
  per-record error (:144,155,207,226); with true, keep original topic
  (:138-146,149-157,199-209,222-228);
* blank-vs-empty asymmetry (SURVEY.md §2.2.2): the schemaless (MAP)
  paths treat blank (``isBlank``) as missing; the with-schema (STRUCT)
  paths only empty string ("" equals) — ``" "`` is a legal topic with
  schema but "missing" schemaless.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.errors import DataException
from transforms_for_apache_kafka_connect_spark.operators.base import (
    SUPPORTED_SCALAR_TYPES,
    Stage,
    connect_type_name,
    get_field,
    is_map,
    is_struct,
    place_type,
    register,
    require,
)
from transforms_for_apache_kafka_connect_spark.record import merge_error

_SUPPORTED = "[INT8, INT16, INT32, INT64, FLOAT32, FLOAT64, BOOLEAN, STRING]"


@register("extract_topic")
@dataclass
class ExtractTopic(Stage):
    field_name: str | None = None
    skip_missing_or_null: bool = False
    place: str = "value"
    #: optional metrics name: observes `routed` = #rows whose topic
    #: changed (north_star transform-level route metrics)
    observe_name: str | None = None

    def __post_init__(self):
        require(self.place in ("key", "value"), "place must be key or value")

    def apply(self, df: DataFrame) -> DataFrame:
        dt = place_type(df, self.place)
        col = F.col(self.place)
        schemaless = is_map(dt)

        if self.field_name:
            if is_struct(dt):
                if self.field_name not in dt.fieldNames():
                    raise DataException(
                        f"{self.field_name} in {self.place} schema can't be missing: "
                        "<record>"
                    )
                fdt = dt[self.field_name].dataType
                if not isinstance(fdt, SUPPORTED_SCALAR_TYPES):
                    raise DataException(
                        f"{self.field_name} schema type in {self.place} must be "
                        f"{_SUPPORTED}: {connect_type_name(fdt)}"
                    )
            elif not schemaless:
                raise DataException(
                    f"{self.place} schema type must be STRUCT if field name is "
                    f"specified: {connect_type_name(dt)}"
                )
            new_topic = get_field(col, dt, self.field_name).cast("string")
            err_msg = f"{self.field_name} in {self.place} can't be null or empty: <record>"
            null_place_err = (
                f"{self.place} can't be null if field name is specified: <record>"
            )
            df = merge_error(
                df,
                col.isNull() & F.lit(not self.skip_missing_or_null),
                F.lit(null_place_err),
            )
        else:
            if is_struct(dt) or schemaless:
                raise DataException(
                    f"type in {self.place} {'must be ' + _SUPPORTED if is_struct(dt) else ''}"
                    f"is not supported without field name: {connect_type_name(dt)}"
                )
            if not isinstance(dt, SUPPORTED_SCALAR_TYPES):
                raise DataException(
                    f"{self.place} schema type must be {_SUPPORTED} if field name is "
                    f"not specified: {connect_type_name(dt)}"
                )
            new_topic = col.cast("string")
            err_msg = f"{self.place} can't be null or empty: <record>"

        missing = self._missing_cond(new_topic, schemaless)
        if not self.skip_missing_or_null:
            df = merge_error(df, missing, F.lit(err_msg))
        final_topic = F.when(missing, F.col("topic")).otherwise(new_topic)
        if self.observe_name:
            from transforms_for_apache_kafka_connect_spark.operators.base import (
                new_observation,
            )

            df = df.observe(
                new_observation(self),
                F.sum(
                    (~final_topic.eqNullSafe(F.col("topic"))).cast("long")
                ).alias("routed"),
            )
        return df.withColumn("topic", final_topic)

    @staticmethod
    def _missing_cond(new_topic: Column, schemaless: bool) -> Column:
        if schemaless:  # isBlank(): whitespace-only is missing (ExtractTopic.java:138,151)
            return new_topic.isNull() | (F.trim(new_topic) == "")
        return new_topic.isNull() | (new_topic == "")  # "".equals only (:201,222)
