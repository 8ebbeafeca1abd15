"""ExtractTopicFromSchemaName — topic <- value-schema name, optionally
rewritten via an exact map or a one-group regex.

Reference: ExtractTopicFromSchemaName.java:32-100 +
ExtractTopicFromSchemaNameConfig.java:45-48. Semantics:
* map lookup has first priority (:59-61); then regex ``find()`` with
  exactly one capture group -> group(1) (:63-69); fallback = raw schema
  name (:71); null schema name -> error (:93-97);
* ``schema.name.topic-map`` and ``schema.name.regex`` are mutually
  exclusive (ConfigException, config :45-48).

Spark mapping: Connect schemas are per-record metadata; our envelope
carries the schema name either as a column (``schema_name_column``,
default ``value_schema_name`` if present) or as a batch constant
(``schema_name``) — SURVEY.md §2.1 row 2.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.errors import (
    ConfigException,
    DataException,
)
from transforms_for_apache_kafka_connect_spark.operators.base import (
    Stage,
    register,
    require,
)
from transforms_for_apache_kafka_connect_spark.record import merge_error

_MAP_FORMAT_ERROR = (
    "schema.name.topic-map is not valid. Format should be: "
    '"SchemaValue1:NewValue1,SchemaValue2:NewValue2"'
)


def parse_topic_map(spec: str) -> dict[str, str]:
    """Parse ``"k1:v1,k2:v2"`` — message byte-matches
    ExtractTopicFromSchemaNameConfig.java:60-64 /
    ExtractTopicFromSchemaNameConfigTest.testRegExConfigSetWithInvalidNameToTopicMap."""
    if ":" not in spec:
        raise ConfigException(_MAP_FORMAT_ERROR)
    out: dict[str, str] = {}
    for pair in spec.split(","):
        pair = pair.strip()
        if not pair:
            continue
        if ":" not in pair:
            raise ConfigException(_MAP_FORMAT_ERROR)
        k, v = pair.split(":", 1)
        out[k] = v
    return out


@register("extract_topic_from_schema_name")
@dataclass
class ExtractTopicFromSchemaName(Stage):
    schema_name_topic_map: str | None = None
    schema_name_regex: str | None = None
    #: optional metrics name: observes `routed` = #rows topic-rewritten
    observe_name: str | None = None
    schema_name: str | None = None
    schema_name_column: str = "value_schema_name"

    def __post_init__(self):
        require(
            not (self.schema_name_topic_map and self.schema_name_regex),
            "schema.name.topic-map and schema.name.regex should not be defined together.",
        )
        if self.schema_name_regex is not None:
            import re as _re

            try:
                _re.compile(self.schema_name_regex)
            except _re.error:
                # ExtractTopicFromSchemaNameConfig.java:51-58
                raise ConfigException(
                    f"{self.schema_name_regex} set as schema.name.regex "
                    "is not valid regex."
                ) from None
        self._map = (
            parse_topic_map(self.schema_name_topic_map)
            if self.schema_name_topic_map
            else {}
        )

    def _schema_name_col(self, df: DataFrame) -> Column:
        if self.schema_name_column in df.columns:
            return F.col(self.schema_name_column)
        if self.schema_name is not None:
            return F.lit(self.schema_name)
        raise DataException("value schema name can't be null: <record>")

    def apply(self, df: DataFrame) -> DataFrame:
        name = self._schema_name_col(df)
        df = merge_error(
            df, name.isNull(), F.lit("value schema name can't be null: <record>")
        )
        new_topic = name
        if self._map:
            mapping = F.create_map(
                *[F.lit(x) for kv in self._map.items() for x in kv]
            )
            new_topic = F.coalesce(mapping[name], name)
        elif self.schema_name_regex:
            extracted = F.regexp_extract(name, self.schema_name_regex, 1)
            new_topic = F.when(extracted != "", extracted).otherwise(name)
        final_topic = F.when(name.isNull(), F.col("topic")).otherwise(new_topic)
        from transforms_for_apache_kafka_connect_spark.operators.base import (
            observe_metric,
        )

        df = observe_metric(
            self, df, ~final_topic.eqNullSafe(F.col("topic")), "routed"
        )
        return df.withColumn("topic", final_topic)
