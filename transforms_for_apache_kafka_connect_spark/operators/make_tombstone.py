"""MakeTombstone — value & value-schema -> null, all else preserved.

Reference: MakeTombstone.java:25-55 (no config, :42-44; newRecord with
null valueSchema+value, :28-39). Spark: the value column keeps its
static DataType (the "schema"), so a typed NULL is the tombstone;
downstream ``value IS NULL`` is the tombstone predicate
(TombstoneHandler.java:47).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.operators.base import (
    Stage,
    place_type,
    register,
)


@register("make_tombstone")
@dataclass
class MakeTombstone(Stage):
    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn("value", F.lit(None).cast(place_type(df, "value")))
