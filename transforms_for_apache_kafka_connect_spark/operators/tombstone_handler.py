"""TombstoneHandler — drop or fail on tombstones (value IS NULL).

Reference: TombstoneHandler.java:29-88; behaviors DROP_SILENT /
DROP_WARN / FAIL, case-insensitive config (TombstoneHandlerConfig.java:
37-73,90-103); FAIL message is exact (TombstoneHandlerTest.java:42-46).

Spark: drop modes compile to a filter (with an ``observe`` counter so
drop metrics survive into the batch's QueryExecution listener events);
FAIL routes tombstones into the error column -> batch fails at enforce.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.operators.base import (
    Stage,
    invalid_value,
    missing_required,
    register,
)
from transforms_for_apache_kafka_connect_spark.record import keep_rows, merge_error

BEHAVIORS = ("drop_silent", "drop_warn", "fail")

FAIL_MESSAGE = "Tombstone record encountered, failing due to configured 'fail' behavior"


@register("tombstone_handler")
@dataclass
class TombstoneHandler(Stage):
    is_row_filter = True
    behavior: str | None = field(default=None)
    observe_name: str | None = None

    def __post_init__(self):
        # TombstoneHandlerConfig.java:37-73,90-103: required,
        # case-insensitive; messages byte-match TombstoneHandlerConfigTest
        if self.behavior is None:
            missing_required("behavior")
        if self.behavior == "":
            invalid_value("behavior", "", "String must be non-empty")
        b = self.behavior.lower()
        if b not in BEHAVIORS:
            invalid_value(
                "behavior", self.behavior,
                f"Unsupported behavior name: {self.behavior}. "
                f"Supported are: {','.join(BEHAVIORS)}",
            )
        self.behavior = b

    def apply(self, df: DataFrame) -> DataFrame:
        is_tombstone = F.col("value").isNull()
        if self.behavior == "fail":
            return merge_error(df, is_tombstone, F.lit(FAIL_MESSAGE))
        if self.observe_name:
            from transforms_for_apache_kafka_connect_spark.operators.base import (
                new_observation,
            )

            obs = new_observation(self)
            df = df.observe(
                obs,
                F.sum(F.when(is_tombstone, 1).otherwise(0)).alias("dropped"),
            )
        return keep_rows(df, ~is_tombstone)
