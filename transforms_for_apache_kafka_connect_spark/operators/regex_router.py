"""RegexRouter — stock Kafka Connect SMT compatibility shim.

Not part of the reference's own catalog, but its integration chains use
the stock ``org.apache.kafka.connect.transforms.RegexRouter``
(reference IntegrationTest.java:226-229: chains mix Aiven SMTs with
stock ones), so a chain ported to this engine needs it. Stock
semantics: ``regex`` must match the ENTIRE topic (Matcher.matches());
on match the topic becomes ``replacement`` with $1-style group
references; otherwise the record passes unchanged.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.errors import ConfigException
from transforms_for_apache_kafka_connect_spark.operators.base import (
    Stage,
    register,
    require,
)


@register("regex_router")
@dataclass
class RegexRouter(Stage):
    regex: str = ""
    replacement: str = ""
    #: optional metrics name: observes `routed` = #rows topic-rewritten
    observe_name: str | None = None

    def __post_init__(self):
        require(bool(self.regex), "regex must be non-empty")
        try:
            re.compile(self.regex)
        except re.error as exc:
            raise ConfigException(f"Invalid value {self.regex} for configuration regex: "
                                  f"{exc}") from exc

    def apply(self, df: DataFrame) -> DataFrame:
        anchored = f"^(?:{self.regex})$"
        matched = F.col("topic").rlike(anchored)
        rewritten = F.regexp_replace(F.col("topic"), anchored, self.replacement)
        from transforms_for_apache_kafka_connect_spark.operators.base import (
            observe_metric,
        )

        df = observe_metric(
            self, df, matched & ~rewritten.eqNullSafe(F.col("topic")), "routed"
        )
        return df.withColumn(
            "topic", F.when(matched, rewritten).otherwise(F.col("topic"))
        )
