from transforms_for_apache_kafka_connect_spark.sources.changestream import (
    change_stream,
    repositories_snapshot,
)
from transforms_for_apache_kafka_connect_spark.sources.json_boundary import (
    envelope_from_json,
    envelope_from_kafka,
    envelope_to_json,
    infer_json_schema,
)

__all__ = [
    "change_stream",
    "repositories_snapshot",
    "envelope_from_json",
    "envelope_from_kafka",
    "envelope_to_json",
    "infer_json_schema",
]
