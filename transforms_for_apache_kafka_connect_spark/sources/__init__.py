from transforms_for_apache_kafka_connect_spark.sources.changestream import (
    change_stream,
    repositories_snapshot,
)

__all__ = ["change_stream", "repositories_snapshot"]
