from transforms_for_apache_kafka_connect_spark.sources.kafka_source import (
    kafka_available,
    kafka_options_from_properties,
    kafka_reader_options,
    kafka_stream,
    normalize_kafka_frame,
)
from transforms_for_apache_kafka_connect_spark.sources.avro_boundary import (
    avro_schema_to_spark,
    decode_record,
    encode_record,
    envelope_from_avro,
    envelope_to_avro,
    jvm_avro_available,
    resolve_record,
    spark_to_avro_schema,
)
from transforms_for_apache_kafka_connect_spark.sources.changestream import (
    change_stream,
    repositories_snapshot,
)
from transforms_for_apache_kafka_connect_spark.sources.schema_registry import (
    FileSchemaRegistry,
    HttpSchemaRegistry,
    SchemaRegistry,
)
from transforms_for_apache_kafka_connect_spark.sources.protobuf_boundary import (
    decode_frame,
    decode_message,
    encode_frame,
    encode_message,
    envelope_from_protobuf,
    envelope_to_protobuf,
    proto_schema_to_spark,
    spark_to_proto_schema,
)
from transforms_for_apache_kafka_connect_spark.sources.cdc_envelopes import (
    envelope_from_canal,
    envelope_from_dms,
    envelope_to_canal,
    envelope_to_dms,
    envelope_from_maxwell,
    envelope_to_maxwell,
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
    "envelope_from_avro",
    "envelope_to_avro",
    "envelope_from_maxwell",
    "envelope_from_canal",
    "envelope_from_dms",
    "envelope_to_canal",
    "envelope_to_dms",
    "envelope_to_maxwell",
    "avro_schema_to_spark",
    "spark_to_avro_schema",
    "encode_record",
    "decode_record",
    "resolve_record",
    "jvm_avro_available",
    "SchemaRegistry",
    "FileSchemaRegistry",
    "HttpSchemaRegistry",
    "envelope_from_protobuf",
    "envelope_to_protobuf",
    "proto_schema_to_spark",
    "spark_to_proto_schema",
    "encode_message",
    "decode_message",
    "encode_frame",
    "decode_frame",
    "kafka_available",
    "kafka_stream",
    "kafka_reader_options",
    "normalize_kafka_frame",
    "kafka_options_from_properties",
]
