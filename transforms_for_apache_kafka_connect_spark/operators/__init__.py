"""SMT catalog — one module per reference operator (SURVEY.md §2.1).

Importing this package populates ``STAGE_REGISTRY`` used by the chain
compiler (plans/chain.py).
"""

from transforms_for_apache_kafka_connect_spark.operators.base import (
    STAGE_REGISTRY,
    Stage,
)
from transforms_for_apache_kafka_connect_spark.operators.case_transform import (
    CaseTransform,
)
from transforms_for_apache_kafka_connect_spark.operators.concat_fields import (
    ConcatFields,
)
from transforms_for_apache_kafka_connect_spark.operators.extract_timestamp import (
    ExtractTimestamp,
)
from transforms_for_apache_kafka_connect_spark.operators.extract_topic import (
    ExtractTopic,
)
from transforms_for_apache_kafka_connect_spark.operators.extract_topic_from_schema_name import (
    ExtractTopicFromSchemaName,
)
from transforms_for_apache_kafka_connect_spark.operators.filter_by_field_name import (
    FilterByFieldName,
)
from transforms_for_apache_kafka_connect_spark.operators.filter_by_field_value import (
    FilterByFieldValue,
)
from transforms_for_apache_kafka_connect_spark.operators.hash_field import Hash
from transforms_for_apache_kafka_connect_spark.operators.key_to_value import KeyToValue
from transforms_for_apache_kafka_connect_spark.operators.make_tombstone import (
    MakeTombstone,
)
from transforms_for_apache_kafka_connect_spark.operators.money_converter import (
    MoneyConverter,
)
from transforms_for_apache_kafka_connect_spark.operators.regex_router import (
    RegexRouter,
)
from transforms_for_apache_kafka_connect_spark.operators.replace_field import (
    ReplaceField,
)
from transforms_for_apache_kafka_connect_spark.operators.stock import (
    Cast,
    Flatten,
    HoistField,
    InsertField,
    ValueToKey,
)
from transforms_for_apache_kafka_connect_spark.operators.stock2 import (
    DropHeaders,
    InsertHeader,
    SetSchemaMetadata,
    TimestampConverter,
)
from transforms_for_apache_kafka_connect_spark.operators.stock3 import (
    ExtractField,
    Filter,
    HeaderFrom,
    MaskField,
    TimestampRouter,
)
from transforms_for_apache_kafka_connect_spark.operators.debezium import (
    EventRouter,
    ExtractNewRecordState,
)
from transforms_for_apache_kafka_connect_spark.operators.predicates import (
    PREDICATE_REGISTRY,
    Guarded,
    HasHeaderKey,
    Predicate,
    RecordIsTombstone,
    TopicNameMatches,
    build_predicate,
)
from transforms_for_apache_kafka_connect_spark.operators.tombstone_handler import (
    TombstoneHandler,
)

__all__ = [
    "STAGE_REGISTRY",
    "Stage",
    "CaseTransform",
    "ConcatFields",
    "ExtractTimestamp",
    "ExtractTopic",
    "ExtractTopicFromSchemaName",
    "FilterByFieldName",
    "FilterByFieldValue",
    "Hash",
    "KeyToValue",
    "MakeTombstone",
    "MoneyConverter",
    "RegexRouter",
    "ReplaceField",
    "TombstoneHandler",
    "InsertField",
    "ValueToKey",
    "Cast",
    "HoistField",
    "Flatten",
    "TimestampConverter",
    "SetSchemaMetadata",
    "InsertHeader",
    "DropHeaders",
    "ExtractField",
    "MaskField",
    "TimestampRouter",
    "HeaderFrom",
    "Filter",
    "PREDICATE_REGISTRY",
    "Predicate",
    "Guarded",
    "TopicNameMatches",
    "HasHeaderKey",
    "RecordIsTombstone",
    "build_predicate",
    "ExtractNewRecordState",
    "EventRouter",
]
