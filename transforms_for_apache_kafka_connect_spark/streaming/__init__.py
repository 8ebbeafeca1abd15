from transforms_for_apache_kafka_connect_spark.streaming.dedupe import lww_dedupe
from transforms_for_apache_kafka_connect_spark.streaming.sink import LakeTable
from transforms_for_apache_kafka_connect_spark.streaming.engine import Replayer
from transforms_for_apache_kafka_connect_spark.streaming.router import (
    TopicTableRouter,
    route_write,
)
from transforms_for_apache_kafka_connect_spark.streaming.incremental import (
    MaintainedAggregate,
    batch_changes,
    incremental_agg_update,
)
from transforms_for_apache_kafka_connect_spark.streaming.expectations import (
    Expectation,
)
from transforms_for_apache_kafka_connect_spark.streaming.relay import (
    changelog_envelope,
    publish_changelog,
    relay_schemas,
)
from transforms_for_apache_kafka_connect_spark.streaming.snapshot import (
    IncrementalSnapshot,
    hash_chunk,
)
from transforms_for_apache_kafka_connect_spark.streaming.gaps import (
    SequenceTracker,
    sequence_gaps,
)
from transforms_for_apache_kafka_connect_spark.streaming.verify import (
    repair_state,
    row_digest,
    table_checksum,
    table_diff,
    verify_state,
)
from transforms_for_apache_kafka_connect_spark.streaming.dlq import (
    read_dlq,
    retry_dlq,
)
from transforms_for_apache_kafka_connect_spark.streaming.neardup_index import (
    NearDupIndex,
)
from transforms_for_apache_kafka_connect_spark.streaming.rollup import (
    TimeRollup,
    granularity_ms,
    time_bucket,
)
from transforms_for_apache_kafka_connect_spark.streaming.patch import (
    fold_sparse,
    overlay_current,
    patch_apply,
    stream_patch_into,
)
from transforms_for_apache_kafka_connect_spark.streaming.scd2 import (
    SCD2Table,
    as_of,
    scd2_history,
)
from transforms_for_apache_kafka_connect_spark.streaming.txn import (
    TransactionalRouter,
)
from transforms_for_apache_kafka_connect_spark.streaming.joinview import (
    MaintainedJoin,
)
from transforms_for_apache_kafka_connect_spark.streaming.starview import (
    DimSpec,
    MaintainedStar,
)
from transforms_for_apache_kafka_connect_spark.streaming.streamjoin import (
    interval_join,
)
from transforms_for_apache_kafka_connect_spark.streaming.windowed import (
    stream_windowed_into,
    windowed_aggregate,
)
from transforms_for_apache_kafka_connect_spark.streaming.catalog import (
    LakeCatalog,
)

__all__ = [
    "LakeCatalog",
    "changelog_envelope",
    "publish_changelog",
    "relay_schemas",
    "windowed_aggregate",
    "stream_windowed_into",
    "interval_join",
    "lww_dedupe",
    "LakeTable",
    "Replayer",
    "route_write",
    "TopicTableRouter",
    "TransactionalRouter",
    "Expectation",
    "MaintainedAggregate",
    "MaintainedJoin",
    "MaintainedStar",
    "DimSpec",
    "NearDupIndex",
    "batch_changes",
    "incremental_agg_update",
    "SCD2Table",
    "fold_sparse",
    "overlay_current",
    "patch_apply",
    "stream_patch_into",
    "scd2_history",
    "as_of",
    "TimeRollup",
    "granularity_ms",
    "time_bucket",
    "read_dlq",
    "retry_dlq",
    "IncrementalSnapshot",
    "hash_chunk",
    "SequenceTracker",
    "sequence_gaps",
    "repair_state",
    "row_digest",
    "table_checksum",
    "table_diff",
    "verify_state",
]
