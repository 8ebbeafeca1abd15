"""Physical topic routing — the engine's analog of Kafka Connect's
source-bound chains landing records in different topics.

In the reference, ExtractTopic / ExtractTopicFromSchemaName /
RegexRouter rewrite ``record.topic`` and the Connect runtime then
physically routes the record to that Kafka topic (reference
IntegrationTest.java:174-183, 288-301 asserts per-topic offsets).
Here the SMT chain rewrites the ``topic`` column and this writer makes
the routing physical: one partitioned directory (or one foreachBatch
fan-out) per topic value.

Scale shape: ``partitionBy("topic")`` is a single write job — each
task appends to the directories of the topics it holds; no shuffle
unless ``repartition_by_topic`` is requested (useful when a downstream
consumer wants one file per topic per batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def route_write(
    df: DataFrame,
    root: str,
    *,
    fmt: str = "parquet",
    mode: str = "append",
    repartition_by_topic: bool = False,
    flatten_value: bool = True,
) -> list[str]:
    """Write an envelope batch fanned out by ``topic``; returns the
    topics written.

    ``flatten_value=True`` writes ``topic`` + the value struct's fields
    as columns (what a per-topic consumer expects); otherwise the raw
    envelope row is written.
    """
    if flatten_value and "value" in df.columns:
        envelope_cols = ("topic", "timestamp", "key")
        value_fields = [f.name for f in df.schema["value"].dataType.fields]
        # a value field named topic/timestamp/key would collide with the
        # envelope columns after flattening — prefix it instead of
        # failing the write with a duplicate-column error
        out = df.select(
            *envelope_cols,
            *[
                F.col(f"value.{f}").alias(
                    f"value_{f}" if f in envelope_cols else f
                )
                for f in value_fields
            ],
        )
    else:
        out = df
    if repartition_by_topic:
        out = out.repartition(F.col("topic"))
    # the topic list rides on the write job via an Observation —
    # re-running the input for a distinct() would pay a second full job
    from pyspark.sql import Observation

    obs = Observation("route_topics")
    out = out.observe(obs, F.collect_set("topic").alias("topics"))
    (
        out.write.mode(mode)
        .partitionBy("topic")
        .format(fmt)
        .save(root)
    )
    # a zero-row batch completes the observation with an empty set (no
    # exception), so a failure here is a real metric-retrieval error —
    # returning [] would misreport a committed write as "no topics"
    return sorted(obs.get["topics"])
