"""Envelope builders for the fixture matrix (FIXTURES.md).

Builds records in both regimes: struct (schema-ful) and map
(schemaless), with the standard envelope
topic='original_topic', partition=0, timestamp=123
(reference ExtractTopicTest.java:355-364).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

ENV_FIELDS = [
    T.StructField("topic", T.StringType(), False),
    T.StructField("partition", T.IntegerType(), False),
    T.StructField("timestamp", T.LongType(), True),
    T.StructField(
        "headers", T.MapType(T.StringType(), T.StringType()), True
    ),
]


def make_records(spark, rows, key_type, value_type):
    """rows: list of (key, value) tuples; types are Spark DataTypes."""
    schema = T.StructType(
        [
            T.StructField("topic", T.StringType(), False),
            T.StructField("partition", T.IntegerType(), False),
            T.StructField("key", key_type, True),
            T.StructField("value", value_type, True),
            T.StructField("timestamp", T.LongType(), True),
            T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
        ]
    )
    data = [("original_topic", 0, k, v, 123, None) for k, v in rows]
    return spark.createDataFrame(data, schema)


def values_df(spark, values, value_type, key_type=T.StringType(), keys=None):
    keys = keys or [None] * len(values)
    return make_records(spark, list(zip(keys, values)), key_type, value_type)


def struct_type(**fields) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields.items()])


STR_MAP = T.MapType(T.StringType(), T.StringType())
